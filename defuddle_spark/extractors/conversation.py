"""Shared conversation-extractor base (AI chat sites).

Reimplements /root/reference/extractors/conversation.go:14-190 —
message/footnote → HTML rendering shared by the ChatGPT/Claude/Grok/
Gemini extractors, and the ExtractWithDefuddle result assembly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from . import BaseExtractor, ExtractorResult

_PARAGRAPH_RE = re.compile(r"<p[^>]*>[\s\S]*?</p>")


@dataclass
class ConversationMessage:
    author: str = ""
    content: str = ""
    timestamp: str = ""
    metadata: Optional[Dict[str, str]] = None


@dataclass
class ConversationMetadata:
    title: str = ""
    site: str = ""
    url: str = ""
    message_count: int = 0
    description: str = ""


@dataclass
class ConvFootnote:
    url: str = ""
    text: str = ""


class ConversationExtractorBase(BaseExtractor):
    """conversation.go:40-190."""

    def extract_messages(self) -> List[ConversationMessage]:  # pragma: no cover
        raise NotImplementedError

    def get_metadata(self) -> ConversationMetadata:  # pragma: no cover
        raise NotImplementedError

    def get_footnotes(self) -> List[ConvFootnote]:
        return []

    def create_content_html(self, messages: List[ConversationMessage],
                            footnotes: List[ConvFootnote]) -> str:
        """conversation.go:51-125 (exact HTML shape incl. whitespace)."""
        parts: List[str] = []
        for i, message in enumerate(messages):
            timestamp_html = ""
            if message.timestamp:
                timestamp_html = f'<div class="message-timestamp">{message.timestamp}</div>'
            content_html = message.content
            if not _PARAGRAPH_RE.search(content_html):
                content_html = f"<p>{content_html}</p>"
            data_attrs = ""
            if message.metadata:
                for key, value in message.metadata.items():
                    data_attrs += f' data-{key}="{value}"'
            author_lower = message.author.lower()
            parts.append(f"""
\t\t\t<div class="message message-{author_lower}"{data_attrs}>
\t\t\t\t<div class="message-header">
\t\t\t\t\t<p class="message-author"><strong>{message.author}</strong></p>
\t\t\t\t\t{timestamp_html}
\t\t\t\t</div>
\t\t\t\t<div class="message-content">
\t\t\t\t\t{content_html}
\t\t\t\t</div>
\t\t\t</div>""")
            if i < len(messages) - 1:
                parts.append("\n<hr>")

        footnotes_html = ""
        if footnotes:
            fparts = ['\n\t\t\t<div id="footnotes">\n\t\t\t\t<ol>']
            for i, fn in enumerate(footnotes):
                n = i + 1
                fparts.append(
                    f'\n\t\t\t\t\t\t<li class="footnote" id="fn:{n}">'
                    f'\n\t\t\t\t\t\t\t<p>'
                    f'\n\t\t\t\t\t\t\t\t<a href="{fn.url}" target="_blank">{fn.text}</a>'
                    f'\xa0<a href="#fnref:{n}" class="footnote-backref">↩</a>'
                    f"\n\t\t\t\t\t\t\t</p>"
                    f"\n\t\t\t\t\t\t</li>")
            fparts.append("\n\t\t\t\t</ol>\n\t\t\t</div>")
            footnotes_html = "".join(fparts)

        result = "".join(parts)
        if footnotes_html:
            result += "\n" + footnotes_html
        return result.strip()

    def extract_with_defuddle(self) -> ExtractorResult:
        """conversation.go:127-150."""
        messages = self.extract_messages()
        metadata = self.get_metadata()
        footnotes = self.get_footnotes()
        content_html = self.create_content_html(messages, footnotes)
        description = metadata.description or (
            f"{metadata.site} conversation with {len(messages)} messages")
        return ExtractorResult(
            content=content_html,
            content_html=content_html,
            extracted_content={"messageCount": str(len(messages))},
            variables={
                "title": metadata.title,
                "site": metadata.site,
                "description": description,
            },
        )

    def extract(self) -> ExtractorResult:
        return self.extract_with_defuddle()
