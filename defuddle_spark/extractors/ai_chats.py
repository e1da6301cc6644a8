"""AI-chat extractors: ChatGPT, Claude, Grok, Gemini.

Reimplements /root/reference/extractors/{chatgpt,claude,grok,gemini}.go
on the shared conversation base. Each cites the functions it mirrors.
"""

from __future__ import annotations

import re
from typing import List, Optional

from ..dom import Document, Element, parse_fragment
from ..selectors import find_all, find_first
from . import register
from .conversation import (ConversationExtractorBase, ConversationMessage,
                           ConversationMetadata, ConvFootnote)

_CHATGPT_EMPTY_P_RE = re.compile(r"<p[^>]*>\s*</p>")
_CHATGPT_CITATION_RE = re.compile(
    r'(?is)(&ZeroWidthSpace;)?(<span[^>]*>\s*<a[^>]*href="([^"]+)"[^>]*>[\s\S]*?</a>\s*</span>)')
_CLAUDE_TITLE_SUFFIX_RE = re.compile(r" - Claude$")
_GROK_TITLE_SUFFIX_RE = re.compile(r"\s-\s*Grok$")
_GROK_LINK_RE = re.compile(r'(?i)<a\s+(?:[^>]*?\s+)?href="([^"]*)"[^>]*>(.*?)</a>')
_GROK_HTTP_RE = re.compile(r"(?i)^https?://")


def _fragment_root(html: str) -> Element:
    root = Element("#fragment")
    for node in parse_fragment(html):
        root.append(node)
    return root


def _byte_preview(text: str, limit: int = 50) -> str:
    raw = text.encode("utf-8")
    if len(raw) > limit:
        return raw[:limit].decode("utf-8", errors="replace") + "..."
    return text


class ChatGPTExtractor(ConversationExtractorBase):
    """chatgpt.go:18-190."""

    def __init__(self, doc: Document, url: str, schema_org_data=None) -> None:
        super().__init__(doc, url, schema_org_data)
        self.articles = find_all(doc.html, 'article[data-testid^="conversation-turn-"]')
        self.footnotes: List[ConvFootnote] = []
        self._footnote_counter = 0

    def can_extract(self) -> bool:
        return len(self.articles) > 0

    def name(self) -> str:
        return "ChatGPT"

    def _clean_message_content(self, content: str) -> str:
        root = _fragment_root(content)
        for el in find_all(root, 'h5.sr-only, h6.sr-only, span[data-state="closed"]'):
            el.remove()
        return root.inner_html()

    def _process_footnotes(self, content: str) -> str:
        for m in _CHATGPT_CITATION_RE.finditer(content):
            full = m.group(0)
            if 'target="_blank"' not in full or 'rel="noopener"' not in full:
                continue
            self._footnote_counter += 1
            n = self._footnote_counter
            self.footnotes.append(ConvFootnote(url=m.group(3), text=f"Source {n}"))
            content = content.replace(
                full, f'<sup id="fnref:{n}"><a href="#fn:{n}">{n}</a></sup>', 1)
        return content

    def extract_messages(self) -> List[ConversationMessage]:
        messages: List[ConversationMessage] = []
        self.footnotes = []
        self._footnote_counter = 0
        for article in self.articles:
            author_el = find_first(article, "h5.sr-only, h6.sr-only")
            author = (author_el.text().strip() if author_el is not None else "")
            author = author.strip().rstrip(":")
            role = article.get("data-message-author-role") or "unknown"
            content = article.inner_html()
            if not content:
                continue
            content = content.replace("​", "")
            content = self._clean_message_content(content)
            content = self._process_footnotes(content)
            content = _CHATGPT_EMPTY_P_RE.sub("", content)
            if content.strip():
                messages.append(ConversationMessage(
                    author=author, content=content.strip(),
                    metadata={"role": role}))
        return messages

    def get_footnotes(self) -> List[ConvFootnote]:
        return self.footnotes

    def _get_title(self) -> str:
        title_el = find_first(self.doc.html, "title")
        page_title = title_el.text().strip() if title_el is not None else ""
        if page_title and page_title != "ChatGPT":
            return page_title
        if self.articles:
            first = find_first(self.articles[0], ".text-message")
            if first is not None:
                return _byte_preview(first.text())
        return "ChatGPT Conversation"

    def get_metadata(self) -> ConversationMetadata:
        messages = self.extract_messages()
        return ConversationMetadata(
            title=self._get_title(), site="ChatGPT", url=self.url,
            message_count=len(messages),
            description=f"ChatGPT conversation with {len(messages)} messages")


class ClaudeExtractor(ConversationExtractorBase):
    """claude.go:16-160."""

    _FALLBACKS = ['div[data-testid*="message"]', ".message",
                  'div[class*="message"]', 'div[class*="chat"]',
                  'div[role="article"]', "article"]

    def __init__(self, doc: Document, url: str, schema_org_data=None) -> None:
        super().__init__(doc, url, schema_org_data)
        self.articles = find_all(
            doc.html, 'div[data-testid="user-message"], '
                      'div[data-testid="assistant-message"], div.font-claude-message')
        if not self.articles:
            for sel in self._FALLBACKS:
                self.articles = find_all(doc.html, sel)
                if self.articles:
                    break

    def can_extract(self) -> bool:
        return len(self.articles) > 0

    def name(self) -> str:
        return "Claude"

    def extract_messages(self) -> List[ConversationMessage]:
        messages: List[ConversationMessage] = []
        for article in self.articles:
            testid = article.get("data-testid")
            if testid is None:
                continue
            if testid == "user-message":
                role, author = "you", "You"
            elif testid == "assistant-message":
                role, author = "assistant", "Claude"
            else:
                continue
            content = article.inner_html()
            if content.strip():
                messages.append(ConversationMessage(
                    author=author, content=content.strip(),
                    metadata={"role": role}))
        return messages

    def _get_title(self) -> str:
        title_el = find_first(self.doc.html, "title")
        page_title = title_el.text().strip() if title_el is not None else ""
        if page_title and page_title != "Claude":
            return _CLAUDE_TITLE_SUFFIX_RE.sub("", page_title)
        header = find_first(self.doc.html, "header .font-tiempos")
        if header is not None and header.text().strip():
            return header.text().strip()
        if self.articles:
            first_user = find_first(self.articles[0], '[data-testid="user-message"]')
            if first_user is not None:
                return _byte_preview(first_user.text())
        return "Claude Conversation"

    def get_metadata(self) -> ConversationMetadata:
        messages = self.extract_messages()
        return ConversationMetadata(
            title=self._get_title(), site="Claude", url=self.url,
            message_count=len(messages),
            description=f"Claude conversation with {len(messages)} messages")


class GrokExtractor(ConversationExtractorBase):
    """grok.go — container class routing + .message-bubble content."""

    _CONTAINER = ".relative.group.flex.flex-col.justify-center.w-full"
    _FALLBACKS = ["div[data-testid*='message']", ".message",
                  "div[class*='message']", "div[class*='chat']",
                  "div[role='article']", "article",
                  "div[class*='conversation']", "div[class*='bubble']"]

    def __init__(self, doc: Document, url: str, schema_org_data=None) -> None:
        super().__init__(doc, url, schema_org_data)
        self.bubbles = find_all(doc.html, self._CONTAINER)
        if not self.bubbles:
            for sel in self._FALLBACKS:
                self.bubbles = find_all(doc.html, sel)
                if self.bubbles:
                    break
        self.footnotes: List[ConvFootnote] = []
        self._footnote_counter = 0

    def can_extract(self) -> bool:
        return len(self.bubbles) > 0

    def name(self) -> str:
        return "Grok"

    @staticmethod
    def _has_class(el: Element, cls: str) -> bool:
        return cls in (el.get("class") or "").split()

    def _process_footnotes(self, content: str) -> str:
        """grok.go:processFootnotes — external links → numbered footnotes,
        deduplicated by URL."""
        from urllib.parse import urlparse

        def repl(m: re.Match) -> str:
            url_str, link_text = m.group(1), m.group(2)
            if not url_str or url_str.startswith("#"):
                return m.group(0)
            if not _GROK_HTTP_RE.match(url_str):
                return m.group(0)
            idx = next((i + 1 for i, fn in enumerate(self.footnotes)
                        if fn.url == url_str), 0)
            if idx == 0:
                self._footnote_counter += 1
                idx = self._footnote_counter
                try:
                    host = urlparse(url_str).hostname or url_str
                    domain = host[4:] if host.startswith("www.") else host
                except ValueError:
                    domain = url_str
                self.footnotes.append(ConvFootnote(
                    url=url_str,
                    text=f'<a href="{url_str}" target="_blank" rel="noopener noreferrer">{domain}</a>'))
            return (f'{link_text}<sup id="fnref:{idx}" class="footnote-ref">'
                    f'<a href="#fn:{idx}" class="footnote-link">{idx}</a></sup>')

        return _GROK_LINK_RE.sub(repl, content)

    def extract_messages(self) -> List[ConversationMessage]:
        messages: List[ConversationMessage] = []
        self.footnotes = []
        self._footnote_counter = 0
        for container in self.bubbles:
            is_user = self._has_class(container, "items-end")
            is_grok = self._has_class(container, "items-start")
            if not is_user and not is_grok:
                continue
            bubble = find_first(container, ".message-bubble")
            if bubble is None:
                continue
            if is_user:
                content = bubble.text()
                role, author = "user", "You"
            else:
                role, author = "assistant", "Grok"
                root = _fragment_root(bubble.inner_html())
                for el in find_all(root, ".relative.border.border-border-l1.bg-surface-base"):
                    el.remove()
                content = self._process_footnotes(root.inner_html())
            if not content.strip():
                continue
            messages.append(ConversationMessage(
                author=author, content=content.strip(), metadata={"role": role}))
        return messages

    def get_footnotes(self) -> List[ConvFootnote]:
        return self.footnotes

    def _get_title(self) -> str:
        title_el = find_first(self.doc.html, "title")
        page_title = title_el.text().strip() if title_el is not None else ""
        if page_title and page_title != "Grok" and not page_title.startswith("Grok by "):
            t = _GROK_TITLE_SUFFIX_RE.sub("", page_title).strip()
            if t:
                return t
        for container in self.bubbles:
            if self._has_class(container, "items-end"):
                bubble = find_first(container, ".message-bubble")
                if bubble is not None and bubble.text().strip():
                    return _byte_preview(bubble.text().strip())
                break
        return "Grok Conversation"

    def get_metadata(self) -> ConversationMetadata:
        return ConversationMetadata(
            title=self._get_title(), site="Grok", url=self.url,
            message_count=len(self.bubbles),
            description=f"Grok conversation with {len(self.bubbles)} messages")


class GeminiExtractor(ConversationExtractorBase):
    """gemini.go — div.conversation-container with user-query/model-response."""

    def __init__(self, doc: Document, url: str, schema_org_data=None) -> None:
        super().__init__(doc, url, schema_org_data)
        self.containers = find_all(doc.html, "div.conversation-container")
        self.footnotes: List[ConvFootnote] = []

    def can_extract(self) -> bool:
        return len(self.containers) > 0

    def name(self) -> str:
        return "Gemini"

    def _clean_content(self, content: str) -> str:
        root = _fragment_root(content)
        for el in find_all(root, ".table-content"):
            cls = [c for c in (el.get("class") or "").split() if c != "table-content"]
            if cls:
                el.set_attr("class", " ".join(cls))
            else:
                el.remove_attr("class")
        return root.inner_html()

    def _extract_sources(self) -> None:
        self.footnotes = []
        for item in find_all(self.doc.html, "browse-item"):
            link = find_first(item, "a")
            if link is None:
                continue
            href = link.get("href")
            if not href:
                continue
            domain_el = find_first(link, ".domain")
            title_el = find_first(link, ".title")
            text = ((title_el.text().strip() if title_el is not None else "")
                    or (domain_el.text().strip() if domain_el is not None else "")
                    or href)
            self.footnotes.append(ConvFootnote(url=href, text=text))

    def extract_messages(self) -> List[ConversationMessage]:
        messages: List[ConversationMessage] = []
        self._extract_sources()
        for container in self.containers:
            user_query = find_first(container, "user-query")
            if user_query is not None:
                query_text = find_first(user_query, ".query-text")
                if query_text is not None:
                    content = query_text.inner_html()
                    if content.strip():
                        messages.append(ConversationMessage(
                            author="You", content=content.strip(),
                            metadata={"role": "user"}))
            model_response = find_first(container, "model-response")
            if model_response is not None:
                content_el = (find_first(model_response, "#extended-response-markdown-content")
                              or find_first(model_response, ".model-response-text .markdown"))
                if content_el is not None:
                    content = content_el.inner_html()
                    if content.strip():
                        messages.append(ConversationMessage(
                            author="Gemini",
                            content=self._clean_content(content).strip(),
                            metadata={"role": "assistant"}))
        return messages

    def get_footnotes(self) -> List[ConvFootnote]:
        return self.footnotes

    def _get_title(self) -> str:
        title_el = find_first(self.doc.html, "title")
        page_title = title_el.text().strip() if title_el is not None else ""
        if page_title and "Gemini" not in page_title:
            return page_title
        research = find_first(self.doc.html, ".title-text")
        if research is not None and research.text().strip():
            return research.text().strip()
        if self.containers:
            q = find_first(self.containers[0], ".query-text")
            if q is not None:
                return _byte_preview(q.text())
        return "Gemini Conversation"

    def get_metadata(self) -> ConversationMetadata:
        messages = self.extract_messages()
        return ConversationMetadata(
            title=self._get_title(), site="Gemini", url=self.url,
            message_count=len(messages),
            description=f"Gemini conversation with {len(messages)} messages")
