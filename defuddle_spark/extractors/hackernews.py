"""Hacker News extractor.

Reimplements /root/reference/extractors/hackernews.go:
- constructor/detection :49-117
- Extract :161-196
- createContentHTML :217-233
- getPostContent :282-345
- extractComments/processComments :358-545
- getPostID/Title/Author/Description/Date :551-660

URL pattern: ``news\\.ycombinator\\.com/item\\?id=.*``
(/root/reference/extractors/registry.go:19).
"""

from __future__ import annotations

import re
from typing import Optional

from ..dom import Document, Element
from ..selectors import find_all, find_first
from . import BaseExtractor, ExtractorResult

_POST_ID_RE = re.compile(r"id=(\d+)")


def _text(el: Optional[Element]) -> str:
    return el.text() if el is not None else ""


def _date_from_title(el: Optional[Element]) -> str:
    ts = (el.get("title") or "") if el is not None else ""
    return ts.split("T")[0] if ts else ""


class HackerNewsExtractor(BaseExtractor):
    def __init__(self, doc: Document, url: str, schema_org_data=None) -> None:
        super().__init__(doc, url, schema_org_data)
        self.main_post = find_first(doc.html, ".fatitem")
        self.is_comment_page = self._detect_comment_page()
        self.main_comment = self._find_main_comment() if self.is_comment_page else None

    def _detect_comment_page(self) -> bool:
        if self.main_post is None:
            return False
        return find_first(self.main_post, '.navs a[href*="parent"]') is not None

    def _find_main_comment(self) -> Optional[Element]:
        if self.main_post is None:
            return None
        return find_first(self.main_post, ".comment")

    def can_extract(self) -> bool:
        return self.main_post is not None

    def name(self) -> str:
        return "HackerNews"

    # -- content ------------------------------------------------------

    def _get_post_content(self) -> str:
        if self.main_post is None:
            return ""
        if self.is_comment_page and self.main_comment is not None:
            author = _text(find_first(self.main_comment, ".hnuser")) or "[deleted]"
            commtext = find_first(self.main_comment, ".commtext")
            comment_html = commtext.inner_html() if commtext is not None else ""
            date = _date_from_title(find_first(self.main_comment, ".age"))
            points = _text(find_first(self.main_comment, ".score")).strip()
            parent_el = find_first(self.main_post, '.navs a[href*="parent"]')
            parent_url = (parent_el.get("href") or "") if parent_el is not None else ""

            parts = ['<div class="comment main-comment">', '<div class="comment-metadata">']
            parts.append(f'<span class="comment-author"><strong>{author}</strong></span> •')
            parts.append(f' <span class="comment-date">{date}</span>')
            if points:
                parts.append(f' • <span class="comment-points">{points}</span>')
            if parent_url:
                parts.append(
                    f' • <a href="https://news.ycombinator.com/{parent_url}" class="parent-link">parent</a>')
            parts.append("</div>")
            parts.append(f'<div class="comment-content">{comment_html}</div>')
            parts.append("</div>")
            return "".join(parts)

        title_row = find_first(self.main_post, "tr.athing")
        url = ""
        if title_row is not None:
            link = find_first(title_row, ".titleline a")
            if link is not None:
                url = link.get("href") or ""
        parts = []
        if url:
            parts.append(f'<p><a href="{url}" target="_blank">{url}</a></p>')
        text_el = find_first(self.main_post, ".toptext")
        if text_el is not None:
            parts.append(f'<div class="post-text">{text_el.inner_html()}</div>')
        return "".join(parts)

    def _extract_comments(self) -> str:
        comments = find_all(self.doc.html, "tr.comtr")
        out = []
        processed = set()
        current_depth = -1
        blockquote_stack = []

        for comment in comments:
            cid = comment.get("id") or ""
            if not cid or cid in processed:
                continue
            processed.add(cid)

            indent_img = find_first(comment, ".ind img")
            try:
                indent = int((indent_img.get("width") or "0") if indent_img is not None else "0")
            except ValueError:
                indent = 0
            depth = indent // 40

            commtext = find_first(comment, ".commtext")
            if commtext is None:
                continue
            author = _text(find_first(comment, ".hnuser")) or "[deleted]"
            points = _text(find_first(comment, ".score")).strip()
            comment_url = f"https://news.ycombinator.com/item?id={cid}"
            date = _date_from_title(find_first(comment, ".age"))

            if depth == 0:
                while blockquote_stack:
                    out.append("</blockquote>")
                    blockquote_stack.pop()
                out.append("<blockquote>")
                blockquote_stack = [0]
            else:
                if depth < current_depth:
                    while blockquote_stack and blockquote_stack[-1] >= depth:
                        out.append("</blockquote>")
                        blockquote_stack.pop()
                elif depth > current_depth:
                    out.append("<blockquote>")
                    blockquote_stack.append(depth)

            out.append('<div class="comment">')
            out.append('<div class="comment-metadata">')
            out.append(f'<span class="comment-author"><strong>{author}</strong></span> •')
            out.append(f' <a href="{comment_url}" class="comment-link">{date}</a> •')
            if points:
                out.append(f' • <span class="comment-points">{points}</span>')
            out.append("</div>")
            out.append(f'<div class="comment-content">{commtext.inner_html()}</div>')
            out.append("</div>")
            current_depth = depth

        while blockquote_stack:
            out.append("</blockquote>")
            blockquote_stack.pop()
        return "".join(out)

    # -- metadata -------------------------------------------------------

    def _get_post_id(self) -> str:
        m = _POST_ID_RE.search(self.url)
        return m.group(1) if m else ""

    def _get_post_title(self) -> str:
        if self.is_comment_page and self.main_comment is not None:
            author = _text(find_first(self.main_comment, ".hnuser")) or "[deleted]"
            commtext = _text(find_first(self.main_comment, ".commtext")).strip()
            # Go slices bytes; preview length is byte-based (hackernews.go:587)
            raw = commtext.encode("utf-8")
            preview = (raw[:50].decode("utf-8", errors="replace") + "...") if len(raw) > 50 else commtext
            return f"Comment by {author}: {preview}"
        if self.main_post is None:
            return ""
        return _text(find_first(self.main_post, ".titleline")).strip()

    def _get_post_author(self) -> str:
        if self.main_post is None:
            return ""
        return _text(find_first(self.main_post, ".hnuser")).strip()

    def _create_description(self) -> str:
        title = self._get_post_title()
        author = self._get_post_author()
        if self.is_comment_page:
            return f"Comment by {author} on Hacker News"
        return f"{title} - by {author} on Hacker News"

    def _get_post_date(self) -> str:
        if self.main_post is None:
            return ""
        return _date_from_title(find_first(self.main_post, ".age"))

    def extract(self) -> ExtractorResult:
        post_content = self._get_post_content()
        comments = self._extract_comments()
        parts = ['<div class="hackernews-post">', '<div class="post-content">',
                 post_content, "</div>"]
        if comments:
            parts.extend(["<hr>", "<h2>Comments</h2>",
                          '<div class="hackernews-comments">', comments, "</div>"])
        parts.append("</div>")
        content_html = "".join(parts).strip()
        return ExtractorResult(
            content=content_html,
            content_html=content_html,
            extracted_content={
                "postId": self._get_post_id(),
                "postAuthor": self._get_post_author(),
            },
            variables={
                "title": self._get_post_title(),
                "author": self._get_post_author(),
                "site": "Hacker News",
                "description": self._create_description(),
                "published": self._get_post_date(),
            },
        )
