"""HTML → Markdown conversion (K1, SURVEY.md §2.8).

The reference delegates to JohannesKaufmann/html-to-markdown v2 and then
trims + collapses triple newlines (/root/reference/internal/markdown/
convert.go:13-23). This is a from-scratch converter over our DOM that
matches the output shapes the reference's tests pin
(convert_test.go:38-69): ATX headings, inline links/images, `- ` bullets,
`1. ` ordered items, `> ` blockquotes, fenced code with language.

Depth-bounded like the reference library (convert_behavior_test.go:8-16
expects an error on 20k-deep nesting): raises MarkdownError beyond
MAX_DEPTH.
"""

from __future__ import annotations

import re
from typing import List

from .dom import COMMENT, ELEMENT, TEXT, Element, parse

MAX_DEPTH = 1000


class MarkdownError(Exception):
    pass


_WS_RE = re.compile(r"\s+")
_LANG_RE = re.compile(r"language-([\w+#-]+)")


def _inline_text(el, depth: int) -> str:
    """Render inline content of an element."""
    if depth > MAX_DEPTH:
        raise MarkdownError("maximum nesting depth exceeded")
    parts: List[str] = []
    for child in el.children:
        t = child.type
        if t == TEXT:
            parts.append(_WS_RE.sub(" ", child.data))
        elif t == ELEMENT:
            tag = child.tag
            inner = _inline_text(child, depth + 1)
            if tag in ("strong", "b"):
                s = inner.strip()
                parts.append(f"**{s}**" if s else "")
            elif tag in ("em", "i"):
                s = inner.strip()
                parts.append(f"*{s}*" if s else "")
            elif tag == "code":
                parts.append(f"`{inner.strip()}`" if inner.strip() else "")
            elif tag == "a":
                href = child.get("href") or ""
                s = inner.strip()
                parts.append(f"[{s}]({href})" if href else s)
            elif tag == "img":
                alt = child.get("alt") or ""
                src = child.get("src") or child.get("data-src") or ""
                parts.append(f"![{alt}]({src})" if src else "")
            elif tag == "br":
                parts.append("\n")
            elif tag in ("del", "s", "strike"):
                s = inner.strip()
                parts.append(f"~~{s}~~" if s else "")
            else:
                parts.append(inner)
    return "".join(parts)


def _render_blocks(el, depth: int, out: List[str]) -> None:
    if depth > MAX_DEPTH:
        raise MarkdownError("maximum nesting depth exceeded")
    inline_buf: List[str] = []

    def flush_inline() -> None:
        text = "".join(inline_buf).strip()
        inline_buf.clear()
        if text:
            out.append(text)

    for child in el.children:
        t = child.type
        if t == TEXT:
            inline_buf.append(_WS_RE.sub(" ", child.data))
            continue
        if t == COMMENT:
            continue
        tag = child.tag
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            flush_inline()
            level = int(tag[1])
            text = _inline_text(child, depth + 1).strip()
            if text:
                out.append("#" * level + " " + text)
        elif tag == "p":
            flush_inline()
            text = _inline_text(child, depth + 1).strip()
            if text:
                out.append(text)
        elif tag in ("ul", "ol"):
            flush_inline()
            out.append(_render_list(child, depth + 1, indent=""))
        elif tag == "blockquote":
            flush_inline()
            sub: List[str] = []
            _render_blocks(child, depth + 1, sub)
            quoted = "\n\n".join(sub)
            out.append("\n".join("> " + line if line else ">"
                                 for line in quoted.splitlines()) or "> ")
        elif tag == "pre":
            flush_inline()
            code = next((c for c in child.element_children() if c.tag == "code"),
                        None)
            lang = ""
            src = code if code is not None else child
            cls = (src.get("class") or "") + " " + (src.get("data-lang") or "")
            m = _LANG_RE.search(cls)
            if m:
                lang = m.group(1)
            elif src.get("data-lang"):
                lang = src.get("data-lang")
            body = src.text().strip("\n")
            out.append(f"```{lang}\n{body}\n```")
        elif tag == "hr":
            flush_inline()
            out.append("---")
        elif tag == "table":
            flush_inline()
            md = _render_table(child, depth + 1)
            if md:
                out.append(md)
        elif tag in ("div", "section", "article", "main", "aside", "header",
                     "footer", "nav", "figure", "details", "body", "html",
                     "figcaption", "summary", "form", "fieldset"):
            # container: recurse as block context
            flush_inline()
            _render_blocks(child, depth + 1, out)
        elif tag in ("script", "style", "template"):
            flush_inline()
        else:
            # inline element at block level: accumulate
            inline_buf.append(_inline_text_of_node(child, depth + 1))
    flush_inline()


def _inline_text_of_node(node: Element, depth: int) -> str:
    holder = Element("span")
    # reuse inline renderer by viewing the node as a single child
    fake = Element("span")
    fake.children = [node]
    try:
        return _inline_text(fake, depth)
    finally:
        fake.children = []


def _render_list(lst: Element, depth: int, indent: str) -> str:
    ordered = lst.tag == "ol"
    lines: List[str] = []
    idx = 0
    for li in lst.element_children():
        if li.tag != "li":
            continue
        idx += 1
        marker = f"{idx}. " if ordered else "- "
        nested: List[str] = []
        inline_parts: List[str] = []
        for c in li.children:
            if c.type == ELEMENT and c.tag in ("ul", "ol"):
                nested.append(_render_list(c, depth + 1, indent + "    "))
            elif c.type == ELEMENT and c.tag == "p":
                inline_parts.append(_inline_text(c, depth + 1))
                inline_parts.append(" ")
            elif c.type == TEXT:
                inline_parts.append(_WS_RE.sub(" ", c.data))
            elif c.type == ELEMENT:
                inline_parts.append(_inline_text_of_node(c, depth + 1))
        text = "".join(inline_parts).strip()
        lines.append(indent + marker + text)
        for n in nested:
            lines.append(n)
    return "\n".join(lines)


def _render_table(table: Element, depth: int) -> str:
    rows: List[List[str]] = []
    for tr in (d for d in table.descendants() if d.tag == "tr"):
        cells = [c for c in tr.element_children() if c.tag in ("td", "th")]
        if cells:
            rows.append([_inline_text(c, depth + 1).strip() for c in cells])
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    lines = ["| " + " | ".join(rows[0]) + " |",
             "|" + "|".join(" --- " for _ in range(width)) + "|"]
    for r in rows[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def convert_html(html_content: str) -> str:
    """convert.go:13-23 — convert, trim, collapse triple newlines."""
    if not html_content:
        return ""
    doc = parse(html_content)
    out: List[str] = []
    _render_blocks(doc.body, 0, out)
    md = "\n\n".join(p for p in out if p)
    md = md.strip()
    while "\n\n\n" in md:
        md = md.replace("\n\n\n", "\n\n")
    return md
