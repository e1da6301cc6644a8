"""HTML → Markdown conversion (K1, SURVEY.md §2.8).

The reference delegates to JohannesKaufmann/html-to-markdown v2.5.1 and
then trims + collapses triple newlines (/root/reference/internal/markdown/
convert.go:13-23). This is a from-scratch converter over our DOM that
targets that library's publicly documented CommonMark output conventions:

- ATX headings, ``**``/``*`` emphasis (nested → ``***``), ``- `` bullets,
  ``1. `` ordered items (honouring ``start=``), ``> `` blockquotes,
  ``---`` thematic breaks, fenced code with the ``language-*`` class.
- Tables: ``ConvertString`` registers only the base + commonmark plugins
  (convert.go:13-23 → v2's one-liner API; the ``plugin/table`` GFM plugin
  is NOT registered), so table elements have no renderer and fall back to
  the base plugin's unknown-element handling: table/section/row/cell tags
  act as plain block containers and each cell's content flattens to its
  own blank-line-separated block. That cell-flattening is our DEFAULT;
  GFM pipe tables remain available behind ``pipe_tables=True``.
- Smart escaping: markdown-significant characters in text are
  backslash-escaped only where they could be re-parsed as markup —
  ``*`` only when flanking a word, ``_`` only at word boundaries
  (``snake_case`` survives), ``#``/``-``/``+``/``>``/``N.`` only at
  line starts, ``!`` only before ``[``, ``~`` only in ``~~`` runs.
- CommonMark code spans: the backtick fence grows past the longest
  backtick run in the content and pads with spaces when the content
  starts/ends with a backtick.
- Link destinations containing whitespace are wrapped in ``<...>``;
  parentheses are backslash-escaped; ``title=`` attributes render as
  ``[text](href "title")`` / ``![alt](src "title")``.
- ``<br>`` renders as a backslash hard break.

Per-construct parity status (byte-parity-expected vs divergent, with
reasons) is catalogued in COVERAGE.md §2.8 — the library cannot be
executed in this container, so behaviors are grounded in its public
README/docs and the reference's own Contains-assertions
(convert_test.go:38-69).

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

# --- smart escaping -------------------------------------------------------

# Always-dangerous inline characters. * and _ get contextual treatment
# below; # - + > and ordered-list dots are line-start-only and handled by
# _escape_line_starts on assembled paragraph text.
_BACKSLASH_RE = re.compile(r"\\")
_BACKTICK_RE = re.compile(r"`")
_BRACKET_RE = re.compile(r"[\[\]]")
_PIPE_RE = re.compile(r"\|")
# * flanked by a non-space on either side could open/close emphasis
_STAR_RE = re.compile(r"(?<=\S)\*|\*(?=\S)")
# _ opens/closes emphasis only at word boundaries (intraword _ is inert)
_UNDERSCORE_RE = re.compile(r"(?<![0-9A-Za-z_])_|_(?![0-9A-Za-z_])")
# ~ matters only in ~~ strikethrough runs
_TILDE_RUN_RE = re.compile(r"~{2,}")
# < could start raw HTML or an autolink
_LT_RE = re.compile(r"<(?=[A-Za-z/!?])")
# ! only before [ (image opener)
_BANG_RE = re.compile(r"!(?=\[)")

_LINE_START_RES = (
    re.compile(r"^(#{1,6})(?=[ \t]|$)"),       # ATX heading
    re.compile(r"^([-+*])(?=[ \t])"),          # bullet marker
    re.compile(r"^(>)"),                       # blockquote
    re.compile(r"^(?:[-*_][ \t]*){3,}$"),      # thematic break line
    re.compile(r"^(=+)[ \t]*$"),               # setext underline
)
_ORDERED_START_RE = re.compile(r"^(\d{1,9})([.)])(?=[ \t]|$)")


def _escape_chars(s: str) -> str:
    """Backslash-escape inline-dangerous characters in a text node.

    Mirrors the v2 library's smart-escaping intent: escape only where a
    markdown parser could re-interpret the character, so prose like
    ``2 * 3`` or ``snake_case`` passes through untouched.
    """
    s = _BACKSLASH_RE.sub(r"\\\\", s)
    s = _BACKTICK_RE.sub(r"\\`", s)
    s = _BRACKET_RE.sub(lambda m: "\\" + m.group(0), s)
    s = _PIPE_RE.sub(r"\\|", s)
    s = _STAR_RE.sub(r"\\*", s)
    s = _UNDERSCORE_RE.sub(r"\\_", s)
    s = _TILDE_RUN_RE.sub(lambda m: "\\" + "\\".join(m.group(0)), s)
    s = _LT_RE.sub(r"\\<", s)
    s = _BANG_RE.sub(r"\\!", s)
    return s


def _escape_line_starts(text: str) -> str:
    """Escape block-level markers at the start of each output line.

    Applied to assembled paragraph text (the only place our renderer
    emits bare line starts — headings, list items, and blockquotes all
    prefix their own markers).
    """
    out = []
    for line in text.split("\n"):
        stripped = line.lstrip(" ")
        pad = line[:len(line) - len(stripped)]
        for rx in _LINE_START_RES:
            if rx.match(stripped):
                stripped = "\\" + stripped
                break
        else:
            m = _ORDERED_START_RE.match(stripped)
            if m:
                # escape the dot/paren, not the digits: 1. -> 1\.
                stripped = (stripped[:m.end(1)] + "\\" +
                            stripped[m.end(1):])
        out.append(pad + stripped)
    return "\n".join(out)


def _escape_link_dest(href: str) -> str:
    """CommonMark link destination: <>-wrap when it contains whitespace,
    otherwise backslash-escape parentheses."""
    if any(c in href for c in " \t\n<>"):
        return "<" + href.replace("\\", "\\\\").replace("<", "\\<") \
                         .replace(">", "\\>") + ">"
    return href.replace("(", "\\(").replace(")", "\\)")


def _title_suffix(el: Element) -> str:
    title = el.get("title")
    if not title:
        return ""
    return ' "' + title.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _code_span(content: str) -> str:
    """CommonMark code span: fence longer than any backtick run inside,
    space-padded when the content begins/ends with a backtick."""
    content = _WS_RE.sub(" ", content)
    if not content.strip():
        return ""
    runs = re.findall(r"`+", content)
    fence = "`" * ((max(len(r) for r in runs) + 1) if runs else 1)
    pad = " " if (content.startswith("`") or content.endswith("`")) else ""
    return f"{fence}{pad}{content}{pad}{fence}"


def _emph(inner: str, delim: str) -> str:
    """Wrap with emphasis delimiters, hoisting boundary whitespace outside
    (``a<b> x </b>b`` must not become ``a** x **b``)."""
    core = inner.strip()
    if not core:
        return inner  # whitespace-only: keep the spacing, drop the markup
    lead = " " if inner[:1].isspace() else ""
    trail = " " if inner[-1:].isspace() else ""
    return f"{lead}{delim}{core}{delim}{trail}"


def _inline_text(el, depth: int) -> str:
    """Render inline content of an element."""
    if depth > MAX_DEPTH:
        raise MarkdownError("maximum nesting depth exceeded")
    parts: List[str] = []
    for child in el.children:
        t = child.type
        if t == TEXT:
            parts.append(_escape_chars(_WS_RE.sub(" ", child.data)))
        elif t == ELEMENT:
            tag = child.tag
            if tag == "code":
                parts.append(_code_span(child.text()))
                continue
            inner = _inline_text(child, depth + 1)
            if tag in ("strong", "b"):
                parts.append(_emph(inner, "**"))
            elif tag in ("em", "i"):
                parts.append(_emph(inner, "*"))
            elif tag == "a":
                href = child.get("href") or ""
                s = inner.strip()
                if href:
                    parts.append(
                        f"[{s}]({_escape_link_dest(href)}"
                        f"{_title_suffix(child)})")
                else:
                    parts.append(s)
            elif tag == "img":
                alt = _BRACKET_RE.sub(
                    lambda m: "\\" + m.group(0), child.get("alt") or "")
                src = child.get("src") or child.get("data-src") or ""
                if src:
                    parts.append(
                        f"![{alt}]({_escape_link_dest(src)}"
                        f"{_title_suffix(child)})")
            elif tag == "br":
                parts.append("\\\n")
            elif tag in ("del", "s", "strike"):
                parts.append(_emph(inner, "~~"))
            else:
                parts.append(inner)
    # emphasis whitespace hoisting can double up spaces at boundaries
    return re.sub(r" {2,}", " ", "".join(parts))


# Table-family tags that act as plain block containers when the GFM
# table plugin is absent (the reference's default — see module docstring).
_TABLE_CONTAINER_TAGS = frozenset({
    "thead", "tbody", "tfoot", "tr", "td", "th", "caption", "colgroup",
})

# Unhandled BLOCK elements render their children as blocks (v2's base
# plugin classifies these as block nodes): a dl flattens to
# term/definition blocks, an hgroup keeps its heading a heading, a menu
# or orphan <li> flattens per item — NOT inline-concatenated.
_BLOCK_CONTAINER_TAGS = frozenset({
    "div", "section", "article", "main", "aside", "header", "footer",
    "nav", "figure", "details", "body", "html", "figcaption", "summary",
    "form", "fieldset", "dl", "dt", "dd", "address", "center", "hgroup",
    "menu", "dir", "output", "audio", "video", "canvas", "li",
})


def _render_blocks(el, depth: int, out: List[str],
                   pipe_tables: bool = False) -> None:
    if depth > MAX_DEPTH:
        raise MarkdownError("maximum nesting depth exceeded")
    inline_buf: List[str] = []

    def flush_inline() -> None:
        text = "".join(inline_buf).strip()
        inline_buf.clear()
        if text:
            out.append(_escape_line_starts(text))

    for child in el.children:
        t = child.type
        if t == TEXT:
            inline_buf.append(_escape_chars(_WS_RE.sub(" ", child.data)))
            continue
        if t == COMMENT:
            continue
        tag = child.tag
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            flush_inline()
            level = int(tag[1])
            text = _WS_RE.sub(" ", _inline_text(child, depth + 1)).strip()
            if text:
                out.append("#" * level + " " + text)
        elif tag == "p":
            flush_inline()
            text = _inline_text(child, depth + 1).strip()
            if text:
                out.append(_escape_line_starts(text))
        elif tag in ("ul", "ol"):
            flush_inline()
            lst = _render_list(child, depth + 1, indent="",
                               pipe_tables=pipe_tables)
            if lst:
                out.append(lst)
        elif tag == "blockquote":
            flush_inline()
            sub: List[str] = []
            _render_blocks(child, depth + 1, sub, pipe_tables)
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
            # grow the fence past any backtick run in the body
            runs = re.findall(r"`{3,}", body)
            fence = "`" * ((max(len(r) for r in runs) + 1) if runs else 3)
            out.append(f"{fence}{lang}\n{body}\n{fence}")
        elif tag == "hr":
            flush_inline()
            out.append("---")
        elif tag == "table":
            flush_inline()
            if pipe_tables:
                md = _render_table(child, depth + 1)
                if md:
                    out.append(md)
            else:
                # Reference default: no table renderer registered → the
                # table acts as a block container and cells flatten to
                # their own blocks (module docstring).
                _render_blocks(child, depth + 1, out, pipe_tables)
        elif tag in _BLOCK_CONTAINER_TAGS or tag in _TABLE_CONTAINER_TAGS:
            # container: recurse as block context. Table-family tags act as
            # containers in BOTH modes — with pipe_tables a well-formed
            # table is consumed whole by _render_table above, so any
            # td/tr/caption reaching this dispatcher is an ORPHAN (outside
            # a <table>) and must render as blocks exactly like the
            # default mode, not fall to inline accumulation.
            flush_inline()
            _render_blocks(child, depth + 1, out, pipe_tables)
        elif tag in ("script", "style", "template"):
            flush_inline()
        else:
            # inline element at block level: accumulate
            inline_buf.append(_inline_text_of_node(child, depth + 1))
    flush_inline()


def _inline_text_of_node(node: Element, depth: int) -> str:
    fake = Element("span")
    fake.children = [node]
    try:
        return _inline_text(fake, depth)
    finally:
        fake.children = []


_LI_BLOCK_TAGS = frozenset({
    "p", "blockquote", "pre", "table", "hr", "div", "section", "article",
    "figure", "details", "h1", "h2", "h3", "h4", "h5", "h6",
})


def _render_list(lst: Element, depth: int, indent: str,
                 pipe_tables: bool = False) -> str:
    ordered = lst.tag == "ol"
    lines: List[str] = []
    try:
        idx = int(lst.get("start") or 1) - 1
    except ValueError:
        idx = 0
    for li in lst.element_children():
        if li.tag != "li":
            continue
        idx += 1
        marker = f"{idx}. " if ordered else "- "
        # Item content is a sequence of blocks: the first renders on the
        # marker line; later non-list blocks become blank-line-separated
        # continuation blocks indented 4 spaces (CommonMark list-item
        # continuation); nested lists attach tight (no blank line).
        blocks: List[tuple] = []  # (kind, text) with kind in inline|list
        inline_parts: List[str] = []

        def _flush() -> None:
            text = "".join(inline_parts).strip()
            inline_parts.clear()
            if text:
                blocks.append(("inline", text))

        for c in li.children:
            if c.type == ELEMENT and c.tag in ("ul", "ol"):
                _flush()
                sub = _render_list(c, depth + 1, indent + "    ",
                                   pipe_tables=pipe_tables)
                if sub:
                    blocks.append(("list", sub))
            elif c.type == ELEMENT and c.tag == "p":
                _flush()
                text = _inline_text(c, depth + 1).strip()
                if text:
                    blocks.append(("inline", text))
            elif c.type == ELEMENT and c.tag in _LI_BLOCK_TAGS:
                _flush()
                holder = Element("div")
                holder.children = [c]
                sub_blocks: List[str] = []
                try:
                    _render_blocks(holder, depth + 1, sub_blocks, pipe_tables)
                finally:
                    holder.children = []
                blocks.extend(("inline", b) for b in sub_blocks if b)
            elif c.type == TEXT:
                inline_parts.append(_escape_chars(_WS_RE.sub(" ", c.data)))
            elif c.type == ELEMENT:
                inline_parts.append(_inline_text_of_node(c, depth + 1))
        _flush()

        first = blocks[0][1] if blocks and blocks[0][0] == "inline" else ""
        rest = blocks[1:] if first else blocks
        lines.append(indent + marker + first)
        cont = indent + "    "
        for kind, body in rest:
            if kind == "list":
                lines.append(body)
            else:
                lines.append("")
                lines.extend(cont + ln if ln else "" for ln in body.splitlines())
    return "\n".join(lines)


def _render_table(table: Element, depth: int) -> str:
    rows: List[List[str]] = []
    for tr in (d for d in table.descendants() if d.tag == "tr"):
        cells = [c for c in tr.element_children() if c.tag in ("td", "th")]
        if cells:
            rows.append([_WS_RE.sub(" ", _inline_text(c, depth + 1)).strip()
                         for c in cells])
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    lines = ["| " + " | ".join(rows[0]) + " |",
             "|" + "|".join(" --- " for _ in range(width)) + "|"]
    for r in rows[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def convert_html(html_content: str, pipe_tables: bool = False) -> str:
    """convert.go:13-23 — convert, trim, collapse triple newlines.

    ``pipe_tables=False`` (default) matches the reference's
    ``ConvertString`` (base + commonmark only — no table plugin): table
    cells flatten to blank-line-separated blocks. ``pipe_tables=True``
    renders GFM pipe tables instead (the ``plugin/table`` behavior).
    """
    if not html_content:
        return ""
    doc = parse(html_content)
    out: List[str] = []
    _render_blocks(doc.body, 0, out, pipe_tables)
    md = "\n\n".join(p for p in out if p)
    md = md.strip()
    while "\n\n\n" in md:
        md = md.replace("\n\n\n", "\n\n")
    return md
