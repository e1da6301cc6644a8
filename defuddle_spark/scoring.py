"""Content scoring — per-document candidate scoring and non-content removal.

Reimplements the semantics of /root/reference/internal/scoring/scorer.go
(ScoreElement :325-434, FindBestElement :453-469, ScoreAndRemove :517-556,
isLikelyContent :600-625, scoreNonContentBlock :678-730). Pure Python, no
Spark imports; runs inside the Arrow-batch kernel.
"""

from __future__ import annotations

import re
from typing import List, Optional

from . import constants
from .dom import ELEMENT, TEXT, Element
from .selectors import SelectorGroup, compile_selector

# scorer.go:20-21
DATE_RE = re.compile(
    r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{1,2},?\s+\d{4}\b",
    re.IGNORECASE,
)
AUTHOR_RE = re.compile(r"\b(?:by|written by|author:)\s+[A-Za-z\s]+\b", re.IGNORECASE)

CONTENT_ROLES = ("article", "main", "contentinfo")

# scorer.go:83-98
CONTENT_INDICATORS = (
    "admonition", "article", "content", "entry", "image", "img", "font",
    "figure", "figcaption", "pre", "main", "post", "story", "table",
)

# scorer.go:142-178
NAVIGATION_INDICATORS = (
    "advertisement", "all rights reserved", "banner", "cookie", "comments",
    "copyright", "follow me", "follow us", "footer", "header", "homepage",
    "login", "menu", "more articles", "more like this", "most read", "nav",
    "navigation", "newsletter", "popular", "privacy", "recommended",
    "register", "related", "responses", "share", "sidebar", "sign in",
    "sign up", "signup", "social", "sponsored", "subscribe", "terms",
    "trending",
)

# scorer.go:208-232
NON_CONTENT_PATTERNS = (
    "ad", "banner", "cookie", "copyright", "footer", "header", "homepage",
    "menu", "nav", "newsletter", "popular", "privacy", "recommended",
    "related", "rights", "share", "sidebar", "social", "sponsored",
    "subscribe", "terms", "trending", "widget",
)

_FOOTNOTE_INLINE = [compile_selector(s) for s in constants.FOOTNOTE_INLINE_REFERENCES]
_FOOTNOTE_LISTS = [compile_selector(s) for s in constants.FOOTNOTE_LIST_SELECTORS]
# match-any groups: "does any descendant match one of these" is
# order-independent, so one indexed walk replaces 15/21 find_first sweeps
_FOOTNOTE_INLINE_GROUP = SelectorGroup(constants.FOOTNOTE_INLINE_REFERENCES)
_FOOTNOTE_LISTS_GROUP = SelectorGroup(constants.FOOTNOTE_LIST_SELECTORS)


class _SubtreeStats:
    """One walk over a subtree: text, tag counts, footnote-selector hits."""

    __slots__ = ("words", "p", "a", "img", "table", "lists", "has_inline_fn",
                 "has_list_fn", "text")

    def __init__(self, el: Element, want_footnotes: bool = True) -> None:
        parts = []
        p = a = img = table = lists = 0
        has_inline = has_list = False
        stack = el.children[::-1]
        while stack:
            node = stack.pop()
            t = node.type
            if t == TEXT:
                parts.append(node.data)
                continue
            if t != ELEMENT:
                continue
            tag = node.tag
            if tag == "p":
                p += 1
            elif tag == "a":
                a += 1
            elif tag == "img":
                img += 1
            elif tag == "table":
                table += 1
            elif tag in ("ul", "ol"):
                lists += 1
            if want_footnotes:
                if not has_inline and _FOOTNOTE_INLINE_GROUP.matches(node):
                    has_inline = True
                if not has_list and _FOOTNOTE_LISTS_GROUP.matches(node):
                    has_list = True
            cs = node.children
            if cs:
                stack.extend(cs[::-1])
        self.text = "".join(parts)
        self.words = len(self.text.split())
        self.p, self.a, self.img, self.table, self.lists = p, a, img, table, lists
        self.has_inline_fn, self.has_list_fn = has_inline, has_list


def score_element(el: Element) -> float:
    """scorer.go:325-434."""
    score = 0.0

    stats = _SubtreeStats(el)
    text = stats.text.strip()
    words = stats.words
    score += words

    score += stats.p * 10

    denom = max(words, 1)
    score -= (stats.a / denom) * 5
    score -= (stats.img / denom) * 3

    style = el.get("style", "") or ""
    align = el.get("align", "") or ""
    if "float: right" in style or "text-align: right" in style or align == "right":
        score += 5

    if DATE_RE.search(text):
        score += 10
    if AUTHOR_RE.search(text):
        score += 10

    class_name = (el.get("class", "") or "").lower()
    if "content" in class_name or "article" in class_name or "post" in class_name:
        score += 15

    if stats.has_inline_fn:
        score += 10
    if stats.has_list_fn:
        score += 10

    score -= stats.table * 5

    if el.tag == "td":
        parent_table = el.closest("table")
        if parent_table is not None:
            width_str = parent_table.get("width", "") or ""
            try:
                table_width = int(width_str)
            except ValueError:
                table_width = 0
            table_align = parent_table.get("align", "") or ""
            table_class = (parent_table.get("class", "") or "").lower()
            is_table_layout = (
                table_width > 400
                or table_align == "center"
                or "content" in table_class
                or "article" in table_class
            )
            if is_table_layout:
                all_cells = [d for d in parent_table.descendants() if d.tag == "td"]
                try:
                    cell_index = all_cells.index(el)
                except ValueError:
                    cell_index = -1
                if 0 < cell_index < len(all_cells) - 1:
                    score += 10

    return score


def find_best_element(elements: List[Element], min_score: float = 50.0) -> Optional[Element]:
    """scorer.go:453-469 — strict > keeps the first best."""
    best = None
    best_score = 0.0
    for el in elements:
        s = score_element(el)
        if s > best_score:
            best_score = s
            best = el
    return best if best_score > min_score else None


def is_likely_content(el: Element, stats: "_SubtreeStats" = None) -> bool:
    """scorer.go:600-625."""
    role = el.get("role", "") or ""
    if role in CONTENT_ROLES:
        return True

    class_name = (el.get("class", "") or "").lower()
    el_id = (el.get("id", "") or "").lower()
    for ind in CONTENT_INDICATORS:
        if ind in class_name or ind in el_id:
            return True

    if stats is None:
        stats = _SubtreeStats(el, want_footnotes=False)
    words = stats.words
    paragraphs = stats.p
    return words > 100 or (words > 50 and paragraphs > 1) or (words > 30 and paragraphs > 0)


def score_non_content_block(el: Element, stats: "_SubtreeStats" = None) -> float:
    """scorer.go:678-730."""
    if stats is None:
        stats = _SubtreeStats(el)
    if stats.has_list_fn:
        return 0.0

    score = 0.0
    text = stats.text.strip()
    words = stats.words
    if words < 3:
        return 0.0

    lower_text = text.lower()
    for ind in NAVIGATION_INDICATORS:
        if ind in lower_text:
            score -= 10

    links = stats.a
    if links / max(words, 1) > 0.5:
        score -= 15

    lists = stats.lists
    if lists > 0 and links > lists * 3:
        score -= 10

    class_name = (el.get("class", "") or "").lower()
    el_id = (el.get("id", "") or "").lower()
    for pattern in NON_CONTENT_PATTERNS:
        if pattern in class_name or pattern in el_id:
            score -= 8

    return score


def score_and_remove(root: Element) -> int:
    """scorer.go:517-556 — collect-then-remove over all block elements."""
    to_remove = []
    for el in root.descendants():
        if el.tag not in constants.BLOCK_ELEMENTS_SET:
            continue
        stats = _SubtreeStats(el)
        if is_likely_content(el, stats):
            continue
        if score_non_content_block(el, stats) < 0:
            to_remove.append(el)
    for el in to_remove:
        el.remove()
    return len(to_remove)
