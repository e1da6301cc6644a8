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
from .dom import Element
from .selectors import compile_selector

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


def _count_tags(el: Element, tags: tuple) -> dict:
    counts = {t: 0 for t in tags}
    for d in el.descendants():
        if d.tag in counts:
            counts[d.tag] += 1
    return counts


def score_element(el: Element) -> float:
    """scorer.go:325-434."""
    score = 0.0

    text = el.text().strip()
    words = len(text.split())
    score += words

    counts = _count_tags(el, ("p", "a", "img", "table"))
    score += counts["p"] * 10

    denom = max(words, 1)
    score -= (counts["a"] / denom) * 5
    score -= (counts["img"] / denom) * 3

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

    for sel in _FOOTNOTE_INLINE:
        if sel.find_first(el) is not None:
            score += 10
            break
    for sel in _FOOTNOTE_LISTS:
        if sel.find_first(el) is not None:
            score += 10
            break

    score -= counts["table"] * 5

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


def is_likely_content(el: Element) -> bool:
    """scorer.go:600-625."""
    role = el.get("role", "") or ""
    if role in CONTENT_ROLES:
        return True

    class_name = (el.get("class", "") or "").lower()
    el_id = (el.get("id", "") or "").lower()
    for ind in CONTENT_INDICATORS:
        if ind in class_name or ind in el_id:
            return True

    text = el.text().strip()
    words = len(text.split())
    paragraphs = sum(1 for d in el.descendants() if d.tag == "p")
    return words > 100 or (words > 50 and paragraphs > 1) or (words > 30 and paragraphs > 0)


def score_non_content_block(el: Element) -> float:
    """scorer.go:678-730."""
    for sel in _FOOTNOTE_LISTS:
        if sel.find_first(el) is not None:
            return 0.0

    score = 0.0
    text = el.text().strip()
    words = len(text.split())
    if words < 3:
        return 0.0

    lower_text = text.lower()
    for ind in NAVIGATION_INDICATORS:
        if ind in lower_text:
            score -= 10

    links = sum(1 for d in el.descendants() if d.tag == "a")
    if links / max(words, 1) > 0.5:
        score -= 15

    lists = sum(1 for d in el.descendants() if d.tag in ("ul", "ol"))
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
        if is_likely_content(el):
            continue
        if score_non_content_block(el) < 0:
            to_remove.append(el)
    for el in to_remove:
        el.remove()
    return len(to_remove)
