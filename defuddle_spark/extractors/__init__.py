"""Site-specific extractor registry.

Mirrors /root/reference/extractors/registry.go:116-173 (URL-pattern
dispatch, first match wins) and base.go:10-105 (ExtractorResult /
interface). In the Spark job the routing decision is *also* precomputed
as a native `rlike` column so DataFrame-level stats/partitioning can see
it; the kernel does the actual extraction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from ..dom import Document


@dataclass
class ExtractorResult:
    """extractors/base.go:10-15."""
    content: str = ""
    content_html: str = ""
    extracted_content: Dict[str, str] = field(default_factory=dict)
    variables: Dict[str, str] = field(default_factory=dict)


class BaseExtractor:
    """extractors/base.go:35-105."""

    def __init__(self, doc: Document, url: str, schema_org_data: Any = None) -> None:
        self.doc = doc
        self.url = url
        self.schema_org_data = schema_org_data

    def can_extract(self) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def extract(self) -> ExtractorResult:  # pragma: no cover - interface
        raise NotImplementedError

    def name(self) -> str:
        return type(self).__name__.removesuffix("Extractor")


# Registry: (compiled url patterns, extractor class) — first match wins
# (registry.go:13-26, 210-359). Patterns are matched against the full URL.
_REGISTRY: List[tuple] = []


def register(patterns: List[str], cls) -> None:
    _REGISTRY.append(([re.compile(p, re.IGNORECASE) for p in patterns], cls))


def url_patterns() -> List[tuple]:
    """(pattern_source, extractor_name) pairs for DataFrame-side routing."""
    out = []
    for patterns, cls in _REGISTRY:
        for p in patterns:
            out.append((p.pattern, cls.__name__.removesuffix("Extractor").lower()))
    return out


def find_extractor(doc: Document, url: str, schema_org_data: Any = None) -> Optional[BaseExtractor]:
    """registry.go:116-173 — first extractor whose pattern matches the URL."""
    if not url:
        return None
    for patterns, cls in _REGISTRY:
        for pattern in patterns:
            if pattern.search(url):
                return cls(doc, url, schema_org_data)
    return None


# Built-in extractors are registered on import (kept in submodules).
from . import hackernews  # noqa: E402,F401
