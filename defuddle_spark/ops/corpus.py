"""Composed corpus-preparation pipeline (the C4-style shape).

Individual operators (dedup, quality, lang-id) are each gate-verified on
their own; this module proves they COMPOSE into the filter every
training-data pipeline runs before tokenization, still as one lazy
Catalyst plan (no intermediate materialization, full pushdown through
the composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import text_quality


def filter_corpus(docs: DataFrame, min_quality: float = 0.5,
                  min_tokens: int = 20, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact-dedup (keep the minimum id per content hash) then
    quality-gate: (doc_id, n_tokens, quality_score) for surviving docs.

    Scale shape: the dedup representative set is a groupBy on the
    16-byte md5 key with map-side partial aggregation (ids only through
    the shuffle); the survivor join is id-keyed; quality scoring is one
    codegen projection. At 10^12 docs this is two shuffles (hash, id)
    and zero Python.
    """
    reps = (docs
            .groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_h"))
            .agg(F.min(id_col).alias(id_col))
            .select(id_col))
    kept = docs.join(reps, id_col)
    q = text_quality(kept, id_col, text_col)
    return (q.filter((F.col("quality_score") >= min_quality)
                     & (F.col("n_tokens") >= min_tokens))
            .select(id_col, "n_tokens", "quality_score"))
