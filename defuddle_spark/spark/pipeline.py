"""Extraction pipeline: pages DataFrame → results DataFrame.

Physical plan (deliberately minimal — everything non-trivial lives in the
Arrow-batched kernel, everything structural is native so Catalyst can
prune/push/coalesce):

    scan → filter(html nonempty) → [salted repartition by xxhash64(url)]
         → routing column (native rlike) → mapInPandas(kernel) → sink

Skew handling (SURVEY.md §4.2): HTML sizes are heavy-tailed; salting by
url-hash spreads giant docs across partitions instead of letting a
lexicographic url range concentrate them. At cluster scale set
``salt_partitions`` ≈ 2-3x total cores; AQE re-coalesces afterwards.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, LongType, StringType, StructField,
    StructType,
)

RESULT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("title", StringType()),
    StructField("description", StringType()),
    StructField("domain", StringType()),
    StructField("favicon", StringType()),
    StructField("image", StringType()),
    StructField("published", StringType()),
    StructField("author", StringType()),
    StructField("site", StringType()),
    StructField("content", StringType()),
    StructField("extracted_text", StringType()),
    StructField("word_count", IntegerType()),
    StructField("parse_time_ms", LongType()),
    StructField("extractor_type", StringType()),
    StructField("schema_org", StringType()),
    StructField("meta_tags", ArrayType(StructType([
        StructField("name", StringType()),
        StructField("property", StringType()),
        StructField("content", StringType()),
    ]))),
    StructField("retry_used", BooleanType()),
    StructField("error", StringType()),
    # JSON-serialized debug.Info (types.go:89 debugInfo omitempty) —
    # null unless kernel_options={"debug": True}; a null string column
    # costs nothing in Tungsten row layout.
    StructField("debug_json", StringType()),
    # ContentMarkdown (defuddle.go:476-482) — null unless
    # kernel_options={"markdown": True} (or separate_markdown); same
    # null-column economics as debug_json.
    StructField("content_markdown", StringType()),
])

_RESULT_FIELDS = [f.name for f in RESULT_SCHEMA.fields]


def _extract_batches(batches: Iterator[pd.DataFrame],
                     remove_images: bool = False,
                     kernel_options: Optional[dict] = None) -> Iterator[pd.DataFrame]:
    """Arrow-batch kernel driver: one Python call per batch, C-parser per doc.

    Imported lazily on executors; selector tables compile once per worker
    process (module-level caches in defuddle_spark.selectors).
    """
    import json as _json

    from defuddle_spark.kernel import Options, extract_document_bytes

    opts = Options(remove_images=remove_images, **(kernel_options or {}))
    for pdf in batches:
        rows = []
        for url, html in zip(pdf["url"].values, pdf["html"].values):
            if html is None:
                html = b""
            if isinstance(html, memoryview):
                html = bytes(html)
            r = extract_document_bytes(html, url=url, options=opts)
            rows.append((
                url, r.title, r.description, r.domain, r.favicon, r.image,
                r.published, r.author, r.site, r.content, r.extracted_text,
                r.word_count, r.parse_time_ms, r.extractor_type, r.schema_org,
                r.meta_tags or [], r.retry_used, r.error,
                _json.dumps(r.debug_info, ensure_ascii=False,
                            separators=(",", ":"))
                if r.debug_info is not None else None,
                r.content_markdown,
            ))
        yield pd.DataFrame(rows, columns=_RESULT_FIELDS)


def routing_column() -> F.Column:
    """Native rlike routing (registry.go patterns) — vectorized, JVM-side."""
    from defuddle_spark.extractors import url_patterns

    col = F.lit(None).cast(StringType())
    # build right-to-left so the FIRST registered pattern wins
    for pattern, name in reversed(url_patterns()):
        col = F.when(F.col("url").rlike(pattern), F.lit(name)).otherwise(col)
    return col


def extract_pages(pages: DataFrame,
                  salt_partitions: Optional[int] = None,
                  remove_images: bool = False,
                  with_routing_column: bool = True,
                  giant_threshold_bytes: Optional[int] = None,
                  kernel_options: Optional[dict] = None) -> DataFrame:
    """Run the extraction kernel over a pages DataFrame.

    Input must carry (url string, html binary); extra columns are pruned
    (column pruning reaches the parquet scan — only url+html are read).

    Skew defenses (SURVEY.md §4.2, north_rule "skew handled explicitly"):
    - ``salt_partitions``: repartition on xxhash64(url) so giant docs
      scatter instead of clustering in a url-range;
    - ``giant_threshold_bytes``: two-tier split — pages above the
      threshold (heavy-tailed CC reality: multi-MB blobs that take
      100x median kernel time) run through a dedicated maximally-scattered
      pass, so a handful of monsters can't straggle the main wave. Output
      is unionByName'd; per-url results are identical either way.
    """
    df = pages.select("url", "html").filter(
        F.col("html").isNotNull() & (F.length(F.col("html")) > 0))

    # Narrow inputs serialize the kernel: a single parquet file (or a
    # freshly synthesized frame) scans as ONE partition, so the Arrow
    # kernel would run on one core regardless of cluster width. When the
    # caller didn't pick an explicit salt_partitions, widen narrow inputs
    # to the session's parallelism, salted by url-hash (same skew defense
    # as the explicit path). At cluster scale real inputs already carry
    # thousands of files and this is a no-op. The narrowness probe is
    # plan-only (leaf file count, spark.partitions.is_narrow) — an RDD
    # conversion would force AQE to materialize upstream shuffle stages at
    # plan-build time; inputs that already carry a tuned shuffle
    # partitioning should pass salt_partitions explicitly.
    if not salt_partitions and not df.isStreaming:
        from defuddle_spark.spark.partitions import is_narrow
        target = pages.sparkSession.sparkContext.defaultParallelism
        if is_narrow(df, target):
            df = df.repartition(target, F.xxhash64(F.col("url")))

    def _run(part: DataFrame) -> DataFrame:
        return part.mapInPandas(
            lambda it: _extract_batches(it, remove_images=remove_images,
                                        kernel_options=kernel_options),
            schema=RESULT_SCHEMA,
        )

    if giant_threshold_bytes:
        small = df.filter(F.length("html") <= giant_threshold_bytes)
        giant = df.filter(F.length("html") > giant_threshold_bytes)
        if salt_partitions:
            small = small.repartition(salt_partitions, F.xxhash64(F.col("url")))
        # Scatter giants maximally: ROUND-ROBIN with an EXPLICIT partition
        # count. Hash-scatter collides birthday-style when giants are few;
        # and without an explicit count AQE's size-based coalescing stacks
        # the byte-small partitions back together — giant cost is parse
        # CPU, not bytes (measured: AQE coalesced 10x4MB giants into one
        # partition, 2.8x slower than no split at all).
        scatter = 2 * pages.sparkSession.sparkContext.defaultParallelism
        giant = giant.repartition(scatter)
        result = _run(small).unionByName(_run(giant))
    else:
        if salt_partitions:
            df = df.repartition(salt_partitions, F.xxhash64(F.col("url")))
        result = _run(df)
    if with_routing_column:
        result = result.withColumn("extractor_route", routing_column())
    return result
