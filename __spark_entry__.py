"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship extraction over synthesized sf0.001 pages.
queries()      — operator surface from SURVEY.md §2 + training-data ops.
oracle_sql()   — DuckDB-equivalent SQL for every SQL-expressible query;
                 kernel-internal/probabilistic ops get rows-only checks.

The extraction queries close the loop end-to-end: pages are synthesized
from the `documents` table with native Spark SQL templates whose
extraction result is *predictable in SQL* (see defuddle_spark/spark/pages.py
synthesis contract), so DuckDB can assert byte-identical extracted text,
titles, metadata chains, and word counts against the real kernel output.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_001 = "/root/testdata/sf0.001"

# shared SQL fragments for the oracles
# explicit charclass, not \s: RE2's \s lacks \x0B while Java's has it —
# mirrors ops/textstats._tokens so both engines tokenize every byte alike
# (real control characters inside the SQL literal; RE2 classes take them)
_TOKENS = "regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')"
_WC = f"CAST(len({_TOKENS}) AS INTEGER)"
_URL = "'https://docs.example.test/' || lang || '/' || source || '/' || doc_id || '-r0'"
_TITLE = "'Doc ' || CAST(doc_id AS VARCHAR)"
_DID = "CAST(doc_id AS VARCHAR)"
_NN = "chr(10) || chr(10)"
# family-7 mid-literal: hr, backslash hard break, image open (precomputed:
# f-string expressions cannot contain backslashes)
_MD7_MID = ("\n\n---\n\nline one \\" + chr(10)
            + " line two\n\n![Figure ")
# family-8 tail: remaining flattened table cells (reference default:
# ConvertString registers no table plugin -> cells become blocks)
_MD8_TAIL = "\n\n7\n\nbeta\n\n9\n\n"
# family-8 bytes with the GFM table plugin ON (extract_markdown_pipe gate):
# the same table renders as a pipe table instead of flattened cells
_MDP_HEAD = "| Name | Count |\n| --- | --- |\n| alpha "
_MDP_TAIL = " | 7 |\n| beta | 9 |\n\n"
# family-9 head/tail: smart-escaping bytes as produced by _escape_chars /
# _escape_line_starts (precomputed: backslashes not allowed in f-string
# expressions). The unescaped `!` before `\[` is deliberate: brackets are
# escaped before the bang rule runs, so `![` is already neutralized.
_MD9_HEAD = ("flank \\*x\\* and 2 * 3 stay snake_case keeps \\_emph\\_ ok"
             "\n\n\\# lead\n\n\\- dash\n\n1\\. num\n\n\\> quo"
             "\n\ntick \\`code\\` see \\[ref ")
_MD9_TAIL = ("\\] a\\|b \\~\\~x\\~\\~ go!\\[now \\<div C:\\\\dir inside"
             "\n\n")

# Shared recursive-closure CTE over the tripled corpus (dedup_clusters
# computes components from it; dedup_survivors inverts it to the keep-set)
_CLUSTERS_CTE = f"""WITH RECURSIVE
            docs3 AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id + 10000, text FROM documents
                UNION ALL SELECT doc_id + 20000, text FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id, sh FROM (
                    SELECT doc_id,
                           unnest([array_to_string(toks[i:i+2], ' ')
                                   for i in range(1, len(toks) - 1)]) AS sh
                    FROM (SELECT doc_id, {_TOKENS} AS toks FROM docs3)
                )
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_common
                FROM sh a JOIN sh b USING (sh)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            prs AS (
                SELECT id_a, id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE n_common = sa.n AND n_common = sb.n
            ),
            edges AS (
                SELECT id_a AS s, id_b AS d FROM prs
                UNION SELECT id_b, id_a FROM prs
            ),
            reach(node, r) AS (
                SELECT DISTINCT s, s FROM edges
                UNION
                SELECT e.s, reach.r FROM edges e
                JOIN reach ON reach.node = e.d
            )"""
# SQL literal of ops.textstats.BPE_TOKEN_RE (apostrophes doubled)
from defuddle_spark.ops.textstats import BPE_TOKEN_RE as _BPE_RE
_BPE_SQL = "'" + _BPE_RE.replace("'", "''") + "'"


def _state_partitions(spark: SparkSession, n: int = 8,
                      n_keys: int | None = None):
    """Conf bracket sizing the stateful-streaming gates' state-store
    partition count to the gate corpus. Two costs pull in opposite
    directions: every micro-batch pays one state-store task + Python
    worker round-trip PER PARTITION (so partitions must not dwarf the
    key volume — measured r7 on the watermark gate at sf0.01: 26 s at
    32 → 11 s at 8), while applyInPandasWithState pays per-KEY Python
    overhead (~0.5 ms/key — pandas frame in/out per group), so once a
    batch carries thousands of keys the work must spread across cores
    (measured r8, watermark gate: sf0.01 500 keys/batch 4.9 s at 8 vs
    5.9 s at 32; sf0.1 5000 keys/batch 9.5 s at 8 vs 7.4 s at 32).
    Passing ``n_keys`` (keys per micro-batch) picks
    min(cores, max(8, n_keys // 150)) — ~150+ keys per partition
    amortize the per-partition fixed cost, capped at available
    parallelism. The value is pinned into the checkpoint at first
    start, so it brackets the whole run; a production deployment sizes
    it to cluster cores × key volume the same way. Restores the session
    conf on exit (batch gates keep the session default)."""
    from contextlib import contextmanager

    if n_keys is not None:
        n = min(spark.sparkContext.defaultParallelism,
                max(8, n_keys // 150))

    @contextmanager
    def bracket():
        key = "spark.sql.shuffle.partitions"
        old = spark.conf.get(key)
        spark.conf.set(key, str(n))
        try:
            yield
        finally:
            spark.conf.set(key, old)
    return bracket()


def _scratch_dir(prefix: str, sf_dir: str) -> str:
    """Per-process gate scratch dir under /tmp (the returned frames are
    collected lazily AFTER the query function returns, so the files must
    outlive it — hence no TemporaryDirectory). The pid suffix isolates
    concurrent drivers; to keep /tmp bounded across rounds, siblings
    whose owning pid is DEAD are reaped here (live runs untouched)."""
    import glob
    import hashlib
    import shutil
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    base = f"/tmp/{prefix}_{h}_{os.getpid()}"
    for d in glob.glob(f"/tmp/{prefix}_*"):
        try:
            pid = int(d.rsplit("_", 1)[1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass
    shutil.rmtree(base, ignore_errors=True)
    return base


def _pages(spark: SparkSession, sf_dir: str):
    from defuddle_spark.spark.pages import synthesize_pages
    return synthesize_pages(spark, sf_dir)


def _extract(spark: SparkSession, sf_dir: str, archetype=None) -> DataFrame:
    from defuddle_spark.spark.pipeline import extract_pages
    pages = _pages(spark, sf_dir)
    if archetype is not None:
        pages = pages.filter(F.col("doc_id") % 3 == archetype)
    return extract_pages(pages.select("url", "html"), with_routing_column=False)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_doubled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ shifted-id copy — deterministic planted duplicates so the
    dedup/jaccard checks exercise real collapsing, not a no-op."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.unionByName(d.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))


_DOCS_DOUBLED_SQL = ("(SELECT doc_id, text FROM documents "
                     "UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM documents)")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over sf0.001 synthesized pages."""
    return _extract(spark, SF_001).select(
        "url", "title", "author", "site", "domain", "published",
        "extracted_text", "word_count", "extractor_type", "error")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_extract_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """content is asserted byte-identically, which proves the R2 (small
    tracking img) and R4 (display:none block) removals planted inside the
    article ran AND that the full-size figure was kept."""
    return _extract(spark, sf_dir, archetype=0).select(
        "url", "title", "content", "extracted_text", "word_count")


def q_extract_noimages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 removeAllImages: same semantic pages with remove_images=True —
    the kept figure from extract_semantic must now be gone (content
    byte-identity again)."""
    from defuddle_spark.spark.pipeline import extract_pages
    pages = _pages(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False,
                        remove_images=True)
    return out.select("url", "content", "word_count")


def q_extract_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _extract(spark, sf_dir, archetype=1).select(
        "url", "title", "author", "site", "description", "published",
        "domain", "image", "favicon")


def q_extract_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _extract(spark, sf_dir, archetype=2).select(
        "url", "content", "extracted_text", "word_count")


def q_extract_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _extract(spark, sf_dir)
    lang = F.regexp_extract("url", r"docs\.example\.test/([a-z]+)/", 1)
    return (out.withColumn("lang", lang)
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("word_count").alias("sum_words"),
                 F.round(F.avg("word_count"), 4).alias("avg_words"))
            .select("lang", "n_docs", "sum_words", "avg_words"))


def q_extract_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """findContentByScoring path (C4/C5): pages with no entry-point selector
    and no table; the div/section scorer must pick the article div."""
    from defuddle_spark.spark.pages import synthesize_scored_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_scored_pages(spark, sf_dir)
    return (extract_pages(pages.select("url", "html"), with_routing_column=False)
            .select("url", "title", "extracted_text", "word_count"))


def q_extract_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """findTableBasedContent path (C3): no entry selectors; the middle td of
    a width-800 layout table must win the cell scorer."""
    from defuddle_spark.spark.pages import synthesize_table_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_table_pages(spark, sf_dir)
    return (extract_pages(pages.select("url", "html"), with_routing_column=False)
            .select("url", "title", "extracted_text", "word_count"))


def q_extract_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<200-word retry loop (C6): a partial-selector byline is removed on
    the first pass; short docs retry without partial selectors and keep it.
    retry_used is part of the asserted output so the oracle's CASE on token
    count checks the threshold itself."""
    from defuddle_spark.spark.pages import synthesize_retry_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_retry_pages(spark, sf_dir)
    return (extract_pages(pages.select("url", "html"), with_routing_column=False)
            .select("url", "title", "extracted_text", "word_count", "retry_used"))


def q_extract_giant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier giant-page skew path end-to-end (pipeline.py
    giant_threshold_bytes): every 50th page is ~1 MB (its paragraph
    repeated 2000x), routed through the dedicated maximally-scattered
    giant tier while normal pages ride the salted main wave. The oracle
    reproduces the repeated text byte-identically, so per-url identity
    across the tier split is hash-asserted at the gate."""
    from defuddle_spark.spark.pages import synthesize_giant_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_giant_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"),
                        with_routing_column=False,
                        salt_partitions=spark.sparkContext.defaultParallelism,
                        giant_threshold_bytes=100_000)
    return out.select("url", "title", "extracted_text", "word_count")


def q_extract_debug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document debug surface (internal/debug/debugger.go:12-59) at the
    gate: kernel_options={"debug": True} emits a debug_json column; the
    deterministic statistics (element counts over the fixed-layout
    archetype, step names, extractor) are hash-asserted against constants.
    Timings are nondeterministic and excluded."""
    from defuddle_spark.spark.pages import synthesize_giant_pages
    from defuddle_spark.spark.pipeline import extract_pages
    # repeats=1 => no giants: a fixed-layout corpus where every debug
    # statistic is a per-corpus constant
    pages = synthesize_giant_pages(spark, sf_dir, repeats=1)
    out = extract_pages(pages.select("url", "html"),
                        with_routing_column=False,
                        kernel_options={"debug": True})
    j = lambda p: F.get_json_object("debug_json", p)  # noqa: E731
    return out.select(
        "url", "word_count",
        j("$.statistics.originalElementCount").cast("int").alias("orig_elements"),
        j("$.statistics.finalElementCount").cast("int").alias("final_elements"),
        j("$.statistics.removedElementCount").cast("int").alias("removed_elements"),
        j("$.statistics.wordCount").cast("int").alias("debug_word_count"),
        j("$.statistics.imageCount").cast("int").alias("image_count"),
        j("$.statistics.linkCount").cast("int").alias("link_count"),
        j("$.processingSteps[*].step").alias("steps"),
        j("$.extractorUsed").alias("extractor_used"))


def q_extract_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming extraction at the gate (spark/streaming.py:35):
    the archetype-0 pages are staged to a file-source directory, drained
    by extract_pages_stream with an availableNow trigger into a
    checkpointed parquet sink, and the SINK's contents are returned —
    oracled byte-identically like the batch extract_semantic query (the
    streaming plan shares every operator with the batch plan)."""
    from defuddle_spark.spark.pages import pages_only, synthesize_pages
    from defuddle_spark.spark.streaming import extract_pages_stream
    base = _scratch_dir("defuddle_stream_gate", sf_dir)
    inp, outp, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    pages = synthesize_pages(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    pages_only(pages).write.parquet(inp)
    q = extract_pages_stream(spark, inp, outp, ckpt, available_now=True)
    q.awaitTermination()
    return spark.read.parquet(outp).select("url", "content", "word_count")


def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator at the gate
    (applyInPandasWithState, spark/streaming.py dedup_exact_stream):
    the doubled corpus is drained in one availableNow batch (single
    input file, so per-hash min is global and deterministic) and the
    sink must hold exactly the batch dedup_exact representative set —
    first-seen doc per content hash. Cross-batch state suppression is
    pinned separately in tests/test_streaming.py."""
    from defuddle_spark.spark.streaming import dedup_exact_stream
    base = _scratch_dir("defuddle_dedup_stream", sf_dir)
    inp, outp, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    _docs_doubled(spark, sf_dir).coalesce(1).write.parquet(inp)
    # keys/batch = distinct texts = the base corpus size (the doubled
    # copies share their originals' hashes); parquet-metadata count
    n_keys = _docs(spark, sf_dir).count()
    with _state_partitions(spark, n_keys=n_keys):
        q = dedup_exact_stream(spark, inp, outp, ckpt, available_now=True)
        q.awaitTermination()
    return spark.read.parquet(outp).select("text_md5", "doc_id")


def q_dedup_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time (watermark-evicted) streaming dedup at the gate — the
    availableNow-capable bounded-state mode (spark/streaming.py
    dedup_exact_stream_watermark; the processing-time TTL mode cannot
    drain in batch, an engine limitation measured in round 5).

    Three deterministic micro-batches (mtime-ordered files under
    maxFilesPerTrigger=1): the originals emit; a far-future batch of NEW
    docs advances the watermark past the originals' 1-hour window; a third
    batch of exact duplicates then RE-emits because their hashes were
    evicted. The sink therefore holds all three slices — SQL-predictable,
    and only if eviction actually ran (without it the duplicate batch is
    suppressed and the row count drops by a third)."""
    import glob
    import shutil

    from defuddle_spark.spark.streaming import dedup_exact_stream_watermark

    base = _scratch_dir("defuddle_dedup_wm", sf_dir)
    inp, outp, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    os.makedirs(inp, exist_ok=True)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    t0 = 1_700_000_000
    batches = [
        docs.select("doc_id", "text",
                    F.timestamp_seconds(F.lit(t0)).alias("ts")),
        docs.select((F.col("doc_id") + 30000).alias("doc_id"),
                    F.concat("text", F.lit(" wm-advance")).alias("text"),
                    F.timestamp_seconds(F.lit(t0 + 100_000)).alias("ts")),
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text",
                    F.timestamp_seconds(F.lit(t0 + 100_010)).alias("ts")),
    ]
    # ONE staging job for all three micro-batch files (round 8; was one
    # coalesce(1) write job per batch): union with a batch tag,
    # repartition by the tag so each batch's rows land in exactly one
    # task, and partitionBy writes one file per _b= directory — the
    # files are then renamed into mtime order exactly as before. The
    # parquet files carry (doc_id, text, ts) only (the partition column
    # is directory-encoded), identical to the per-batch writes.
    stage = f"{base}/stage"
    tagged = None
    for i, df in enumerate(batches):
        t = df.withColumn("_b", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    (tagged.repartition(4, "_b")
     .write.partitionBy("_b").parquet(stage))
    for i in range(len(batches)):
        part = glob.glob(f"{stage}/_b={i}/part-*.parquet")[0]
        dest = f"{inp}/b{i}.parquet"
        os.replace(part, dest)
        os.utime(dest, (1000 * (i + 1), 1000 * (i + 1)))  # batch order
    shutil.rmtree(stage, ignore_errors=True)
    # one staged file per micro-batch -> keys/batch = the corpus size
    with _state_partitions(spark, n_keys=docs.count()):
        q = dedup_exact_stream_watermark(spark, inp, outp, ckpt,
                                         dedup_window_ms=3_600_000,
                                         available_now=True,
                                         max_files_per_trigger=1)
        q.awaitTermination()
    return spark.read.parquet(outp).select("text_md5", "doc_id")


def q_minhash_lsh_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MinHash-LSH at the gate: the doubled corpus drains
    through the stateful banding (row-local bit-identical signatures →
    applyInPandasWithState buckets) and the planted (i, i+10000)
    identical-text pairs are guaranteed recovered — same deterministic
    construction as the batch minhash_lsh_planted oracle. Exact batch
    equality of the full candidate set is pinned by differential test
    (tests/test_streaming.py)."""
    from defuddle_spark.spark.streaming import minhash_lsh_stream
    base = _scratch_dir("defuddle_mhlsh_stream", sf_dir)
    inp, outp, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    # bounded planted subset (docs 0-99 + their copies): the row-local
    # signature is interpreted (HOFs never enter codegen), so the gate
    # corpus stays small and the input is SPREAD — a 1-2 file source
    # would compute all signatures on 1-2 cores (the streaming analogue
    # of ops.dedup._ensure_parallel). Full-corpus batch equality is
    # pinned by tests/test_streaming.py.
    par = spark.sparkContext.defaultParallelism
    (_docs_doubled(spark, sf_dir)
     .filter((F.col("doc_id") % 10000) < 100)
     .repartition(par)
     .write.parquet(inp))
    # 100 distinct texts x 16 bands of bucket keys per batch
    with _state_partitions(spark, n_keys=16 * 100):
        q = minhash_lsh_stream(spark, inp, outp, ckpt, available_now=True)
        q.awaitTermination()
    return (spark.read.parquet(outp)
            .filter((F.col("id_b") - F.col("id_a") == 10000)
                    & (F.col("id_a") < 10000))
            .select("id_a", "id_b").distinct())


def q_extract_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 markdown through the driver gate (internal/markdown/convert.go:
    13-23): ten construct families (doc_id % 10 — headings, emphasis,
    ul, ol, link-with-title, code span + fence, blockquote, hr/br/image,
    table cell-flattening, and smart-escaping) whose converted markdown is
    a fixed shape around the document text, hash-asserted byte-identically
    against DuckDB string construction. Family 8 pins the reference
    default's table behavior (ConvertString registers base+commonmark
    only — no table plugin — so cells flatten to blocks); family 9 pins
    the escape rules' exact bytes (``*`` flanking, ``_`` word-boundary,
    line-start ``#``/``-``/``N.``/``>``, brackets/pipe/tilde-run/
    backtick/backslash/``<``)."""
    from defuddle_spark.spark.pages import synthesize_markdown_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_markdown_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False,
                        kernel_options={"markdown": True})
    return out.select("url", "content_markdown", "word_count")


def q_extract_markdown_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 markdown with the GFM table plugin enabled
    (Options.markdown_pipe_tables — the reference's plugin/table behavior,
    opt-in because ConvertString's default registers no table plugin):
    the family-8 table docs render as pipe tables, so BOTH table modes are
    oracle-frozen (VERDICT r5 #5; the default flatten mode is family 8 of
    extract_markdown)."""
    from defuddle_spark.spark.pages import synthesize_markdown_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = (synthesize_markdown_pages(spark, sf_dir)
             .filter(F.col("doc_id") % 10 == 8))
    out = extract_pages(pages.select("url", "html"), with_routing_column=False,
                        kernel_options={"markdown": True,
                                        "markdown_pipe_tables": True})
    return out.select("url", "content_markdown", "word_count")


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion + emission gate: archetype-0 pages wrapped in
    WARC/1.0 response records (one gzip member per record — Common
    Crawl's convention) with capture-transport artifacts cycling per
    record (identity / chunked / Content-Encoding gzip / deflate) plus
    a warcinfo member the default warc_types filter must drop. The
    archives go through the FULL archive loop: read_warc → write_warc
    (atomic-rename protocol, WARC-Date second truncation, per-record
    ids) → read_warc again → extract_pages — so the writer's emitted
    bytes are covered by the same oracle, not just pytest (verdict r6
    #3). The oracle is the PLAIN pages-path oracle (extract_semantic's
    shape) plus a constant http_status: archive framing, transport
    decode, and the writer round-trip must all be byte-transparent.
    Input synthesis collects the bounded archetype-0 slice to the
    driver ONLY to write the archive fixture; the path under test
    (binaryFile → mapInPandas parse → writer → kernel) is fully
    distributed. http_status rides a localCheckpoint of the read-back
    frame, so the emitted archives are read ONCE for both the
    extraction input and the status join (ADVICE r6). (Reference
    defuddle.go:89-108 parses strings / fetched URLs; archive
    ingestion/emission is the corpus-scale layer it leaves to the
    caller.)"""
    import shutil

    from defuddle_spark.spark.pipeline import extract_pages
    from defuddle_spark.spark.warc import (build_http_response,
                                           build_warc_archive,
                                           build_warc_record, read_warc,
                                           write_warc)

    rows = (_pages(spark, sf_dir)
            .withColumn("doc_id", F.regexp_extract(
                "url", r"/(\d+)-r0$", 1).cast("long"))
            .filter(F.col("doc_id") % 3 == 0)
            .select("url", "html").sort("url").collect())
    base = _scratch_dir("defuddle_warc_gate", sf_dir)
    d = os.path.join(base, "archives")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    transports = ("identity", "chunked", "gzip", "deflate")
    per_file = 512
    for f0 in range(0, len(rows), per_file):
        records = [build_warc_record(
            b"software: defuddle-spark warc gate\r\n",
            warc_type="warcinfo", content_type="application/warc-fields",
            record_id=f"<urn:uuid:info-{f0}>")]
        for i, row in enumerate(rows[f0:f0 + per_file], start=f0):
            records.append(build_warc_record(
                build_http_response(bytes(row["html"]),
                                    transport=transports[i % 4]),
                url=row["url"], record_id=f"<urn:uuid:{i}>"))
        with open(os.path.join(d, f"gate-{f0:06d}.warc.gz"), "wb") as fh:
            fh.write(build_warc_archive(records))

    # one pass over the fixture archives feeds the writer (the manifest
    # action is the only job that reads them)
    emitted = os.path.join(base, "emitted")
    manifest = write_warc(
        read_warc(spark, d).select("url", "warc_ts", "html", "http_status"),
        emitted, records_per_file=per_file, overwrite=True)
    n_written = manifest.agg(F.sum("records")).collect()[0][0]
    if n_written != len(rows):
        raise RuntimeError(
            f"warc_extract gate: writer emitted {n_written} records, "
            f"expected {len(rows)}")
    # one pass over the emitted archives: localCheckpoint materializes
    # the read-back rows once, then both the extraction branch and the
    # http_status join consume the checkpoint
    back = (read_warc(spark, emitted)
            .select("url", "html", "http_status")
            .localCheckpoint(eager=True))
    out = extract_pages(back.select("url", "html"),
                        with_routing_column=False)
    return out.join(F.broadcast(back.select("url", "http_status")),
                    "url").select(
        "url", "title", "content", "extracted_text", "word_count",
        "http_status")


def q_extract_hackernews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractor routing through the driver gate: synthesized HN item pages
    → HackerNews extractor; every output column predictable in SQL."""
    from defuddle_spark.spark.pages import synthesize_hn_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_hn_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    return out.select("url", "title", "author", "site", "published", "domain",
                      "extractor_type", "extracted_text", "word_count")


def q_extract_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six opt-in element processors through the Spark pipeline:
    kernel_options turns them on, and the oracle's byte-identity on
    content proves each transform ran (every processed form differs from
    the default path's output)."""
    from defuddle_spark.spark.pages import synthesize_elements_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_elements_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False,
                        kernel_options={"process_headings": True,
                                        "process_roles": True,
                                        "process_code": True,
                                        "process_math": True,
                                        "process_footnotes": True,
                                        "process_images": True})
    return out.select("url", "title", "content", "extracted_text", "word_count")


def q_extract_github(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second extractor-routing oracle (GitHub issues): every column of the
    extractor's output — content header/body assembly, site string,
    truncated ws-normalized description — predictable in SQL."""
    from defuddle_spark.spark.pages import synthesize_github_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_github_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    return out.select("url", "title", "site", "domain", "description",
                      "extractor_type", "extracted_text", "word_count")


def q_extract_youtube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third extractor-routing oracle (YouTube): the VideoObject metadata
    travels through the offline JSON-LD expansion path (jsonld.py), so this
    gate-checks M2's expansion pipeline end-to-end alongside the extractor's
    embed assembly and word-boundary description truncation."""
    from defuddle_spark.spark.pages import synthesize_youtube_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_youtube_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    return out.select("url", "title", "author", "site", "published", "domain",
                      "image", "description", "extractor_type", "content",
                      "extracted_text", "word_count")


def q_extract_reddit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth extractor-routing oracle (Reddit): shreddit-post body +
    comment-thread blockquote assembly, r/<sub> site, 140-char description."""
    from defuddle_spark.spark.pages import synthesize_reddit_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_reddit_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    return out.select("url", "title", "author", "site", "domain",
                      "description", "extractor_type", "content",
                      "extracted_text", "word_count")


def q_extract_chatgpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth extractor-routing oracle (ChatGPT / conversation base): the
    two-turn message template, sr-only author headers, role metadata, and
    message-count description are asserted byte-identically."""
    from defuddle_spark.spark.pages import synthesize_chatgpt_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_chatgpt_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    return out.select("url", "title", "site", "domain", "description",
                      "extractor_type", "content", "extracted_text", "word_count")


def _q_conv(synth_name: str):
    """Conversation-extractor query factory (Claude/Grok/Gemini share the
    same asserted column set)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        import defuddle_spark.spark.pages as pages_mod
        from defuddle_spark.spark.pipeline import extract_pages
        pages = getattr(pages_mod, synth_name)(spark, sf_dir)
        out = extract_pages(pages.select("url", "html"), with_routing_column=False)
        return out.select("url", "title", "site", "domain", "description",
                          "extractor_type", "content", "extracted_text",
                          "word_count")
    return q


q_extract_claude = _q_conv("synthesize_claude_pages")
q_extract_grok = _q_conv("synthesize_grok_pages")
q_extract_gemini = _q_conv("synthesize_gemini_pages")


def q_extract_twitter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twitter/X extractor oracle: tweet-thread assembly, @handle author,
    ISO date from the <time> element, 140-char description."""
    from defuddle_spark.spark.pages import synthesize_twitter_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_twitter_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    return out.select("url", "title", "author", "site", "domain",
                      "description", "extractor_type", "content",
                      "extracted_text", "word_count")


# ---------------------------------------------------------------------------
# Multi-domain routed extraction gate (round 6, VERDICT r5 #1): the nine
# single-extractor gates above are folded into ONE query so every
# oracle-backed entry fits the driver's correctness window. Each document
# becomes one page whose domain is picked by doc_id % 9; the native rlike
# routing column AND the kernel's registry dispatch both run, and the
# oracle re-asserts, per archetype, exactly the column set its retired
# single gate asserted (columns outside that set are masked to NULL on
# BOTH sides, so no assertion got weaker — see tests/test_retired_gates.py
# for the retired gates still running full-corpus at sf0.001).
# ---------------------------------------------------------------------------

_ROUTED_SUPERSET = ("url", "title", "author", "site", "published", "domain",
                    "image", "description", "extractor_type", "content",
                    "extracted_text", "word_count")

_CONV_HAVE = frozenset({"url", "title", "site", "domain", "description",
                        "extractor_type", "content", "extracted_text",
                        "word_count"})
_ROUTED_HAVE = {
    "hackernews": frozenset({"url", "title", "author", "site", "published",
                             "domain", "extractor_type", "extracted_text",
                             "word_count"}),
    "github": frozenset({"url", "title", "site", "domain", "description",
                         "extractor_type", "extracted_text", "word_count"}),
    "youtube": frozenset(_ROUTED_SUPERSET),
    "reddit": _CONV_HAVE | {"author"},
    "chatgpt": _CONV_HAVE,
    "claude": _CONV_HAVE,
    "grok": _CONV_HAVE,
    "gemini": _CONV_HAVE,
    "twitter": _CONV_HAVE | {"author"},
}

# SQL reconstruction of each archetype's url (used to slice the retired
# full-corpus oracles down to the doc_id % 9 shard by equi-join).
_ROUTED_URL_SQL = {
    "hackernews": "'https://news.ycombinator.com/item?id=' || CAST(doc_id AS VARCHAR)",
    "github": "'https://github.com/acme/' || source || '/issues/' || CAST(doc_id AS VARCHAR)",
    "youtube": "'https://www.youtube.com/watch?v=vid' || CAST(doc_id AS VARCHAR)",
    "reddit": ("'https://www.reddit.com/r/' || source || '/comments/abc' || CAST(doc_id AS VARCHAR)"
               " || '/doc_' || CAST(doc_id AS VARCHAR) || '/'"),
    "chatgpt": "'https://chatgpt.com/share/abc-' || CAST(doc_id AS VARCHAR)",
    "claude": "'https://claude.ai/share/abc-' || CAST(doc_id AS VARCHAR)",
    "grok": "'https://grok.x.ai/share/abc-' || CAST(doc_id AS VARCHAR)",
    "gemini": "'https://gemini.google.com/share/abc' || CAST(doc_id AS VARCHAR)",
    "twitter": ("'https://x.com/user' || CAST(doc_id % 50 AS VARCHAR)"
                " || '/status/' || CAST(doc_id AS VARCHAR)"),
}


def q_extract_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All nine site extractors through ONE routed gate: the multi-domain
    corpus (doc_id % 9 picks the archetype) runs a single extraction whose
    per-url registry dispatch (registry.go:116-147) picks the right
    extractor, and the native rlike routing column (extractor_route) is
    asserted alongside. Columns an archetype's retired single gate did not
    assert are masked to NULL (matching the oracle), so each extractor's
    byte-identity contract is unchanged — just carried by one query."""
    from defuddle_spark.spark.pages import (ROUTED_ARCHETYPES,
                                            synthesize_routed_pages)
    from defuddle_spark.spark.pipeline import extract_pages

    pages = synthesize_routed_pages(spark, sf_dir)
    out = extract_pages(pages.select("url", "html"))
    names = [n for n, _ in ROUTED_ARCHETYPES]
    cols = []
    for c in _ROUTED_SUPERSET:
        allowed = [n for n in names if c in _ROUTED_HAVE[n]]
        if len(allowed) == len(names):
            cols.append(F.col(c))
        else:
            cols.append(F.when(F.col("extractor_type").isin(allowed),
                               F.col(c)).alias(c))
    cols.append(F.col("extractor_route"))
    return out.select(*cols)


def _routed_oracle() -> str:
    """UNION ALL of the nine retired extractor oracles, each sliced to its
    doc_id % 9 shard (by rebuilding the archetype's url expression) and
    projected onto the masked column superset + the routing name."""
    from defuddle_spark.spark.pages import ROUTED_ARCHETYPES

    ext = _extractor_oracles()
    branches = []
    for k, (name, _) in enumerate(ROUTED_ARCHETYPES):
        have = _ROUTED_HAVE[name]
        proj = ", ".join(
            f"b.{c}" if c in have else f"CAST(NULL AS VARCHAR) AS {c}"
            for c in _ROUTED_SUPERSET)
        branches.append(
            f"SELECT {proj}, '{name}' AS extractor_route\n"
            f"            FROM ({ext[name]}) b\n"
            f"            JOIN (SELECT {_ROUTED_URL_SQL[name]} AS url FROM documents\n"
            f"                  WHERE doc_id % 9 = {k}) f ON b.url = f.url")
    return "\nUNION ALL\n".join(branches)


def retired_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The nine single-extractor gates retired from queries() in round 6
    (driver-window budgeting). Still first-class API surface: the pytest
    suite runs every one against its oracle at sf0.001 full-corpus
    (tests/test_retired_gates.py), so their 500-doc byte-identity
    contracts remain enforced — just not through driver slots."""
    return {
        "extract_hackernews": q_extract_hackernews,
        "extract_github": q_extract_github,
        "extract_youtube": q_extract_youtube,
        "extract_reddit": q_extract_reddit,
        "extract_chatgpt": q_extract_chatgpt,
        "extract_claude": q_extract_claude,
        "extract_grok": q_extract_grok,
        "extract_gemini": q_extract_gemini,
        "extract_twitter": q_extract_twitter,
    }


def retired_oracle_sql() -> dict[str, str]:
    return {f"extract_{n}": sql for n, sql in _extractor_oracles().items()}


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.dedup import dedup_exact
    return dedup_exact(_docs_doubled(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs_doubled(spark, sf_dir), k=3, threshold=0.6)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER collapse (the step after pair generation):
    exact-duplicate triples (docs ∪ +10000 ∪ +20000 copies) produce
    3-cliques via threshold-1.0 n-gram Jaccard (equal shingle sets —
    fully deterministic), and label-propagation connected components
    must assign every member its clique minimum. The oracle recomputes
    components with a recursive transitive closure in DuckDB."""
    from defuddle_spark.ops.dedup import (duplicate_components,
                                          ngram_jaccard_pairs)
    d = _docs(spark, sf_dir).select("doc_id", "text")
    d3 = (d.unionByName(d.select((F.col("doc_id") + 10000).alias("doc_id"),
                                 "text"))
          .unionByName(d.select((F.col("doc_id") + 20000).alias("doc_id"),
                                "text")))
    pairs = ngram_jaccard_pairs(d3, threshold=1.0)
    return duplicate_components(pairs)


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean embedding (class prototypes) with DECIMAL component
    sums, so the centroid bits are layout-independent and hash-checkable
    (float-order means are not — the IVF lesson). Returned long-form
    (group, n_vectors, pos, m) via posexplode so the driver compares
    scalar cells; the array rebuild is exercised on the way."""
    from defuddle_spark.ops.similarity import embedding_centroids
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .withColumn("grp", (F.col("vec_id") % 4).cast("long")))
    out = embedding_centroids(emb, "grp")
    return out.select("grp", "n_vectors",
                      F.posexplode("centroid").alias("pos", "m")) \
              .select("grp", "n_vectors", F.col("pos").cast("int").alias("pos"), "m")


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (language rebalancing): the
    keep-decision is a pure md5 function of the id, so the exact split
    is engine-independent and DuckDB recomputes it row-for-row — the
    reproducibility property rand(seed)-based sampling lacks."""
    from defuddle_spark.ops.corpus import stratified_hash_sample
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return stratified_hash_sample(
        docs, {"en": 0.5, "de": 0.1, "fr": 0.25}, "lang",
        default_rate=0.05).select("doc_id", "lang")


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global frequency-ordered vocabulary (pre-tokenizer pipeline
    step): explode + partial-agg counts, TakeOrderedAndProject top-k,
    deterministic tie-break by token."""
    from defuddle_spark.ops.textstats import vocab_topk
    return vocab_topk(_docs(spark, sf_dir), k=50)


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style pipeline at the gate: exact-dedup the
    doubled corpus (planted +10000 copies collapse), then quality-gate —
    one lazy plan, zero Python. Oracled against the same composition in
    SQL."""
    from defuddle_spark.ops.corpus import filter_corpus
    return filter_corpus(_docs_doubled(spark, sf_dir),
                         min_quality=0.5, min_tokens=20)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup collapse over the tripled corpus: candidate
    pairs -> components -> anti-join the non-minimum members; the
    surviving set is oracled against the recursive-closure SQL (same
    CTE as dedup_clusters, inverted to the keep-set)."""
    from defuddle_spark.ops.dedup import (dedup_survivors,
                                          ngram_jaccard_pairs)
    d = _docs(spark, sf_dir).select("doc_id", "text")
    d3 = (d.unionByName(d.select((F.col("doc_id") + 10000).alias("doc_id"),
                                 "text"))
          .unionByName(d.select((F.col("doc_id") + 20000).alias("doc_id"),
                                "text")))
    pairs = ngram_jaccard_pairs(d3, threshold=1.0)
    return dedup_survivors(d3, pairs)


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup (CCNet-style boilerplate removal) with
    PLANTED repetition: every document gets the same cookie-banner
    paragraph prepended and a (doc_id % 7)-group footer appended, so the
    banner must survive only in the corpus-minimum document, each footer
    only in its group minimum, and the body paragraphs wherever their
    text first occurred. The oracle recomputes the keep rule — global
    (doc_id, idx) minimum per paragraph md5 — with a DuckDB window,
    which is fine at oracle scale; the Spark side uses the aggregate+
    join shape that survives a 10^9-occurrence boilerplate paragraph."""
    from defuddle_spark.ops.dedup import dedup_paragraphs
    d = _docs(spark, sf_dir).select("doc_id", "text")
    # coalesce BEFORE concat (Spark concat propagates NULL; the oracle
    # coalesces the same way)
    t = F.coalesce(F.col("text"), F.lit(""))
    planted = d.select(
        "doc_id",
        F.concat(F.lit("Cookie notice: this site uses cookies.\n\n"),
                 t, F.lit("\n\nShared footer "),
                 (F.col("doc_id") % 7).cast("string")).alias("text"))
    return dedup_paragraphs(planted)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.textstats import text_quality
    return text_quality(_docs(spark, sf_dir))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters over a corpus with PLANTED
    repetition: each document becomes text + a repeated-line copy + a
    paragraph break + its own 80-char prefix + a unique tail, so every
    signal (duplicate lines/paragraph fractions, top-n-gram character
    coverage) takes a nontrivial, deterministic value the oracle
    recomputes cell-for-cell with DuckDB list/window functions."""
    from defuddle_spark.ops.textstats import repetition_signals
    d = _docs(spark, sf_dir).select("doc_id", "text")
    # coalesce BEFORE concat (Spark concat propagates NULL through the
    # whole expression; the oracle coalesces the same way)
    t = F.coalesce(F.col("text"), F.lit(""))
    rep = d.select(
        "doc_id",
        F.concat(t, F.lit("\n"), t, F.lit("\n\n"),
                 F.substring(t, 1, 80), F.lit("\nunique "),
                 F.col("doc_id").cast("string")).alias("text"))
    return repetition_signals(rep)


def q_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style statistical quality scoring: per-document cross-entropy
    under the corpus's own unigram LM. The natural token distribution of
    the documents table is nontrivial on its own (no planting needed);
    the oracle recomputes the LM and the scores with the SAME per-token
    round-to-9-decimals fixed-point contract, so every cell matches
    bit-for-bit despite the logarithms."""
    from defuddle_spark.ops.textstats import unigram_cross_entropy
    return unigram_cross_entropy(_docs(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.textstats import fingerprint
    return fingerprint(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.textstats import lang_id
    return lang_id(_docs(spark, sf_dir))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.similarity import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb, [float(x) for x in query], k=10)


def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-serving exact top-k: three query vectors in ONE corpus pass
    through the distributed two-stage top-k (broadcast queries →
    per-shard partial top-k with map-side combine → tiny per-query
    merge; the shuffle carries <= shards*k rows per query, never the
    Q x N scored rows a window-rank would move)."""
    from defuddle_spark.ops.similarity import cosine_topk_batch
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id").isin([0, 7, 21]))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_embedding")))
    return cosine_topk_batch(emb, queries, k=10)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.dedup import minhash_lsh_candidates
    return (minhash_lsh_candidates(_docs_doubled(spark, sf_dir))
            .filter(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.dedup import simhash_near_pairs
    return simhash_near_pairs(_docs_doubled(spark, sf_dir), max_hamming=3)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.similarity import lsh_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return lsh_topk(emb, [float(x) for x in query], k=10)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (the second ANN family of the checklist)
    at its oracle-checkable configuration: nprobe == n_lists is exact
    search regardless of where Lloyd put the centroids — every vector
    lives in exactly one list — so the full IVF plumbing (train, assign,
    probe, exact re-rank) is hash-asserted against the brute-force SQL.
    The recall/nprobe trade-off and index partition pruning are pinned
    by tests/test_ops.py::test_ivf_*."""
    from defuddle_spark.ops.similarity import ivf_topk, ivf_train
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cents = ivf_train(emb, n_lists=8, iters=2)
    return ivf_topk(emb, cents, [float(x) for x in query], k=10, nprobe=8)


def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF through its MATERIALIZED index path end-to-end (the 100 TB
    shape): train, write the list_id-partitioned index, read it back,
    and query at nprobe < n_lists — the list filter is partition
    PRUNING at the scan (PartitionFilters IN-list, EXPLAIN.md), and no
    assignment math runs at query time. Deterministic self-match oracle:
    the query IS vector 0's embedding, so its own list is by definition
    the L2-closest centroid (probe #1) and vector 0 comes back at
    cos_sim exactly 1.0 (corpus max off-diagonal cosine ~0.51)."""
    from defuddle_spark.ops.similarity import (
        ivf_index, ivf_topk, ivf_train, write_ivf_index)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x)
             for x in emb.filter(F.col("vec_id") == 0).select("embedding")
             .head()[0]]
    cents = ivf_train(emb, n_lists=8, iters=1)
    path = _scratch_dir("defuddle_ivf_index", sf_dir)
    write_ivf_index(ivf_index(emb, cents), path)
    idx = spark.read.parquet(path)
    return ivf_topk(idx, cents, query, k=1, nprobe=2)


def _emb_doubled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ perturbed copy (element 0 shifted by +0.1, ids +10000):
    deterministic planted near-duplicates (cosine ~0.995 — the table's
    vectors are unit-norm) so the embedding near-dup checks collapse
    something real; the raw vectors' max pairwise cosine is ~0.51."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    pert = emb.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0].cast("double") + 0.1),
            F.transform(F.slice("embedding", 2, 10000),
                        lambda x: x.cast("double"))).alias("embedding"))
    return base.unionByName(pert)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (the dedup-by-embedding
    entry of the training-data checklist); ground-truth O(n^2) variant,
    fully oracle-checked."""
    from defuddle_spark.ops.similarity import cosine_neardup_pairs
    return cosine_neardup_pairs(_emb_doubled(spark, sf_dir), threshold=0.9)


def q_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact all-pairs near-dup (blocked matrix product via
    cogroup — no driver collect, no whole-corpus broadcast); output is
    bit-identical to the broadcast ground-truth variant, so it shares
    the embedding_neardup oracle."""
    from defuddle_spark.ops.similarity import cosine_neardup_pairs_blocked
    return cosine_neardup_pairs_blocked(_emb_doubled(spark, sf_dir),
                                        threshold=0.9, n_blocks=6)


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: signature-bucketed candidates, exact verify. Recall is
    probabilistic (rows-only check); the differential test pins
    lsh ⊆ exact on the planted pairs."""
    from defuddle_spark.ops.similarity import cosine_neardup_lsh
    return cosine_neardup_lsh(_emb_doubled(spark, sf_dir), dim=64,
                              threshold=0.9)


def q_minhash_lsh_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC recall oracle for MinHash-LSH: the doubled corpus's
    planted (i, i+10000) pairs have IDENTICAL texts, hence identical
    signatures, hence every band collides — recovery of all 500 pairs with
    est_jaccard exactly 1.0 is guaranteed, not probabilistic, so DuckDB can
    predict the full result. (The id-difference filter is exact: original
    ids are < 10000, so id_b - id_a = 10000 only holds for a doc and its
    own copy.)"""
    from defuddle_spark.ops.dedup import minhash_lsh_candidates
    cand = minhash_lsh_candidates(_docs_doubled(spark, sf_dir))
    return (cand
            .filter((F.col("id_b") - F.col("id_a") == 10000)
                    & (F.col("id_a") < 10000))
            .select("id_a", "id_b", "est_jaccard"))


def q_simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC recall oracle for SimHash blocking: identical texts
    produce identical 64-bit simhashes, so every planted pair shares all
    pigeonhole block keys and verifies at hamming = 0 — full recall of the
    500 planted pairs is SQL-predictable."""
    from defuddle_spark.ops.dedup import simhash_near_pairs
    pairs = simhash_near_pairs(_docs_doubled(spark, sf_dir), max_hamming=3)
    return pairs.filter((F.col("id_b") - F.col("id_a") == 10000)
                        & (F.col("id_a") < 10000))


def q_embedding_neardup_lsh_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC recall oracle for the embedding-LSH scale path: the
    planted copies here are EXACT duplicates (ids +20000, identical
    vectors), so their hyperplane signatures match bit-for-bit, the
    hamming-0 probe is guaranteed to emit the candidate, and the exact
    verify rounds to cos_sim = 1.0. (The perturbed-copy variant stays
    rows-only: its recall at 12 planes is genuinely probabilistic.)"""
    from defuddle_spark.ops.similarity import cosine_neardup_lsh
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    dup = base.select((F.col("vec_id") + 20000).alias("vec_id"), "embedding")
    pairs = cosine_neardup_lsh(base.unionByName(dup), dim=64, threshold=0.9)
    return pairs.filter((F.col("id_b") - F.col("id_a") == 20000)
                        & (F.col("id_a") < 20000))


def q_ann_lsh_selfmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC oracle for LSH ANN: querying with vector 0's own
    embedding must return vector 0 at cos_sim exactly 1.0 — its signature
    is hamming-0 from the query signature by construction, so the bucket
    probe is guaranteed to surface it (corpus max off-diagonal cosine is
    ~0.51, far below a tie)."""
    from defuddle_spark.ops.similarity import lsh_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return lsh_topk(emb, [float(x) for x in query], k=1)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.textstats import token_stats
    return token_stats(_docs(spark, sf_dir))


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.relational import tpch_q1
    return tpch_q1(spark, sf_dir)


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.relational import tpch_q3
    return tpch_q3(spark, sf_dir)


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.relational import tpch_q5
    return tpch_q5(spark, sf_dir)


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.events import windowed_counts
    return windowed_counts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from defuddle_spark.ops.events import sessionize
    return sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing view of the multimodal feature extractor.

    The library API (ops/multimodal.py) keeps byte_histogram as ARRAY<INT>;
    here it is comma-joined to a string and the float32 entropy is rounded
    after a double cast so the driver's canonicalizer (which sorts/hashes
    scalar cells) can compare it against the DuckDB oracle.
    """
    from defuddle_spark.ops.multimodal import extract_features, synthesize_media
    feats = extract_features(synthesize_media(spark, n=256))
    return feats.select(
        "media_id", "media_type", "n_bytes",
        F.round(F.col("byte_entropy").cast("double"), 4).alias("byte_entropy"),
        F.array_join("byte_histogram", ",").alias("byte_histogram"),
        "frame_count")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_semantic": q_extract_semantic,
        "extract_noimages": q_extract_noimages,
        "extract_metadata": q_extract_metadata,
        "extract_flatten": q_extract_flatten,
        "extract_lang_stats": q_extract_lang_stats,
        "extract_scored": q_extract_scored,
        "extract_table": q_extract_table,
        "extract_retry": q_extract_retry,
        "extract_giant": q_extract_giant,
        "extract_debug": q_extract_debug,
        "extract_markdown": q_extract_markdown,
        "extract_markdown_pipe": q_extract_markdown_pipe,
        "extract_stream": q_extract_stream,
        "dedup_stream": q_dedup_stream,
        "dedup_stream_watermark": q_dedup_stream_watermark,
        "minhash_lsh_stream": q_minhash_lsh_stream,
        # round 6: the nine single-extractor gates are folded into this one
        # multi-domain routed gate (driver-window budgeting, VERDICT r5 #1);
        # see retired_queries() + tests/test_retired_gates.py for the
        # full-corpus versions.
        "extract_routed": q_extract_routed,
        "extract_elements": q_extract_elements,
        # round 6: WARC archive ingestion round-trip (the corpus-scale
        # source). Registry budget since round 7: the first 50 entries
        # are ALL oracle-backed (exactly filling the driver's 50-slot
        # window); the four rows-only entries trail past it (weak checks
        # by design — each planted sibling stays oracle-backed; see
        # test_registry_budget_fits_driver_window).
        "warc_extract": q_warc_extract,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "dedup_survivors": q_dedup_survivors,
        "dedup_paragraphs": q_dedup_paragraphs,
        "corpus_filter": q_corpus_filter,
        "vocab_topk": q_vocab_topk,
        "corpus_sample": q_corpus_sample,
        "embedding_centroids": q_embedding_centroids,
        "text_quality": q_text_quality,
        "repetition_stats": q_repetition_stats,
        "lm_cross_entropy": q_lm_cross_entropy,
        "token_stats": q_token_stats,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_blocked": q_embedding_neardup_blocked,
        "fingerprint": q_fingerprint,
        "lang_id": q_lang_id,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_batch_topk": q_ann_batch_topk,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "events_windowed": q_events_windowed,
        "events_sessions": q_events_sessions,
        "multimodal_features": q_multimodal_features,
        # deterministic planted-pair recall gates for the probabilistic ops
        # (identical inputs => identical signatures => guaranteed recovery):
        "minhash_lsh_planted": q_minhash_lsh_planted,
        "simhash_planted": q_simhash_planted,
        "embedding_neardup_lsh_planted": q_embedding_neardup_lsh_planted,
        "ann_lsh_selfmatch": q_ann_lsh_selfmatch,
        "ann_ivf_indexed": q_ann_ivf_indexed,
        "ann_ivf_topk": q_ann_ivf_topk,
        # rows-only (full candidate sets: probabilistic / hash-seeded, not
        # ANSI-SQL-expressible — the *_planted variants above oracle their
        # guaranteed subsets). These trail every oracle-backed entry so a
        # driver-window truncation can only ever drop weak checks:
        "minhash_lsh": q_minhash_lsh,
        "simhash_pairs": q_simhash_pairs,
        "ann_lsh_topk": q_ann_lsh_topk,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# ---------------------------------------------------------------------------

def _sql_str(s: str) -> str:
    """Python string -> SQL single-quoted literal (real control chars ok)."""
    return "'" + s.replace("'", "''") + "'"


def _conv_oracle(url_sql: str, bot_class: str, bot_name: str,
                 user_role: str, domain: str, extractor: str) -> str:
    """Byte-identity oracle for a two-turn conversation-base extractor.

    The conversation template (tests pin the same bytes kernel-side) is
    spliced around 'Explain Doc N.' and the document text; word count uses
    an empty-filtering split because DuckDB trim() strips spaces only.
    """
    p1 = (f'<div class="message message-you" data-role="{user_role}">\n\t\t\t\t'
          '<div class="message-header">\n\t\t\t\t\t'
          '<p class="message-author"><strong>You</strong></p>\n\t\t\t\t\t\n\t\t\t\t'
          '</div>\n\t\t\t\t<div class="message-content">\n\t\t\t\t\t<p>')
    p2 = ('</p>\n\t\t\t\t</div>\n\t\t\t</div>\n<hr>\n\t\t\t'
          f'<div class="message message-{bot_class}" data-role="assistant">\n\t\t\t\t'
          '<div class="message-header">\n\t\t\t\t\t'
          f'<p class="message-author"><strong>{bot_name}</strong></p>\n\t\t\t\t\t\n\t\t\t\t'
          '</div>\n\t\t\t\t<div class="message-content">\n\t\t\t\t\t<p>')
    p3 = '</p>\n\t\t\t\t</div>\n\t\t\t</div>'
    t1 = '\n\t\t\t\t\n\t\t\t\t\tYou\n\t\t\t\t\t\n\t\t\t\t\n\t\t\t\t\n\t\t\t\t\t'
    t2 = ('\n\t\t\t\t\n\t\t\t\n\n\t\t\t\n\t\t\t\t\n\t\t\t\t\t'
          f'{bot_name}\n\t\t\t\t\t\n\t\t\t\t\n\t\t\t\t\n\t\t\t\t\t')
    t3 = '\n\t\t\t\t\n\t\t\t'
    return f"""
        WITH cv AS (
            SELECT *, 'Explain Doc ' || CAST(doc_id AS VARCHAR) || '.' AS user_msg
            FROM documents
        ), asm AS (
            SELECT *, {_sql_str(t1)} || user_msg || {_sql_str(t2)} || text
                       || {_sql_str(t3)} AS etext
            FROM cv
        )
        SELECT {url_sql} AS url,
               'Doc ' || CAST(doc_id AS VARCHAR) AS title,
               '{bot_name}' AS site,
               '{domain}' AS domain,
               '{bot_name} conversation with 2 messages' AS description,
               '{extractor}' AS extractor_type,
               {_sql_str(p1)} || user_msg || {_sql_str(p2)} || text
                   || {_sql_str(p3)} AS content,
               etext AS extracted_text,
               CAST(len(list_filter(regexp_split_to_array(etext, '\\s+'),
                    x -> x <> '')) AS INTEGER) AS word_count
        FROM asm
    """

_NEARDUP_EXACT_SQL = """
    WITH e2 AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        UNION ALL
        SELECT vec_id + 10000,
               list_concat([embedding[1]::DOUBLE + 0.1],
                           (embedding[2:])::DOUBLE[])
        FROM embeddings
    ), n AS (
        SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nn FROM e2
    )
    SELECT id_a, id_b, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.emb, b.emb) / (a.nn * b.nn), 4) AS cos_sim
        FROM n a JOIN n b ON a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.9
"""


def _all_oracles() -> dict[str, str]:
    """Every oracle, INCLUDING the nine retired single-extractor entries
    (oracle_sql() filters those out and carries extract_routed instead;
    retired_oracle_sql()/tests still exercise them whole)."""
    from defuddle_spark.spark.pages import (RETRY_BYLINE as _RETRY_BYLINE,
                                            RETRY_FILLER as _RETRY_FILLER)
    stop = ",".join(f"'{w}'" for w in [
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
        "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
        "from", "have", "has", "not", "but", "they", "you", "his", "her"])
    return {
        "extract_semantic": f"""
            SELECT {_URL} AS url, {_TITLE} AS title,
                   '<p>' || text || '</p><img src="/media/' || CAST(doc_id AS VARCHAR)
                       || '.png" alt="Figure ' || CAST(doc_id AS VARCHAR)
                       || '" width="640" height="480"/>' AS content,
                   text AS extracted_text, {_WC} AS word_count
            FROM documents WHERE doc_id % 3 = 0
        """,
        "warc_extract": f"""
            -- identical to extract_semantic (WARC framing + transport
            -- decode must be byte-transparent) plus the HTTP status the
            -- reader parses out of each response record
            SELECT {_URL} AS url, {_TITLE} AS title,
                   '<p>' || text || '</p><img src="/media/' || CAST(doc_id AS VARCHAR)
                       || '.png" alt="Figure ' || CAST(doc_id AS VARCHAR)
                       || '" width="640" height="480"/>' AS content,
                   text AS extracted_text, {_WC} AS word_count,
                   CAST(200 AS INTEGER) AS http_status
            FROM documents WHERE doc_id % 3 = 0
        """,
        "extract_noimages": f"""
            SELECT {_URL} AS url,
                   '<p>' || text || '</p>' AS content,
                   {_WC} AS word_count
            FROM documents WHERE doc_id % 3 = 0
        """,
        "extract_metadata": f"""
            SELECT {_URL} AS url, {_TITLE} AS title,
                   'Synthetic Author' AS author,
                   'Example Docs' AS site,
                   'Synthetic description of Doc ' || CAST(doc_id AS VARCHAR) || '.' AS description,
                   '2024-01-15T00:00:00Z' AS published,
                   'docs.example.test' AS domain,
                   'https://img.example.test/' || CAST(doc_id AS VARCHAR) || '.png' AS image,
                   'https://docs.example.test/favicon-32.png' AS favicon
            FROM documents WHERE doc_id % 3 = 1
        """,
        "extract_flatten": f"""
            SELECT {_URL} AS url,
                   '<p>' || text || '</p>' AS content,
                   text AS extracted_text, {_WC} AS word_count
            FROM documents WHERE doc_id % 3 = 2
        """,
        "extract_lang_stats": f"""
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(len({_TOKENS})) AS BIGINT) AS sum_words,
                   round(avg(len({_TOKENS})), 4) AS avg_words
            FROM documents GROUP BY lang
        """,
        "extract_scored": f"""
            SELECT 'https://scored.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title, text AS extracted_text, {_WC} AS word_count
            FROM documents WHERE len({_TOKENS}) >= 41
        """,
        "extract_table": f"""
            SELECT 'https://tabular.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title, text AS extracted_text, {_WC} AS word_count
            FROM documents WHERE len({_TOKENS}) >= 35
        """,
        "extract_retry": f"""
            -- the retry threshold itself is part of the oracle: docs whose
            -- first-pass word count (text + filler for doc_id%4=0) is < 200
            -- keep the partial-selector byline via the retry; docs at or
            -- above 200 keep the first-pass result (byline removed)
            WITH base AS (
                SELECT *,
                       CASE WHEN doc_id % 4 = 0
                            THEN text || '{_RETRY_FILLER}' ELSE text END AS body_text
                FROM documents
            ), pass1 AS (
                SELECT *, len(regexp_split_to_array(trim(body_text), '\\s+')) AS wc0
                FROM base
            )
            SELECT 'https://short.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title,
                   CASE WHEN wc0 < 200
                        THEN body_text || '{_RETRY_BYLINE}' ELSE body_text END AS extracted_text,
                   CASE WHEN wc0 < 200
                        THEN CAST(len(regexp_split_to_array(trim(body_text || '{_RETRY_BYLINE}'), '\\s+')) AS INTEGER)
                        ELSE CAST(wc0 AS INTEGER) END AS word_count,
                   wc0 < 200 AS retry_used
            FROM pass1
        """,
        "extract_giant": f"""
            -- giants (doc_id % 50 = 0) carry text repeated 2000x,
            -- single-space-joined; word_count scales linearly
            WITH g AS (
                SELECT *,
                       CASE WHEN doc_id % 50 = 0
                            THEN repeat(text || ' ', 1999) || text
                            ELSE text END AS etext,
                       CASE WHEN doc_id % 50 = 0 THEN 2000 ELSE 1 END AS reps
                FROM documents
            )
            SELECT 'https://giant.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title,
                   etext AS extracted_text,
                   CAST(reps * len({_TOKENS}) AS INTEGER) AS word_count
            FROM g
        """,
        "extract_debug": f"""
            -- fixed-layout corpus: every debug statistic is a constant.
            -- orig == final == 6 replicates the reference quirk of
            -- recounting "original" from the mutated workingDoc
            -- (defuddle.go:502,605); the layout's nav/aside/footer are
            -- removed, leaving html,head,meta,title,body... 6 elements.
            SELECT 'https://giant.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   CAST(len({_TOKENS}) AS INTEGER) AS word_count,
                   6 AS orig_elements,
                   6 AS final_elements,
                   0 AS removed_elements,
                   CAST(len({_TOKENS}) AS INTEGER) AS debug_word_count,
                   0 AS image_count,
                   0 AS link_count,
                   '["schema_org_extraction","standard_parsing"]' AS steps,
                   CAST(NULL AS VARCHAR) AS extractor_used
            FROM documents
        """,
        "extract_stream": f"""
            -- identical to the batch extract_semantic content oracle:
            -- the streaming sink must hold byte-identical results
            SELECT {_URL} AS url,
                   '<p>' || text || '</p><img src="/media/' || CAST(doc_id AS VARCHAR)
                       || '.png" alt="Figure ' || CAST(doc_id AS VARCHAR)
                       || '" width="640" height="480"/>' AS content,
                   {_WC} AS word_count
            FROM documents WHERE doc_id % 3 = 0
        """,
        "minhash_lsh_stream": """
            SELECT doc_id AS id_a, doc_id + 10000 AS id_b
            FROM documents WHERE doc_id < 100
        """,
        "dedup_stream": f"""
            SELECT md5(text) AS text_md5,
                   CAST(min(doc_id) AS BIGINT) AS doc_id
            FROM {_DOCS_DOUBLED_SQL}
            GROUP BY md5(text)
        """,
        "dedup_stream_watermark": """
            -- all three batch slices emit: originals (first sight),
            -- wm-advance docs (new hashes), then the +10000 exact dupes
            -- RE-emit because the watermark evicted their hashes first.
            -- Each slice groups by hash (min doc_id): the operator emits
            -- ONE row per hash per slice, and real corpora carry a few
            -- colliding texts (sf0.1 has 4992 distinct over 5000 docs)
            SELECT md5(text) AS text_md5,
                   CAST(min(doc_id) AS BIGINT) AS doc_id
            FROM documents GROUP BY md5(text)
            UNION ALL
            SELECT md5(text || ' wm-advance') AS text_md5,
                   CAST(min(doc_id) + 30000 AS BIGINT) AS doc_id
            FROM documents GROUP BY md5(text || ' wm-advance')
            UNION ALL
            SELECT md5(text) AS text_md5,
                   CAST(min(doc_id) + 10000 AS BIGINT) AS doc_id
            FROM documents GROUP BY md5(text)
        """,
        "extract_markdown": f"""
            -- K1: expected content_markdown per construct family
            -- (doc_id % 10), byte-identical to the converter's output on
            -- the standardized content. word_count adds the per-family
            -- fixed construct-word overhead (block texts concatenate
            -- without separators, so boundary words merge — a structural
            -- constant per family). Family 8 pins the reference default's
            -- table CELL-FLATTENING (no table plugin registered,
            -- convert.go:13-23); family 9 pins the smart-escaping bytes.
            SELECT 'https://md.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   CASE doc_id % 10
                     WHEN 0 THEN '## Section ' || {_DID} || {_NN} || text
                         || {_sql_str(chr(10) * 2 + "### Detail ")} || {_DID}
                         || {_sql_str(chr(10) * 2 + "closing words here")}
                     WHEN 1 THEN {_sql_str("plain *soft* and **hard** and ***both*** words" + chr(10) * 2)} || text
                     WHEN 2 THEN '- alpha' || {_sql_str(chr(10) + "- beta ")} || {_DID}
                         || {_sql_str(chr(10) + "- gamma" + chr(10) * 2)} || text
                     WHEN 3 THEN '1. first' || {_sql_str(chr(10) + "2. second ")} || {_DID}
                         || {_NN} || text
                     WHEN 4 THEN 'see [the doc](https://example.test/p/' || {_DID}
                         || ' "Doc ' || {_DID} || '") here' || {_NN} || text
                     WHEN 5 THEN 'inline `x = ' || {_DID} || '` call' || {_NN}
                         || {_sql_str("```python" + chr(10) + "print(")} || {_DID}
                         || {_sql_str(")" + chr(10) + "```" + chr(10) * 2)} || text
                     WHEN 6 THEN '> quoted ' || {_DID} || ' words' || {_NN} || text
                     WHEN 7 THEN 'before ' || {_DID}
                         || {_sql_str(_MD7_MID)}
                         || {_DID} || '](https://img.example.test/' || {_DID}
                         || '.png)' || {_NN} || text
                     WHEN 8 THEN 'Name' || {_NN} || 'Count' || {_NN} || 'alpha '
                         || {_DID} || {_sql_str(_MD8_TAIL)} || text
                     ELSE {_sql_str(_MD9_HEAD)}
                         || {_DID} || {_sql_str(_MD9_TAIL)} || text
                   END AS content_markdown,
                   CAST(len({_TOKENS}) + CASE doc_id % 10
                     WHEN 0 THEN 4 WHEN 1 THEN 6 WHEN 2 THEN 1 WHEN 3 THEN 1
                     WHEN 4 THEN 3 WHEN 5 THEN 4 WHEN 6 THEN 2 WHEN 7 THEN 4
                     WHEN 8 THEN 1 ELSE 24
                   END AS INTEGER) AS word_count
            FROM documents
        """,
        "extract_markdown_pipe": f"""
            -- family-8 table docs with the GFM table plugin ON: pipe-table
            -- bytes; word_count is mode-independent (computed from
            -- extracted_text, same +1 structural constant as family 8)
            SELECT 'https://md.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   {_sql_str(_MDP_HEAD)} || {_DID} || {_sql_str(_MDP_TAIL)}
                       || text AS content_markdown,
                   CAST(len({_TOKENS}) + 1 AS INTEGER) AS word_count
            FROM documents WHERE doc_id % 10 = 8
        """,
        "extract_hackernews": f"""
            SELECT 'https://news.ycombinator.com/item?id=' || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title,
                   'user' || CAST(doc_id % 50 AS VARCHAR) AS author,
                   'Hacker News' AS site,
                   '2024-02-0' || CAST(doc_id % 9 + 1 AS VARCHAR) AS published,
                   'news.ycombinator.com' AS domain,
                   'hackernews' AS extractor_type,
                   'https://articles.example.test/' || source || '/' || CAST(doc_id AS VARCHAR) || text AS extracted_text,
                   {_WC} AS word_count
            FROM documents
        """,
        "extract_elements": f"""
            WITH el AS (
                SELECT *,
                       'Section Doc ' || CAST(doc_id AS VARCHAR) || text
                           || 'first itemsecond itemfmt.Println("hi")'
                           || 'Claim 1 stands.x=2the sourceA chart caption' AS etext
                FROM documents
            )
            SELECT 'https://elements.example.test/' || lang || '/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title,
                   '<h2>Section Doc ' || CAST(doc_id AS VARCHAR) || '</h2><p>' || text
                       || '</p><ol><li>first item</li><li>second item</li></ol>'
                       || '<pre><code data-lang="go" class="language-go">fmt.Println(&#34;hi&#34;)</code></pre>'
                       || '<p>Claim <sup id="fnref:1"><sup>1</sup></sup> stands.</p>'
                       || '<math xmlns="http://www.w3.org/1998/Math/MathML" display="inline"><mi>x</mi><mo>=</mo><mn>2</mn></math>'
                       || '<div><ol><li id="fn:1" role="doc-endnote" aria-label="Footnote 2"><p>the source</p></li></ol></div>'
                       || '<figure><img src="/img/chart.png" alt="A chart caption"/><figcaption>A chart caption</figcaption></figure>' AS content,
                   etext AS extracted_text,
                   CAST(len(regexp_split_to_array(trim(etext), '\\s+')) AS INTEGER) AS word_count
            FROM el
        """,
        "extract_github": f"""
            WITH gh AS (
                SELECT *,
                       'user' || CAST(doc_id % 50 AS VARCHAR)
                           || ' opened this issue on February '
                           || CAST(doc_id % 9 + 1 AS VARCHAR) || ', 2024' AS header
                FROM documents
            )
            SELECT 'https://github.com/acme/' || source || '/issues/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title,
                   'GitHub - acme/' || source AS site,
                   'github.com' AS domain,
                   regexp_replace(substr(header || chr(10) || chr(10) || text, 1, 140),
                                  '\\s+', ' ', 'g') AS description,
                   'github' AS extractor_type,
                   header || chr(10) || chr(10) || text || chr(10) || chr(10) AS extracted_text,
                   CAST(len(regexp_split_to_array(trim(header || ' ' || text), '\\s+')) AS INTEGER) AS word_count
            FROM gh
        """,
        "extract_youtube": f"""
            -- description: python t=desc[:200]; ls=t.rfind(' '); if ls>150: t=t[:ls]
            -- (0-based ls = 200-rp where rp = 1-based pos of last space from the right)
            WITH yt AS (
                SELECT *, strpos(reverse(substr(text, 1, 200)), ' ') AS rp
                FROM documents
            )
            SELECT 'https://www.youtube.com/watch?v=vid' || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title,
                   'Channel ' || CAST(doc_id % 50 AS VARCHAR) AS author,
                   'YouTube' AS site,
                   '2024-03-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || 'T08:00:00Z' AS published,
                   'youtube.com' AS domain,  -- metadata domain strips www.
                   'https://img.example.test/thumb' || CAST(doc_id AS VARCHAR) || '.jpg' AS image,
                   CASE WHEN length(text) > 200
                        THEN trim(CASE WHEN rp > 0 AND rp < 50
                                       THEN substr(text, 1, 200 - rp)
                                       ELSE substr(text, 1, 200) END)
                        ELSE trim(text) END AS description,
                   'youtube' AS extractor_type,
                   '<iframe width="560" height="315" src="https://www.youtube.com/embed/vid' || CAST(doc_id AS VARCHAR) || '" title="YouTube video player" frameborder="0" allow="accelerometer; autoplay; clipboard-write; encrypted-media; gyroscope; picture-in-picture; web-share" referrerpolicy="strict-origin-when-cross-origin" allowfullscreen></iframe><br><p>' || text || '</p>' AS content,
                   text AS extracted_text,
                   {_WC} AS word_count
            FROM yt
        """,
        "extract_reddit": f"""
            WITH rd AS (
                SELECT *,
                       'commenter' || CAST(doc_id % 20 AS VARCHAR) AS commenter,
                       CAST(doc_id % 100 AS VARCHAR) AS score,
                       '/r/' || source || '/comments/abc' || CAST(doc_id AS VARCHAR) || '/c1/' AS permalink
                FROM documents
            )
            SELECT 'https://www.reddit.com/r/' || source || '/comments/abc'
                       || CAST(doc_id AS VARCHAR) || '/doc_' || CAST(doc_id AS VARCHAR) || '/' AS url,
                   {_TITLE} AS title,
                   'redditor' || CAST(doc_id % 50 AS VARCHAR) AS author,
                   'r/' || source AS site,
                   'reddit.com' AS domain,
                   substr(trim(text), 1, 140) AS description,
                   'reddit' AS extractor_type,
                   '<div class="reddit-post"><div class="post-content"><p>' || text
                       || '</p></div></div><hr><h2>Comments</h2><div class="reddit-comments">'
                       || '<blockquote><div class="comment"><div class="comment-metadata">'
                       || '<span class="comment-author"><strong>' || commenter
                       || '</strong></span> • <a href="https://reddit.com' || permalink
                       || '" class="comment-link">' || score
                       || ' points</a> • <span class="comment-date"></span></div>'
                       || '<div class="comment-content"><p>Nice analysis.</p></div></div></blockquote></div>' AS content,
                   text || 'Commentscommenter' || CAST(doc_id % 20 AS VARCHAR)
                       || ' • ' || score || ' points • Nice analysis.' AS extracted_text,
                   CAST(len(regexp_split_to_array(trim(text || 'Commentscommenter' || CAST(doc_id % 20 AS VARCHAR)
                       || ' • ' || score || ' points • Nice analysis.'), '\\s+')) AS INTEGER) AS word_count
            FROM rd
        """,
        "extract_chatgpt": f"""
            WITH cg AS (
                SELECT *,
                       'Explain Doc ' || CAST(doc_id AS VARCHAR) || '.' AS user_msg
                FROM documents
            ), asm AS (
                SELECT *,
                       '
				
					You said
					
				
				
					' || user_msg || '
				
			

			
				
					ChatGPT said
					
				
				
					' || text || '
				
			' AS etext
                FROM cg
            )
            SELECT 'https://chatgpt.com/share/abc-' || CAST(doc_id AS VARCHAR) AS url,
                   {_TITLE} AS title,
                   'ChatGPT' AS site,
                   'chatgpt.com' AS domain,
                   'ChatGPT conversation with 2 messages' AS description,
                   'chatgpt' AS extractor_type,
                   '<div class="message message-you said" data-role="user">
				<div class="message-header">
					<p class="message-author"><strong>You said</strong></p>
					
				</div>
				<div class="message-content">
					<div class="text-message"><p>' || user_msg || '</p></div>
				</div>
			</div>
<hr>
			<div class="message message-chatgpt said" data-role="assistant">
				<div class="message-header">
					<p class="message-author"><strong>ChatGPT said</strong></p>
					
				</div>
				<div class="message-content">
					<div class="text-message"><p>' || text || '</p></div>
				</div>
			</div>' AS content,
                   etext AS extracted_text,
                   CAST(len(list_filter(regexp_split_to_array(etext, '\\s+'), x -> x <> '')) AS INTEGER) AS word_count
            FROM asm
        """,
        "extract_claude": _conv_oracle(
            "'https://claude.ai/share/abc-' || CAST(doc_id AS VARCHAR)",
            "claude", "Claude", "you", "claude.ai", "claude"),
        "extract_grok": _conv_oracle(
            "'https://grok.x.ai/share/abc-' || CAST(doc_id AS VARCHAR)",
            "grok", "Grok", "user", "grok.x.ai", "grok"),
        "extract_gemini": _conv_oracle(
            "'https://gemini.google.com/share/abc' || CAST(doc_id AS VARCHAR)",
            "gemini", "Gemini", "user", "gemini.google.com", "gemini"),
        "extract_twitter": f"""
            WITH tw AS (
                SELECT *,
                       CAST(doc_id % 50 AS VARCHAR) AS u,
                       CAST(doc_id % 9 + 1 AS VARCHAR) AS d
                FROM documents
            )
            SELECT 'https://x.com/user' || u || '/status/' || CAST(doc_id AS VARCHAR) AS url,
                   'Thread by @user' || u AS title,
                   '@user' || u AS author,
                   'X (Twitter)' AS site,
                   'x.com' AS domain,
                   substr(trim(text), 1, 140) AS description,
                   'twitter' AS extractor_type,
                   '<div class="tweet-thread"><div class="main-tweet"><div class="tweet">'
                       || '<div class="tweet-header"><span class="tweet-author"><strong>User ' || u
                       || '</strong> <span class="tweet-handle">@user' || u
                       || '</span></span> <a href="/user' || u || '/status/' || CAST(doc_id AS VARCHAR)
                       || '" class="tweet-date">2024-04-0' || d || '</a></div>'
                       || '<div class="tweet-text"><p>' || text || '</p></div></div></div></div>' AS content,
                   'User ' || u || ' @user' || u || ' 2024-04-0' || d || text AS extracted_text,
                   CAST(len(regexp_split_to_array(trim('User ' || u || ' @user' || u
                        || ' 2024-04-0' || d || text), '\\s+')) AS INTEGER) AS word_count
            FROM tw
        """,
        "dedup_exact": f"""
            SELECT min(doc_id) AS doc_id, CAST(count(*) AS INTEGER) AS dup_count
            FROM {_DOCS_DOUBLED_SQL} GROUP BY md5(text)
        """,
        "ngram_jaccard": f"""
            WITH docs2 AS (SELECT * FROM {_DOCS_DOUBLED_SQL}),
            sh AS (
                -- every doc in this corpus has >= 3 tokens (the Spark side
                -- carries a < k fallback branch; unreachable here)
                SELECT DISTINCT doc_id, sh FROM (
                    SELECT doc_id,
                           unnest([array_to_string(toks[i:i+2], ' ')
                                   for i in range(1, len(toks) - 1)]) AS sh
                    FROM (SELECT doc_id, {_TOKENS} AS toks FROM docs2)
                )
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                FROM sh a JOIN sh b USING (sh)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.6
        """,
        "dedup_clusters": f"""
            -- tripled corpus; threshold-1.0 jaccard pairs are exactly
            -- "equal distinct-shingle sets"; components via recursive
            -- transitive closure, labelled by their minimum id
            {_CLUSTERS_CTE}
            SELECT node AS doc_id, min(r) AS component
            FROM reach GROUP BY node
        """,
        "dedup_survivors": f"""
            -- the keep-set: component minima plus never-candidated docs
            {_CLUSTERS_CTE},
            comp AS (
                SELECT node, min(r) AS component FROM reach GROUP BY node
            )
            SELECT doc_id FROM docs3
            WHERE doc_id NOT IN (
                SELECT node FROM comp WHERE node <> component)
        """,
        "dedup_paragraphs": """
            -- corpus-wide paragraph dedup: keep rule = global (doc_id,
            -- idx) minimum per paragraph md5, reassembly in idx order.
            -- chr(10) literals keep the SQL newline-safe; trim() strips
            -- spaces only on BOTH engines, so hashes agree byte-for-byte
            WITH planted AS (
                SELECT doc_id,
                       'Cookie notice: this site uses cookies.'
                       || chr(10) || chr(10) || coalesce(text, '')
                       || chr(10) || chr(10) || 'Shared footer '
                       || CAST(doc_id % 7 AS VARCHAR) AS text
                FROM documents
            ),
            split AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               string_split(text, chr(10) || chr(10)),
                               x -> trim(x)),
                           x -> x <> '') AS ps
                FROM planted
            ),
            ex AS (
                -- parallel unnest zips value and 0-based index in lockstep
                SELECT doc_id,
                       unnest(range(len(ps))) AS idx,
                       unnest(ps) AS para
                FROM split
            ),
            kept AS (
                SELECT doc_id, idx, para FROM (
                    SELECT doc_id, idx, para,
                           row_number() OVER (PARTITION BY md5(para)
                                              ORDER BY doc_id, idx) AS rn
                    FROM ex)
                WHERE rn = 1
            )
            SELECT s.doc_id,
                   coalesce(k.text, '') AS text,
                   CAST(len(s.ps) AS INTEGER) AS n_paras,
                   CAST(coalesce(k.cnt, 0) AS INTEGER) AS n_paras_kept
            FROM split s
            LEFT JOIN (
                SELECT doc_id,
                       string_agg(para, chr(10) || chr(10)
                                  ORDER BY idx) AS text,
                       count(*) AS cnt
                FROM kept GROUP BY doc_id) k USING (doc_id)
        """,
        "lm_cross_entropy": f"""
            -- corpus unigram LM, then per-doc mean negative logprob.
            -- Per-token logprobs rounded to 9 decimals and accumulated
            -- as DECIMAL fixed-point on BOTH engines (exact, order-free);
            -- tf cast to DECIMAL(10,0) keeps the product inside DuckDB's
            -- 38-digit exact range (wider would silently become DOUBLE)
            WITH tok AS (
                -- empty pseudo-token from empty/ws-only text excluded:
                -- in the LM it would inflate N and shift every score
                SELECT doc_id, lower(unnest({_TOKENS})) AS token
                FROM documents
            ),
            tf AS (
                SELECT doc_id, token, count(*) AS tf
                FROM tok WHERE token <> '' GROUP BY doc_id, token
            ),
            cf AS (SELECT token, sum(tf) AS cf FROM tf GROUP BY token),
            tot AS (SELECT sum(cf) AS n FROM cf),
            lm AS (
                SELECT token,
                       CAST(round(ln(CAST(cf AS DOUBLE)
                                     / CAST(n AS DOUBLE)), 9)
                            AS DECIMAL(20,9)) AS lp
                FROM cf, tot
            ),
            doc AS (
                SELECT tf.doc_id,
                       sum(tf) AS n_tokens,
                       round(-CAST(sum(CAST(tf AS DECIMAL(10,0)) * lp)
                                   AS DOUBLE)
                             / CAST(sum(tf) AS DOUBLE), 6) AS ce
                FROM tf JOIN lm USING (token)
                GROUP BY tf.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(k.n_tokens, 0) AS BIGINT) AS n_tokens,
                   k.ce AS cross_entropy
            FROM documents d LEFT JOIN doc k USING (doc_id)
        """,
        "embedding_centroids": """
            -- parallel unnest advances value and index in lockstep;
            -- decimal sums make the mean layout-independent on both sides
            WITH ex AS (
                SELECT vec_id % 4 AS grp,
                       unnest(range(len(embedding))) AS pos,
                       unnest(embedding) AS v
                FROM embeddings
            ),
            comp AS (
                SELECT grp, pos,
                       sum(CAST(v AS DECIMAL(28,12))) AS s, count(*) AS n
                FROM ex GROUP BY grp, pos
            )
            SELECT grp, CAST(n AS BIGINT) AS n_vectors,
                   CAST(pos AS INTEGER) AS pos,
                   round(CAST(s / n AS DOUBLE), 6) AS m
            FROM comp
        """,
        "corpus_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 10000
                  < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 1000
                              WHEN 'fr' THEN 2500 ELSE 500 END
        """,
        "vocab_topk": f"""
            WITH tok AS (
                SELECT doc_id, lower(unnest({_TOKENS})) AS token
                FROM documents
            ),
            counts AS (
                SELECT token, count(*) AS n_occurrences,
                       count(DISTINCT doc_id) AS n_docs
                FROM tok GROUP BY token
            )
            SELECT CAST(row_number() OVER (
                       ORDER BY n_occurrences DESC, token) AS INTEGER) AS rank,
                   token, n_occurrences, n_docs
            FROM counts
            ORDER BY n_occurrences DESC, token
            LIMIT 50
        """,
        "corpus_filter": f"""
            WITH kept AS (
                SELECT min(doc_id) AS doc_id, text
                FROM {_DOCS_DOUBLED_SQL}
                GROUP BY md5(text), text
            )
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
                   round(least(len({_TOKENS})::DOUBLE / 100.0, 1.0) * 0.5
                         + least(len(list_filter({_TOKENS}, t -> list_contains([{stop}], lower(t))))::DOUBLE
                                 / greatest(len({_TOKENS}), 1) * 5.0, 1.0) * 0.3
                         + (1.0 - least((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                                        / greatest(length(text), 1) * 10.0, 1.0)) * 0.2, 6) AS quality_score
            FROM kept
            WHERE round(least(len({_TOKENS})::DOUBLE / 100.0, 1.0) * 0.5
                        + least(len(list_filter({_TOKENS}, t -> list_contains([{stop}], lower(t))))::DOUBLE
                                / greatest(len({_TOKENS}), 1) * 5.0, 1.0) * 0.3
                        + (1.0 - least((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                                       / greatest(length(text), 1) * 10.0, 1.0)) * 0.2, 6) >= 0.5
              AND len({_TOKENS}) >= 20
        """,
        "text_quality": f"""
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
                   CAST(length(text) AS INTEGER) AS n_chars,
                   round(list_sum(list_transform({_TOKENS}, t -> length(t)))::DOUBLE
                         / greatest(len({_TOKENS}), 1), 6) AS avg_token_len,
                   round(len(list_filter({_TOKENS}, t -> list_contains([{stop}], lower(t))))::DOUBLE
                         / greatest(len({_TOKENS}), 1), 6) AS stopword_ratio,
                   round((length(text) - length(regexp_replace(text, '[,.!?:;]', '', 'g')))::DOUBLE
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                         / greatest(length(text), 1), 6) AS digit_ratio,
                   round(least(len({_TOKENS})::DOUBLE / 100.0, 1.0) * 0.5
                         + least(len(list_filter({_TOKENS}, t -> list_contains([{stop}], lower(t))))::DOUBLE
                                 / greatest(len({_TOKENS}), 1) * 5.0, 1.0) * 0.3
                         + (1.0 - least((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                                        / greatest(length(text), 1) * 10.0, 1.0)) * 0.2, 6) AS quality_score
            FROM documents
        """,
        "repetition_stats": """
            -- Gopher repetition filters over the planted-repetition
            -- construction (text + repeated line + paragraph break +
            -- 80-char prefix + unique tail); same formulas as
            -- ops/textstats.repetition_signals, DuckDB list/window form
            WITH rep AS (
              -- coalesce mirrors the operator: NULL text means all-zero
              -- signals on both engines, never NULL-vs-0 hash drift
              SELECT doc_id,
                     coalesce(text, '') || chr(10) || coalesce(text, '')
                          || chr(10) || chr(10)
                          || substr(coalesce(text, ''), 1, 80)
                          || chr(10) || 'unique '
                          || CAST(doc_id AS VARCHAR) AS t
              FROM documents
            ),
            base AS (
              SELECT doc_id, t, length(t) AS chars,
                     list_filter(str_split(t, chr(10)),
                                 x -> length(trim(x)) > 0) AS lines,
                     list_filter(str_split(t, chr(10) || chr(10)),
                                 x -> length(trim(x)) > 0) AS paras,
                     regexp_split_to_array(trim(t), '\\s+') AS toks
              FROM rep
            ),
            grams AS (
              SELECT b.doc_id, ns.n,
                     unnest(list_transform(
                       generate_series(1, len(b.toks) - ns.n + 1),
                       i -> array_to_string(b.toks[i:i + ns.n - 1], ' ')
                     )) AS gram
              FROM base b
              CROSS JOIN (SELECT unnest([2, 3, 4]) AS n) ns
              WHERE len(b.toks) >= ns.n
            ),
            cnt AS (
              SELECT doc_id, n, gram, count(*) AS c
              FROM grams GROUP BY doc_id, n, gram
            ),
            ranked AS (
              SELECT doc_id, n, c * length(gram) AS cov,
                     row_number() OVER (
                       PARTITION BY doc_id, n
                       ORDER BY c DESC, c * length(gram) DESC, gram DESC
                     ) AS rn
              FROM cnt
            ),
            top AS (
              SELECT doc_id,
                     max(CASE WHEN n = 2 THEN cov END) AS cov2,
                     max(CASE WHEN n = 3 THEN cov END) AS cov3,
                     max(CASE WHEN n = 4 THEN cov END) AS cov4
              FROM ranked WHERE rn = 1 GROUP BY doc_id
            )
            SELECT b.doc_id,
                   CAST(len(b.lines) AS INTEGER) AS n_lines,
                   CAST(len(b.paras) AS INTEGER) AS n_paras,
                   round((len(b.lines) - len(list_distinct(b.lines)))::DOUBLE
                         / greatest(len(b.lines), 1), 6) AS dup_line_frac,
                   round((coalesce(list_sum(list_transform(b.lines, x -> length(x))), 0)
                          - coalesce(list_sum(list_transform(list_distinct(b.lines), x -> length(x))), 0))::DOUBLE
                         / greatest(coalesce(list_sum(list_transform(b.lines, x -> length(x))), 0), 1),
                         6) AS dup_line_char_frac,
                   round((len(b.paras) - len(list_distinct(b.paras)))::DOUBLE
                         / greatest(len(b.paras), 1), 6) AS dup_para_frac,
                   round((coalesce(list_sum(list_transform(b.paras, x -> length(x))), 0)
                          - coalesce(list_sum(list_transform(list_distinct(b.paras), x -> length(x))), 0))::DOUBLE
                         / greatest(coalesce(list_sum(list_transform(b.paras, x -> length(x))), 0), 1),
                         6) AS dup_para_char_frac,
                   round(least(1.0, coalesce(tp.cov2, 0)::DOUBLE
                               / greatest(b.chars, 1)), 6) AS top_2gram_char_frac,
                   round(least(1.0, coalesce(tp.cov3, 0)::DOUBLE
                               / greatest(b.chars, 1)), 6) AS top_3gram_char_frac,
                   round(least(1.0, coalesce(tp.cov4, 0)::DOUBLE
                               / greatest(b.chars, 1)), 6) AS top_4gram_char_frac
            FROM base b LEFT JOIN top tp USING (doc_id)
        """,
        "fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string({_TOKENS}, ' ')) AS fp_md5,
                   list_reduce(list_prepend(7::BIGINT,
                       list_transform({_TOKENS}, t -> length(t)::BIGINT)),
                       (a, b) -> (a * 31 + b) % 1000000007) AS fp_poly
            FROM documents
        """,
        "lang_id": f"""
            WITH scored AS (
                SELECT doc_id, text,
                       length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS n_cjk,
                       len(list_filter({_TOKENS}, t -> list_contains(['the','and','of','to','is','that','with','for'], lower(t)))) AS s_en,
                       len(list_filter({_TOKENS}, t -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], lower(t)))) AS s_de,
                       len(list_filter({_TOKENS}, t -> list_contains(['le','la','les','et','est','pas','une','des'], lower(t)))) AS s_fr,
                       len(list_filter({_TOKENS}, t -> list_contains(['el','la','los','las','es','una','que','por'], lower(t)))) AS s_es
                FROM documents
            )
            , fold1 AS (
                SELECT *, CASE WHEN s_de > s_en THEN 'de' ELSE 'en' END AS l1,
                       CASE WHEN s_de > s_en THEN s_de ELSE s_en END AS m1
                FROM scored
            ), fold2 AS (
                SELECT *, CASE WHEN s_fr > m1 THEN 'fr' ELSE l1 END AS l2,
                       CASE WHEN s_fr > m1 THEN s_fr ELSE m1 END AS m2
                FROM fold1
            )
            SELECT doc_id,
                   CASE WHEN n_cjk * 4 > length(text) THEN 'zh'
                        WHEN s_es > m2 THEN 'es'
                        ELSE l2 END AS pred_lang
            FROM fold2
        """,
        "token_stats": f"""
            SELECT doc_id,
                   {_WC.replace('word_count', 'n_ws_tokens')} AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, {_BPE_SQL})) AS INTEGER) AS n_bpe_tokens,
                   round(length(text)::DOUBLE
                         / greatest(len(regexp_extract_all(text, {_BPE_SQL})), 1), 6) AS chars_per_bpe_token
            FROM documents
        """,
        "embedding_neardup": _NEARDUP_EXACT_SQL,
        # the blocked distributed variant is bit-identical by construction
        # (same guard-prune + sequential-fold re-rank): same oracle
        "embedding_neardup_blocked": _NEARDUP_EXACT_SQL,
        "minhash_lsh_planted": """
            -- identical planted texts => identical 64-perm signatures =>
            -- every band collides => all 500 pairs recovered at exactly 1.0
            SELECT doc_id AS id_a, doc_id + 10000 AS id_b,
                   CAST(1.0 AS DOUBLE) AS est_jaccard
            FROM documents
        """,
        "simhash_planted": """
            SELECT doc_id AS id_a, doc_id + 10000 AS id_b,
                   CAST(0 AS INTEGER) AS hamming
            FROM documents
        """,
        "embedding_neardup_lsh_planted": """
            -- exact-duplicate vectors share hyperplane signatures bit-for-bit
            SELECT vec_id AS id_a, vec_id + 20000 AS id_b,
                   CAST(1.0 AS DOUBLE) AS cos_sim
            FROM embeddings
        """,
        "ann_lsh_selfmatch": """
            SELECT CAST(0 AS BIGINT) AS vec_id, CAST(1.0 AS DOUBLE) AS cos_sim
        """,
        "ann_ivf_indexed": """
            SELECT CAST(0 AS BIGINT) AS vec_id, CAST(1.0 AS DOUBLE) AS cos_sim
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity::DECIMAL(18,4))::DOUBLE AS sum_qty,
                   sum(l_extendedprice::DECIMAL(18,4))::DOUBLE AS sum_base_price,
                   sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(30,8))::DOUBLE AS sum_disc_price,
                   round(sum(l_quantity::DECIMAL(18,4))::DOUBLE / count(*), 6) AS avg_qty,
                   round(sum(l_discount::DECIMAL(18,4))::DOUBLE / count(*), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT l_orderkey,
                   sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(30,8))::DOUBLE AS revenue,
                   o_orderdate, o_orderpriority
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
              AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderdate, l_orderkey
            LIMIT 10
        """,
        "tpch_q5": """
            SELECT n_name,
                   sum((l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))::DECIMAL(30,8))::DOUBLE AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "events_windowed": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events,
                   round(avg(value), 6) AS avg_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH gaps AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                                 (PARTITION BY user_id ORDER BY ts, event_id)
                                 > 30 * 60 THEN 1 ELSE 0 END AS gap_break
                FROM events
            ), sessions AS (
                SELECT user_id,
                       sum(gap_break) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM gaps
            ), per_session AS (
                SELECT user_id, session_id, count(*) AS session_events
                FROM sessions GROUP BY 1, 2
            )
            SELECT user_id, CAST(count(*) AS INTEGER) AS n_sessions,
                   CAST(sum(session_events) AS BIGINT) AS n_events,
                   max(session_events) AS longest_session_events
            FROM per_session GROUP BY user_id
        """,
        "multimodal_features": """
            -- mirrors ops/multimodal.py synthesize_media + extract_features:
            -- payload = md5('media-'||i) digest repeated (64+(i%7)*32) times,
            -- sliced to 1024+(i%5)*512 bytes (python slicing truncates, so the
            -- real length is the MIN of the two); the byte length is a multiple
            -- of 16, so the high-nibble histogram is reps x the digest's own
            -- hex-digit counts at odd hex positions.
            WITH m AS (
                SELECT i AS media_id,
                       ['image','audio','video'][CAST(i % 3 AS INTEGER) + 1] AS media_type,
                       md5('media-' || CAST(i AS VARCHAR)) AS hx,
                       1024 + least(i % 5, i % 7) * 512 AS n_bytes
                FROM range(256) t(i)
            ), hist AS (
                SELECT *, list_transform(range(16), h ->
                           (n_bytes // 16) * len(list_filter(
                               list_transform(range(16), j -> substr(hx, CAST(2*j+1 AS INTEGER), 1)),
                               c -> c = substr('0123456789abcdef', CAST(h+1 AS INTEGER), 1)))) AS hist16
                FROM m
            )
            SELECT CAST(media_id AS BIGINT) AS media_id, media_type,
                   CAST(n_bytes AS INTEGER) AS n_bytes,
                   round(-list_sum(list_transform(list_filter(hist16, c -> c > 0),
                         c -> (c::DOUBLE / n_bytes) * log2(c::DOUBLE / n_bytes))), 4) AS byte_entropy,
                   array_to_string(hist16, ',') AS byte_histogram,
                   CAST(n_bytes // 256 AS INTEGER) AS frame_count
            FROM hist
        """,
        "ann_cosine_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cos_sim
            FROM embeddings
            ORDER BY cos_sim DESC, vec_id
            LIMIT 10
        """,
        "ann_batch_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                FROM embeddings WHERE vec_id IN (0, 7, 21)
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                    q.qe), 4) AS cos_sim
                FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS rnk
                FROM scored
            )
            SELECT query_id, CAST(rnk AS INTEGER) AS rank, vec_id, cos_sim
            FROM ranked WHERE rnk <= 10
        """,
        "ann_ivf_topk": """
            -- full-probe IVF is exact search: every vector is assigned
            -- to exactly one list and all lists are scanned
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cos_sim
            FROM embeddings
            ORDER BY cos_sim DESC, vec_id
            LIMIT 10
        """,
    }


def _extractor_oracles() -> dict[str, str]:
    """Full-corpus oracle SQL for the nine site extractors, keyed by
    extractor name. _routed_oracle() slices these to doc_id % 9 shards;
    tests/test_retired_gates.py runs them whole at sf0.001."""
    base = _all_oracles()
    return {n: base[f"extract_{n}"] for n in _ROUTED_HAVE}


def oracle_sql() -> dict[str, str]:
    out = {k: v for k, v in _all_oracles().items()
           if k.removeprefix("extract_") not in _ROUTED_HAVE}
    out["extract_routed"] = _routed_oracle()
    return out
