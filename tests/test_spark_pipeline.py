"""Spark integration: synthesis round-trip, manifests/resume, routing."""

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_synthesis_roundtrip_byte_identical(spark):
    """north_rule invariant: byte-identical extracted text per url."""
    from defuddle_spark.spark.pages import synthesize_pages
    from defuddle_spark.spark.pipeline import extract_pages

    pages = synthesize_pages(spark, SF)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    truth = pages.select("url", F.col("text").alias("expect"))
    j = out.join(truth, "url").cache()
    assert j.count() == 500
    assert j.filter(F.col("extracted_text") != F.col("expect")).count() == 0
    assert j.filter(F.col("error").isNotNull()).count() == 0
    j.unpersist()


def test_input_shape_is_authoritative(spark):
    from defuddle_spark.spark.pages import pages_only, synthesize_pages
    df = pages_only(synthesize_pages(spark, SF))
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    types = dict(df.dtypes)
    assert types == {"url": "string", "warc_ts": "timestamp",
                     "html": "binary", "text": "string", "lang": "string"}


def test_resume_after_partial_failure(spark, tmp_path):
    """Kill mid-job → rerun → no duplicate or missing urls (north_rule)."""
    from defuddle_spark.spark.manifest import committed_buckets, run_extraction_job
    from defuddle_spark.spark.pages import synthesize_pages

    pages = synthesize_pages(spark, SF).select("url", "html").cache()
    n_total = pages.count()
    out_dir = str(tmp_path / "out")
    man_dir = str(tmp_path / "manifest")

    m1 = run_extraction_job(spark, pages, out_dir, man_dir,
                            num_buckets=8, group_size=2, fail_after_groups=2)
    assert m1["groups_run"] == 2
    done_after_crash = committed_buckets(spark, man_dir)
    assert len(done_after_crash) == 4

    partial = spark.read.parquet(out_dir)
    n_partial = partial.count()
    assert 0 < n_partial < n_total

    m2 = run_extraction_job(spark, pages, out_dir, man_dir,
                            num_buckets=8, group_size=2)
    assert m2["buckets_done_before"] == 4

    final = spark.read.parquet(out_dir)
    assert final.count() == n_total
    assert final.select("url").distinct().count() == n_total  # no dupes
    # manifest carries lineage + metrics per bucket
    manifest = spark.read.json(man_dir)
    assert manifest.select("bucket").distinct().count() == 8
    assert manifest.agg(F.sum("doc_count")).head()[0] == n_total
    for col in ("doc_count", "error_count", "content_bytes", "wall_s",
                "kernel_version"):
        assert col in manifest.columns
    pages.unpersist()


def test_routing_column_native(spark):
    from defuddle_spark.spark.pipeline import extract_pages
    rows = [
        ("https://news.ycombinator.com/item?id=1",
         b"<html><body><table class='fatitem'><tr class='athing'><td><span class='titleline'><a href='http://x'>T</a></span></td></tr></table></body></html>"),
        ("https://example.com/post", b"<html><body><article><p>hello world</p></article></body></html>"),
    ]
    df = spark.createDataFrame(rows, ["url", "html"])
    out = extract_pages(df).select("url", "extractor_route", "extractor_type").collect()
    by_url = {r["url"]: r for r in out}
    hn = by_url["https://news.ycombinator.com/item?id=1"]
    assert hn["extractor_route"] == "hackernews"
    assert hn["extractor_type"] == "hackernews"
    other = by_url["https://example.com/post"]
    assert other["extractor_route"] is None
    assert other["extractor_type"] is None


def test_extraction_plan_prunes_columns(spark):
    """Column pruning must reach the scan: only url+html read, filter pushed."""
    from defuddle_spark.spark.pages import pages_only, synthesize_pages
    from defuddle_spark.spark.pipeline import extract_pages
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pages_only(synthesize_pages(spark, SF)).write.parquet(f"{d}/pages")
        pages = spark.read.parquet(f"{d}/pages")
        plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema" in plan
        # only the two needed columns reach the scan
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "url" in read_schema and "html" in read_schema
        assert "warc_ts" not in read_schema and "lang" not in read_schema


def test_size_tiered_giant_routing(spark):
    """Two-tier skew split produces identical per-url results (FIXTURES #16)."""
    from defuddle_spark.spark.pages import synthesize_pages
    from defuddle_spark.spark.pipeline import extract_pages

    pages = synthesize_pages(spark, SF).select("url", "html").limit(60)
    # make a few pages 'giant' by padding with a huge comment blob
    pages = pages.withColumn(
        "html",
        F.when(F.xxhash64("url") % 10 == 0,
               F.concat(F.col("html"),
                        F.encode(F.concat(F.lit("<!--"),
                                          F.repeat(F.lit("pad "), 20000),
                                          F.lit("-->")), "UTF-8")))
        .otherwise(F.col("html")))
    plain = {r["url"]: r["extracted_text"]
             for r in extract_pages(pages, with_routing_column=False).collect()}
    tiered = {r["url"]: r["extracted_text"]
              for r in extract_pages(pages, with_routing_column=False,
                                     giant_threshold_bytes=20000,
                                     salt_partitions=8).collect()}
    assert plain == tiered
    assert len(tiered) == 60


def test_selection_path_archetypes(spark):
    """The scoring (C4/C5), table (C3), and retry (C6) selection paths,
    end-to-end through the Spark pipeline — not just kernel unit tests.
    Mirrors the driver-gate oracles for extract_scored/table/retry."""
    from defuddle_spark.spark.pages import (
        RETRY_BYLINE, synthesize_retry_pages, synthesize_scored_pages,
        synthesize_table_pages)
    from defuddle_spark.spark.pipeline import extract_pages

    for synth in (synthesize_scored_pages, synthesize_table_pages):
        pages = synth(spark, SF)
        out = extract_pages(pages.select("url", "html"),
                            with_routing_column=False)
        j = out.join(pages.select("url", F.col("text").alias("expect")), "url")
        bad = j.filter((F.col("extracted_text") != F.col("expect"))
                       | F.col("error").isNotNull()).count()
        assert bad == 0, synth.__name__

    pages = synthesize_retry_pages(spark, SF)
    out = extract_pages(pages.select("url", "html"), with_routing_column=False)
    j = out.join(pages.select("url", "text", "doc_id"), "url").cache()
    # short docs (the data has none >= 200 tokens) retry and KEEP the byline
    short = j.filter(F.col("doc_id") % 4 != 0)
    assert short.filter(~F.col("retry_used")).count() == 0
    assert short.filter(F.col("extracted_text")
                        != F.concat("text", F.lit(RETRY_BYLINE))).count() == 0
    # filler docs cross the threshold: no retry, byline stays removed
    long_ = j.filter(F.col("doc_id") % 4 == 0)
    assert long_.count() > 0
    assert long_.filter(F.col("retry_used")).count() == 0
    assert long_.filter(F.col("extracted_text").contains(RETRY_BYLINE)).count() == 0
    assert long_.filter(F.col("word_count") < 200).count() == 0
    j.unpersist()


def test_giant_two_tier_byte_identity(spark):
    """The two-tier giant split (giant_threshold_bytes) must be a pure
    scheduling decision: per-url results byte-identical to the single-tier
    path on a corpus with planted ~1MB giants."""
    from defuddle_spark.spark.pages import synthesize_giant_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_giant_pages(spark, "/root/testdata/sf0.001").filter(
        "doc_id < 120").select("url", "html")
    cols = ["url", "title", "content", "extracted_text", "word_count",
            "retry_used", "error"]
    one = {r["url"]: r for r in extract_pages(
        pages, with_routing_column=False).select(*cols).collect()}
    two = {r["url"]: r for r in extract_pages(
        pages, with_routing_column=False,
        giant_threshold_bytes=100_000).select(*cols).collect()}
    assert set(one) == set(two) and len(one) == 120
    assert any(len(r["extracted_text"]) > 500_000 for r in one.values())
    for url, r in one.items():
        assert tuple(r) == tuple(two[url]), url


def test_pareto_pages_shape_and_determinism(spark):
    """synthesize_pareto_pages draws sizes from a capped Pareto law
    deterministically in the url: same corpus bit-for-bit across calls,
    multiplier within [1, max_mult], and a genuine heavy tail (the cap
    is reached, i.e. some page is max_mult x the base size) while the
    bulk stays small (median multiplier == 1 for alpha=1.5)."""
    from defuddle_spark.spark.pages import synthesize_pareto_pages
    kw = dict(n_pages=400, base_repeats=3)
    a = synthesize_pareto_pages(spark, "/root/testdata/sf0.001", **kw)
    stats = a.agg(
        F.count("*").alias("n"),
        F.min("size_mult").alias("lo"), F.max("size_mult").alias("hi"),
        F.expr("percentile(size_mult, 0.5)").alias("med"),
        F.countDistinct("url").alias("urls")).collect()[0]
    assert stats["n"] == 400 and stats["urls"] == 400
    assert stats["lo"] == 1 and stats["med"] == 1.0
    # deterministic draw at 400 pages tops out at 88x the base size —
    # a genuine ~100x-class tail (the 2000-page bench corpus hits the
    # 100x cap itself)
    assert stats["hi"] == 88
    b = synthesize_pareto_pages(spark, "/root/testdata/sf0.001", **kw)
    a_rows = {r["url"]: (bytes(r["html"]), r["size_mult"])
              for r in a.collect()}
    b_rows = {r["url"]: (bytes(r["html"]), r["size_mult"])
              for r in b.collect()}
    assert a_rows == b_rows


def test_result_sink_dispatch(spark, tmp_path):
    """write_results: parquet path round-trips (with partitioning);
    the iceberg path refuses eagerly with the catalog checklist when no
    Iceberg catalog is configured (this sandbox), and unknown formats
    are rejected."""
    import pytest

    from defuddle_spark.spark.sinks import write_results

    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "de")], ["doc_id", "text", "lang"])
    out = str(tmp_path / "sink")
    write_results(df, out, format="parquet", partition_by=["lang"])
    back = spark.read.parquet(out)
    assert {r["doc_id"] for r in back.collect()} == {1, 2}
    assert "lang=en" in " ".join(str(p) for p in (tmp_path / "sink").iterdir())

    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_results(df, "lake.db.results", format="iceberg")
    with pytest.raises(ValueError, match="unsupported sink format"):
        write_results(df, out, format="orc2")


def test_iceberg_writer_contract(spark, tmp_path, monkeypatch):
    """The sandbox ships no Iceberg runtime, so the writeTo branch can't
    execute — pin the exact DataFrameWriterV2 call sequence instead
    (VERDICT r5 #4): partitionedBy(col(...)) before the terminal call,
    append for mode=append, createOrReplace for mode=overwrite, so a
    catalog-bound deployment can't hit a wrong-method bug the sandbox
    never ran. Also pins the ADVICE r5 catalog resolution: a dotted
    prefix WITHOUT a binding falls back to the default catalog's binding
    instead of refusing."""
    from defuddle_spark.spark.sinks import write_results

    df = spark.createDataFrame([(1, "a", "en")], ["doc_id", "text", "lang"])
    calls: list = []

    class FakeWriterV2:
        def __init__(self, table):
            calls.append(("writeTo", table))

        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", tuple(str(c) for c in cols)))
            return self

        def append(self):
            calls.append(("append",))

        def createOrReplace(self):
            calls.append(("createOrReplace",))

    # patch the CONCRETE class (pyspark 4's pyspark.sql.DataFrame is an
    # abstract interface whose method the classic subclass overrides)
    monkeypatch.setattr(type(df), "writeTo",
                        lambda self, table: FakeWriterV2(table))
    # bind a catalog for the dotted prefix
    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    try:
        write_results(df, "lake.db.results", format="iceberg",
                      mode="append", partition_by=["lang"])
        assert calls == [("writeTo", "lake.db.results"),
                         ("partitionedBy", ("Column<'lang'>",)),
                         ("append",)]
        calls.clear()
        write_results(df, "lake.db.results", format="iceberg",
                      mode="overwrite")
        assert calls == [("writeTo", "lake.db.results"),
                         ("createOrReplace",)]
    finally:
        spark.conf.unset("spark.sql.catalog.lake")

    # ADVICE r5: 'db.results' where 'db' is a NAMESPACE (no catalog
    # binding) must resolve through the default catalog's binding
    calls.clear()
    spark.conf.set("spark.sql.catalog.spark_catalog",
                   "org.apache.iceberg.spark.SparkCatalog")
    try:
        write_results(df, "db.results", format="iceberg", mode="append")
        assert calls == [("writeTo", "db.results"), ("append",)]
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")

    # and with no binding anywhere the refusal still fires
    import pytest
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_results(df, "db.results", format="iceberg")
