"""The full training-data pipeline composed end-to-end over real
extracted pages: every corpus operator the suite ships, chained the way
a production pipeline would chain them. This is the 'a user could run
their whole pipeline here' proof — each op is unit/gate-tested on its
own; this test pins that they COMPOSE (schemas line up, audit columns
flow through, nothing collapses the corpus unexpectedly)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def extracted(spark):
    from defuddle_spark.spark.pages import synthesize_pages
    from defuddle_spark.spark.pipeline import extract_pages
    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    return (extract_pages(pages)
            .select(F.col("url").alias("doc_id"),
                    F.col("url"),
                    F.col("extracted_text").alias("text"))
            .localCheckpoint())


def test_full_pipeline_composition(spark, extracted):
    from defuddle_spark.ops.corpus import c4_line_filter, mix_sources
    from defuddle_spark.ops.dedup import (
        dedup_exact, dedup_paragraphs, dedup_substrings,
        normalize_for_dedup_col)
    from defuddle_spark.ops.decontam import decontaminate
    from defuddle_spark.ops.pii import redact_pii
    from defuddle_spark.ops.textstats import lang_id, text_quality
    from defuddle_spark.ops.urls import dedup_by_url

    n0 = extracted.count()
    assert n0 == 500

    # 1. URL-level collapse of re-crawl variants
    url_reps = dedup_by_url(extracted, url_col="url")
    docs = extracted.join(url_reps.select("doc_id"), "doc_id")

    # 2. page/line cleaning: audit-only on THIS corpus — the synthetic
    # text is punctuation-free word soup (COVERAGE.md documents it), so
    # the C4 page gate would empty the pipeline; assert the audit shape
    # instead of filtering
    audit = c4_line_filter(docs)
    assert audit.count() == docs.count()
    assert audit.filter("page_kept").count() == 0
    cleaned = docs.select("doc_id", "text")

    # 3. exact dedup on the CANONICALIZED text (lossless: ids only)
    reps = dedup_exact(
        cleaned.withColumn("text", normalize_for_dedup_col()))
    docs = cleaned.join(reps.select("doc_id"), "doc_id")

    # 4. paragraph- and span-level dedup
    docs = dedup_paragraphs(docs).select("doc_id", "text")
    docs = dedup_substrings(docs, n=30).select("doc_id", "text")

    # 5. PII scrub
    docs = redact_pii(docs).select("doc_id", "text")

    # 6. eval-set decontamination (plant one doc's opening as "eval")
    sample_text = docs.filter(F.length("text") > 200) \
        .orderBy("doc_id").select("text").head()[0]
    bench = spark.createDataFrame([(1, sample_text[:300])],
                                  ["bench_id", "text"])
    verdicts = decontaminate(docs, bench, n=13)
    contaminated = verdicts.filter("contaminated")
    assert contaminated.count() >= 1          # the planted source doc
    docs = docs.join(verdicts.filter(~F.col("contaminated"))
                     .select("doc_id"), "doc_id")

    # 7. quality + language gates
    q = text_quality(docs).filter("quality_score >= 0.3").select("doc_id")
    lang = lang_id(docs).select(
        "doc_id", F.col("pred_lang").alias("lang"))
    docs = docs.join(q, "doc_id").join(lang, "doc_id")

    # 8. deterministic mixture over the language strata present
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    weights = {l: 1.0 for l in langs}
    rates = {}
    final = mix_sources(docs, weights, "lang", rates_out=rates)

    n_final = final.count()
    assert 0 < n_final <= n0
    assert set(final.columns) == {"doc_id", "text", "lang"}
    # the mixture is deterministic: rerunning yields identical ids
    again = mix_sources(docs, weights, "lang")
    assert (final.select("doc_id").exceptAll(again.select("doc_id"))
            .count() == 0)
    # every stage kept text non-null
    assert final.filter(F.col("text").isNull()).count() == 0
