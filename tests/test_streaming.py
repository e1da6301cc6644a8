"""Structured Streaming extraction: file source → kernel → parquet sink."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_extraction_drains_and_checkpoints(spark, tmp_path):
    from defuddle_spark.spark.pages import pages_only, synthesize_pages
    from defuddle_spark.spark.streaming import extract_pages_stream

    in_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = pages_only(synthesize_pages(spark, SF)).limit(120)
    pages.write.parquet(in_dir)

    q = extract_pages_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    assert out.count() == 120
    assert out.filter(F.col("error").isNotNull()).count() == 0
    assert "extracted_text" in out.columns

    # restart with no new data: checkpoint prevents reprocessing
    q2 = extract_pages_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 120
