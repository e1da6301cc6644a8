"""Structured Streaming front-end for the extraction pipeline.

The reference is batch-only (no streaming constructs anywhere —
SURVEY.md §1.3), and the north_rule's resume story rides checkpointed
batch commits. This module is the Spark-native *extension* for
continuously-arriving crawl output: a file-source stream over the pages
table directory → the same Arrow-batch kernel → parquet sink with a
checkpoint. Because ``mapInPandas`` is stateless per-row work, the batch
and streaming plans share every operator; exactly-once lands on the sink
checkpoint instead of the manifest protocol.

At crawl scale the source would be Kafka/Kinesis of WARC pointers; the
file source keeps the sandbox self-contained.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType, TimestampType)

from .pipeline import extract_pages

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def extract_pages_stream(spark: SparkSession, input_dir: str, output_dir: str,
                         checkpoint_dir: str,
                         available_now: bool = True,
                         max_files_per_trigger: Optional[int] = None):
    """Start (or run-to-completion with availableNow) a streaming extraction.

    Returns the StreamingQuery. ``available_now=True`` drains everything
    currently in ``input_dir`` and stops — the test/bench mode; pass False
    for a continuously running job.
    """
    reader = (spark.readStream.schema(PAGES_SCHEMA))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.parquet(input_dir)

    result = extract_pages(pages.select("url", "html"), with_routing_column=True)

    writer = (result.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
