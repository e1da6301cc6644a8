"""SparkSession factory tuned for MB-scale HTML rows.

Scale rationale (100 TB / 1000-executor design; tested on local[N]):
- AQE on: runtime coalescing + skew splitting for the post-kernel stages.
- Arrow batches capped BOTH ways: 512 rows AND 32 MB (Spark 4's
  maxBytesPerBatch closes a batch when either limit hits). Rows alone
  is wrong twice over: tiny batches (64 rows) spend so much time in
  per-batch JVM<->Python overhead that 2->8-core scaling efficiency
  drops from 0.97 to 0.72 (measured, BENCH/BASELINE.md), while
  unbounded-byte batches of multi-MB CC pages would hold GBs per
  Python worker. The byte cap keeps heavy-tailed pages safe at any
  row cap.
- shuffle partitions default to 2x cores locally; on a real cluster this
  is overridden to ~2-3x total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


ROCKSDB_STATE_CONF = {
    # Per-executor-disk state instead of JVM-heap HDFSBackedStateStore:
    # a crawl-scale streaming dedup holds one row per distinct hash seen
    # inside the watermark — heap-resident state OOMs long before the
    # watermark does. Changelog checkpointing uploads per-batch deltas
    # instead of full RocksDB snapshots, which is the difference between
    # O(state) and O(batch) checkpoint traffic at 10^9 keys.
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
        "true",
}


def get_spark(cores: int | None = None,
              shuffle_partitions: int | None = None,
              app_name: str = "defuddle-spark",
              arrow_batch_rows: int = 512,
              arrow_batch_bytes: int = 32 * 1024 * 1024,
              rocksdb_state_store: bool = False,
              extra_conf: dict | None = None) -> SparkSession:
    """``rocksdb_state_store=True`` applies :data:`ROCKSDB_STATE_CONF`
    (the crawl-scale streaming-state setup every stateful dedup
    docstring points at) — kept as a named flag so the conf shape can't
    drift from the documentation; exercised for real in
    tests/test_streaming.py (Spark 4 bundles rocksdbjni)."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(arrow_batch_bytes))
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # In local mode the driver JVM hosts EVERY executor thread, so
        # its heap is the whole cluster's unified memory pool: 8g for 32
        # concurrent tasks plus a cached corpus measurably GC-throttled
        # the shuffle/state-heavy queries (full-bench A/B at sf0.1:
        # 106.7 s at 8g -> 91.9 s at 16g, the delta concentrated in
        # exactly those queries). 16g on the 128 GiB sandbox; still
        # env-overridable, and on a real cluster this conf sizes only
        # the driver — executors are sized by the submitter.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if rocksdb_state_store:
        for k, v in ROCKSDB_STATE_CONF.items():
            builder = builder.config(k, v)
    # last-wins overrides, e.g. spark.ui.enabled=true for tools that
    # read per-task metrics off the REST API (tools/heavy_tail_bench.py)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
