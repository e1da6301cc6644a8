"""Measure the two-tier giant-page split's straggler win.

Scenario (the 100 TB shape scaled down): a salted main wave sized for
throughput (salt_partitions ~= cores) over a corpus whose heavy tail is
~100x the median page — url-hash salting spreads giants *randomly*, so
some partition stacks several giants on top of a full share of normal
pages and straggles the wave. The two-tier path
(extract_pages(giant_threshold_bytes=...)) gives giants their own
maximally-scattered repartition instead.

Writes one JSON line to stdout and BENCH/giant_tier_r{N}.json:
{"single_tier_sec": ..., "two_tier_sec": ..., "speedup": ...}

Usage: python tools/giant_tier_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # ~20 MB giants (~0.4 s kernel each at the measured 20 ms/MB): the
    # regime where giant parse CPU dominates the wave, which is the 100 TB
    # shape (CC heavy tail is tens of MB). At 1 MB giants the whole job is
    # Spark overhead and neither tier strategy is distinguishable.
    giant_repeats = int(os.environ.get("SPARK_GRAFT_GIANT_REPEATS", "128000"))

    from pyspark.sql import functions as F
    from defuddle_spark.spark.pages import synthesize_giant_pages
    from defuddle_spark.spark.pipeline import extract_pages
    from defuddle_spark.spark.session import get_spark

    spark = get_spark(cores=cores, app_name="giant-tier-bench")
    spark.sparkContext.setLogLevel("ERROR")

    pages = synthesize_giant_pages(spark, sf_dir, repeats=giant_repeats).select(
        "url", "html").cache()
    n = pages.count()
    giants = pages.filter(F.length("html") > 100_000).count()

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(reps):
            t = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t)
        return round(best, 3)

    sink = lambda df: df.agg(F.sum("word_count")).collect()
    single = timed(lambda: sink(extract_pages(
        pages, with_routing_column=False, salt_partitions=cores)))
    two = timed(lambda: sink(extract_pages(
        pages, with_routing_column=False, salt_partitions=cores,
        giant_threshold_bytes=100_000)))

    out = {
        "metric": "giant_tier_straggler_win",
        "pages": n, "giants": giants, "cores": cores, "sf_dir": sf_dir,
        "single_tier_sec": single, "two_tier_sec": two,
        "speedup": round(single / two, 3),
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
