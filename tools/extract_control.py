"""Paired extract-throughput control: time the headline extraction on an
arbitrary code tree with bench.py's exact methodology (pinned cores,
full-width warmup, best-of-reps), so two code versions can be compared
back-to-back under the same box conditions. Round-4 use: BENCH_r04
trustworthiness — the round-3 headline moved 33% on load alone, so the
r4 artifact carries a same-session r3-code control run.

Usage: python tools/extract_control.py <code_dir> [sf_dir] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    code_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "32"))

    sys.path.insert(0, code_dir)
    os.chdir(code_dir)  # Spark python workers resolve the package via cwd
    if hasattr(os, "sched_setaffinity"):
        try:
            os.sched_setaffinity(0, set(range(cpus)))
        except OSError:
            pass

    from pyspark.sql import functions as F

    from defuddle_spark.spark.pages import synthesize_pages
    from defuddle_spark.spark.pipeline import extract_pages
    from defuddle_spark.spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="extract-control")
    spark.sparkContext.setLogLevel("ERROR")
    pages = synthesize_pages(spark, sf_dir, replicate=replicate)
    pages = pages.select("url", "html").repartition(2 * cpus).cache()
    n_pages = pages.count()

    import pandas as pd

    def _touch(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})
    pages.mapInPandas(_touch, "n long").count()

    load_start = round(os.getloadavg()[0], 2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        (extract_pages(pages, with_routing_column=False)
         .agg(F.sum(F.length("content")), F.sum("word_count"),
              F.count("error")).collect())
        best = min(best, time.monotonic() - t0)

    print(json.dumps({
        "code_dir": code_dir,
        "sf_dir": sf_dir,
        "pages": n_pages,
        "cpus": cpus,
        "reps": reps,
        "extract_sec": round(best, 3),
        "docs_per_sec": round(n_pages / best, 1),
        "load_avg_start": load_start,
        "load_avg_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
