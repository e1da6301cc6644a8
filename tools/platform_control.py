"""Platform-scaling control for the two-cluster-size criterion.

Runs the SAME extraction kernel over the SAME document mix with plain
``multiprocessing`` (no Spark, no shuffle, no scheduler) under the same
``taskset`` pinning as tools/scaling_bench.py. Whatever efficiency THIS
measures is the ceiling the sandbox box itself imposes (hypervisor
frequency/contention effects measured separately: a single pinned core
drops ~14% when 7 compute-only spinners occupy neighbor cores).

Engine-attributable scaling = spark_efficiency / control_efficiency.
On a real N->4N executor cluster the platform term does not exist
(executors are separate machines), so the engine-attributable number is
the honest estimate of cluster scaling.

Usage: python tools/platform_control.py [n_low] [n_high] [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEVEL_SCRIPT = r"""
import sys, time, json, multiprocessing as mp
sys.path.insert(0, "__REPO__")

def _work(chunk):
    from defuddle_spark.kernel import extract_document_bytes
    total = 0
    for h, u in chunk:
        total += extract_document_bytes(h, u).word_count
    return total

def main():
    nproc, n_docs = int(sys.argv[1]), int(sys.argv[2])
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "2").getOrCreate())
    from defuddle_spark.spark.pages import synthesize_pages
    base = synthesize_pages(spark, "/root/testdata/sf0.1").toPandas()
    spark.stop()
    docs = list(zip((bytes(h) for h in base["html"]), base["url"]))
    reps = max(1, n_docs // len(docs))
    docs = docs * reps
    k = 8 * nproc
    chunks = [docs[i::k] for i in range(k)]
    with mp.Pool(nproc) as pool:
        pool.map(_work, chunks[:nproc])  # warm each worker
        rates = []
        for _ in range(5):
            t0 = time.monotonic()
            pool.map(_work, chunks)
            dt = time.monotonic() - t0
            rates.append(round(len(docs) / dt, 1))
    print(json.dumps({"nproc": nproc, "n_docs": len(docs), "rates": rates}))

if __name__ == "__main__":
    main()
"""


def run_level(cpus: int, n_docs: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
           _LEVEL_SCRIPT.replace("__REPO__", REPO), str(cpus), str(n_docs)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    r = json.loads(lines[-1])
    r["docs_per_sec"] = max(r["rates"])
    r["median_docs_per_sec"] = statistics.median(r["rates"])
    return r


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 80000
    low = run_level(n_low, n_docs)
    high = run_level(n_high, n_docs)
    speedup = high["docs_per_sec"] / low["docs_per_sec"]
    print(json.dumps({
        "control": "multiprocessing-no-spark",
        "low": low, "high": high,
        "speedup": round(speedup, 3),
        "platform_efficiency": round(speedup / (n_high / n_low), 3),
    }, indent=2))


if __name__ == "__main__":
    main()
