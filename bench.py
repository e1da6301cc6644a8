"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The headline number is wall seconds, with extraction docs/sec attached
(BASELINE.md's comparison axis). tools/scaling_bench.py runs the same
job at two parallelism levels for the N→4N efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 32x replication => 160k pages at sf0.1: at 32 cores smaller corpora
    # finish in ~1s of compute + ~2s of fixed driver cost and the docs/sec
    # figure measures the serial term, not the engine (80k reads 15.5k/s,
    # 160k reads 19.9k/s on the same code).
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from defuddle_spark.ops.dedup import dedup_exact, minhash_lsh_candidates
    from defuddle_spark.ops.similarity import cosine_topk
    from defuddle_spark.ops.textstats import text_quality
    from defuddle_spark.spark.pages import synthesize_pages
    from defuddle_spark.spark.pipeline import extract_pages
    from defuddle_spark.spark.session import get_spark

    # Pin the whole bench (driver + local executor threads) to a FIXED
    # core set so runs are layout-comparable across rounds (local[N]
    # otherwise overflows onto whichever cores are free — the
    # cluster-equiv harness already pins; round-4 brings the main bench
    # in line).
    pinned = None
    if hasattr(os, "sched_setaffinity"):
        try:
            os.sched_setaffinity(0, set(range(cpus)))
            pinned = cpus
        except OSError:
            # a silently unpinned run must not be LABELED pinned in the
            # artifact — pinned_cores stays null
            pinned = None

    # If the box is busy, WAIT (bounded) rather than time under load and
    # annotate afterwards: numbers that need external adjudication are
    # the thing round 4 is removing. The wait must come BEFORE the kernel
    # probe — probing under load and benching after it drains would fake
    # a kernel regression, the exact mis-adjudication the probe prevents.
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "8"))
    wait_budget = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "180"))
    waited = 0
    while os.getloadavg()[0] > load_gate and waited < wait_budget:
        time.sleep(10)
        waited += 10

    # Single-core kernel probe (pure Python, before the JVM): the
    # round-over-round kernel anchor. A full-width delta without a probe
    # delta is neighbor load, not a regression (round-3 lesson — that
    # adjudication needed an out-of-band probe; now it's in the artifact).
    from tools.kernel_probe import run_probe
    probe = run_probe(sf_dir, n_docs=500, reps=3, pin_core=0)

    spark = get_spark(cores=cpus, app_name="defuddle-bench")
    spark.sparkContext.setLogLevel("ERROR")

    pages = synthesize_pages(spark, sf_dir, replicate=replicate)
    pages = pages.select("url", "html").repartition(2 * cpus).cache()
    n_pages = pages.count()  # materialize synthesis outside the timed window

    # Warm every Python worker (full-width trivial mapInPandas): worker
    # startup is a one-time per-executor cost (~0.5s x workers), not
    # steady-state throughput. A limit() warmup would collapse to one
    # partition and warm a single worker — it must span all partitions.
    import pandas as pd

    def _touch(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})
    pages.mapInPandas(_touch, "n long").count()

    # The sandbox box carries fluctuating external load (runs swing 3-5x);
    # each query is timed REPS times and the minimum reported — external
    # noise only ever slows a run down.
    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(REPS):
            t = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t)
        return round(best, 3)

    timings: dict = {}
    load_start = round(os.getloadavg()[0], 2)
    t0 = time.monotonic()

    # Headline: the replicated extraction corpus (160k pages at sf0.1) —
    # docs/sec on this is BASELINE.md's comparison axis.
    timings["extract"] = timed(lambda: extract_pages(
        pages, with_routing_column=False)
        .agg(F.sum(F.length("content")), F.sum("word_count"),
             F.count("error")).collect())

    # Every driver-contract query, timed by name (round-over-round
    # regressions are visible per query). The noop sink forces full
    # materialization of every output column — count() would let Catalyst
    # prune computed columns out of native queries entirely.
    import __spark_entry__ as entry
    from defuddle_spark.ops.dedup import release_cached

    def run_full(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_cached()  # drop per-call persisted signature frames

    for name, fn in entry.queries().items():
        timings[name] = timed(lambda fn=fn: run_full(fn))

    # headline value = sum of best per-query times (the repeated timing
    # loop's wall total would just measure REPS x noise)
    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_pages / timings["extract"], 2)

    # Query-set growth must never read as regression: report the sum over
    # the queries SHARED with the previous round's recorded bench next to
    # the total (round-4 lesson — 12 new gate queries grew the total 72.5
    # -> 110.3 s while the shared sum stayed flat).
    shared: dict = {}
    try:
        import glob
        import re
        here = os.path.dirname(os.path.abspath(__file__))

        def _round_no(path: str) -> int:
            m = re.search(r"_r(\d+)\.json$", path)
            return int(m.group(1)) if m else -1

        # "Previous round" = the latest COMPLETED round. CORRECTNESS_r{N}
        # exists exactly for completed rounds, so cap the BENCH candidates
        # at max(correctness round): a bench re-run AFTER the driver wrote
        # this round's own BENCH_r{N}.json must not compare against itself
        # (the comparison would always read flat — ADVICE r5).
        corr = [_round_no(p)
                for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))]
        cap = max(corr) if corr else None
        prev_files = sorted(
            (p for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
             if cap is None or _round_no(p) <= cap),
            key=_round_no)
        if prev_files:
            with open(prev_files[-1]) as fh:
                prev = json.load(fh)
            # the driver's BENCH_r*.json wraps our JSON line under
            # "parsed"; accept both that shape and a raw bench line
            prev_parsed = prev.get("parsed", {}) or {}
            prev_q = (prev_parsed.get("queries")
                      or prev.get("queries") or {})
            names = [n for n in timings
                     if isinstance(prev_q.get(n), (int, float))]
            shared = {
                "shared_prev_file": os.path.basename(prev_files[-1]),
                "shared_query_total": round(
                    sum(timings[n] for n in names), 3),
                "shared_query_total_prev": round(
                    sum(float(prev_q[n]) for n in names), 3),
                "shared_query_count": len(names),
                "new_query_count": len(timings) - len(names),
            }
            # Self-adjudicating platform normalization (VERDICT r5 #7):
            # the single-core kernel probe runs in both rounds' artifacts,
            # so the shared sum can be restated in the PREVIOUS round's
            # platform terms — two consecutive rounds needed manual
            # probe-based noise adjudication; now the artifact carries it.
            prev_probe = (prev_parsed.get("kernel_ms_per_doc")
                          or prev.get("kernel_ms_per_doc"))
            if prev_probe and probe.get("kernel_ms_per_doc"):
                ratio = probe["kernel_ms_per_doc"] / float(prev_probe)
                shared["probe_ratio_vs_prev"] = round(ratio, 4)
                shared["shared_query_total_probe_normalized"] = round(
                    shared["shared_query_total"] / ratio, 3)
    except Exception:
        # a malformed prior artifact (wrong shape, null timings, bad
        # JSON) must not fail the bench after the timed work is done
        shared = {}

    print(json.dumps({
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages": n_pages,
        "cpus": cpus,
        "extraction_docs_per_sec": docs_per_sec,
        # External neighbor load swings this box by 2x+ (measured across
        # four round-3 runs: 16.1k/11.5k/19.7k/12.0k extraction docs/s);
        # the 1-minute load average before/after contextualizes a noisy
        # number. Our own Spark work contributes to load_avg_end.
        "load_avg_start": load_start,
        "load_avg_end": round(os.getloadavg()[0], 2),
        "load_wait_s": waited,
        "pinned_cores": pinned,
        **shared,
        **probe,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
