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
    from tools.kernel_probe import run_probe, run_probe_fullwidth
    probe = run_probe(sf_dir, n_docs=500, reps=3, pin_core=0)
    # Full-width probe (verdict r6 #1): N pinned concurrent replicas of
    # the same kernel loop. The 1-core ratio does NOT transfer to a
    # 32-wide wall total (all-core turbo + shared memory bandwidth:
    # measured 1.17 ms/doc 1c vs 2.51 ms/doc per-core at 32-wide) —
    # extraction-family queries are adjudicated against THIS ratio.
    try:
        probe.update(run_probe_fullwidth(sf_dir, n_docs=200, reps=2,
                                         width=cpus))
    except Exception:
        # a broken replica pool must not kill the bench — the artifact
        # just lacks the fullwidth fields (and the adjudicated sum)
        pass
    # Previous-round kernel A/B (verdict r6 #7): same probe on the last
    # "round N:" commit in a scratch worktree, interleaved reps — the
    # definitive code-vs-platform discriminator ({} on round 1 or when
    # git state is unavailable; disable with SPARK_GRAFT_KERNEL_AB=0).
    if os.environ.get("SPARK_GRAFT_KERNEL_AB", "1") == "1":
        from tools.kernel_ab import run_kernel_ab
        probe.update(run_kernel_ab(sf_dir))

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

    def timed_all(fn) -> list:
        times = []
        for _ in range(REPS):
            t = time.monotonic()
            fn()
            times.append(time.monotonic() - t)
        return times

    timings: dict = {}
    timings_mean: dict = {}
    load_start = round(os.getloadavg()[0], 2)
    t0 = time.monotonic()

    # Headline: the replicated extraction corpus (160k pages at sf0.1) —
    # docs/sec on this is BASELINE.md's comparison axis.
    extract_times = timed_all(lambda: extract_pages(
        pages, with_routing_column=False)
        .agg(F.sum(F.length("content")), F.sum("word_count"),
             F.count("error")).collect())
    timings["extract"] = round(min(extract_times), 3)
    timings_mean["extract"] = round(
        sum(extract_times) / len(extract_times), 3)

    # Every driver-contract query, timed by name (round-over-round
    # regressions are visible per query). The noop sink forces full
    # materialization of every output column — count() would let Catalyst
    # prune computed columns out of native queries entirely.
    #
    # Order-robust reps (verdict r6 #2): instead of REPS back-to-back
    # runs per query, run REPS full PASSES over the registry, each pass
    # in a different seeded-shuffled order. The r6 artifact showed
    # late-arriving neighbor load landing on whichever family ran last
    # in registry order (similarity/ANN regressed 1.1-1.46x with
    # untouched code); shuffled passes decorrelate position from query,
    # and min-vs-mean per query shows how loaded the run was.
    import random

    import __spark_entry__ as entry
    from defuddle_spark.ops.dedup import release_cached

    def run_full(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_cached()  # drop per-call persisted signature frames

    fns = entry.queries()
    per_pass: dict = {name: [] for name in fns}
    for p in range(REPS):
        order = list(fns)
        random.Random(1000 + p).shuffle(order)
        for name in order:
            t = time.monotonic()
            run_full(fns[name])
            per_pass[name].append(time.monotonic() - t)
    for name, vals in per_pass.items():
        timings[name] = round(min(vals), 3)
        timings_mean[name] = round(sum(vals) / len(vals), 3)

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
            # Self-adjudicating platform normalization, v2 (VERDICT r6
            # #1): extraction-family queries (Python-kernel-bound) are
            # restated through the FULL-WIDTH probe ratio — the 1-core
            # ratio conflates all-core turbo and bandwidth contention
            # with kernel speed and mis-adjudicated r6 (+2.8% raw shown
            # as +53%). JVM-only queries are left raw: their cost is
            # shuffle/codegen, which neither probe models. The 1-core
            # ratio is still emitted, explicitly ADVISORY.
            def _prev_field(key):
                v = prev_parsed.get(key) or prev.get(key)
                return float(v) if v else None

            def _extraction_family(name):
                return ((name == "extract" or name.startswith("extract_")
                         or name == "warc_extract")
                        and "stream" not in name)

            prev_1c = _prev_field("kernel_ms_per_doc")
            if prev_1c and probe.get("kernel_ms_per_doc"):
                r1 = probe["kernel_ms_per_doc"] / prev_1c
                shared["probe_ratio_vs_prev"] = round(r1, 4)
                shared["shared_query_total_1c_normalized_advisory"] = \
                    round(shared["shared_query_total"] / r1, 3)
            prev_fw = _prev_field("kernel_ms_per_doc_fullwidth")
            if prev_fw and probe.get("kernel_ms_per_doc_fullwidth"):
                rfw = probe["kernel_ms_per_doc_fullwidth"] / prev_fw
                shared["probe_ratio_fullwidth_vs_prev"] = round(rfw, 4)
                ext = [n for n in names if _extraction_family(n)]
                other = [n for n in names if not _extraction_family(n)]
                shared["shared_query_total_adjudicated"] = round(
                    sum(timings[n] for n in ext) / rfw
                    + sum(timings[n] for n in other), 3)
                shared["adjudicated_note"] = (
                    "extraction-family normalized by fullwidth probe "
                    f"ratio ({len(ext)} queries); JVM/streaming raw "
                    f"({len(other)})")
    except Exception:
        # a malformed prior artifact (wrong shape, null timings, bad
        # JSON) must not fail the bench after the timed work is done
        shared = {}

    print(json.dumps({
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_mean": timings_mean,
        "bench_reps": REPS,
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
