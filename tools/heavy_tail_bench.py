"""Heavy-tail (Pareto) skew evidence for the two-tier giant split.

Round-5 verdict asked for a refresh of BENCH/giant_tier_r3.json on a
*continuous* heavy-tailed corpus (top ~0.1% of pages ~100x the median,
the Common-Crawl shape) plus a justification of the default threshold —
not just the bimodal fixed-giant archetype.

Methodology (see BENCH/BASELINE.md "noise" sections): wall-clock on
this shared box drifts 20-30% between identical configurations minutes
apart — larger than the straggler effect — so the PRIMARY evidence is
within-run task-level metrics read off the Spark REST API
(spark.ui.enabled=true for this tool only):

- ``max_task_sec`` / ``p50_task_sec`` for the run's kernel stages: the
  tail-latency-containment number. Single-tier stacks several giants
  into one salted partition (url-hash is giant-blind), so its max task
  carries multiple ~0.5 s parses plus a full share of normal pages;
  the two-tier split caps the max task near one giant's parse time.
  Being a within-run ratio, it is immune to cross-run platform drift.
- ``utilization`` = sum(task time) / (cores x wall): a straggling wave
  leaves cores idle behind the fat task, so single-tier utilization
  drops while two-tier stays near 1.

Wall seconds (interleaved round-robin, best-of-reps, after a full
warmup) are still reported, with a no-split control whose delta vs
single_tier is the run's wall-noise floor.

Threshold justification: the sweep runs the split at 100 KB (the
absolute default), 4x median, and p99 of the corpus. The win appears
when the threshold isolates the tail (p99: ~20 giants of 2000) and
*reverses* when an absolute threshold sits below the corpus median
(100 KB here: 87% of pages land in the round-robin "giant" wave, so
the split destroys the main wave's balance). The default threshold is
therefore relative: pick ~p99 of the observed size distribution (or
4x median as a cheap proxy), not a fixed byte count.

Writes BENCH/heavy_tail_r{N}.json (arg 1) with one JSON object.

Usage: SPARK_GRAFT_CPUS=8 python tools/heavy_tail_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    n_pages = int(os.environ.get("SPARK_GRAFT_TAIL_PAGES", "2000"))

    pinned = None
    if hasattr(os, "sched_setaffinity"):
        try:
            os.sched_setaffinity(0, set(range(cores)))
            pinned = cores
        except OSError:
            pinned = None

    from pyspark.sql import functions as F
    from defuddle_spark.spark.pages import synthesize_pareto_pages
    from defuddle_spark.spark.pipeline import extract_pages
    from defuddle_spark.spark.session import get_spark

    spark = get_spark(cores=cores, app_name="heavy-tail-bench",
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    pages = synthesize_pareto_pages(spark, sf_dir, n_pages=n_pages).select(
        "url", "html").cache()
    n = pages.count()

    sized = pages.select("url", F.length("html").alias("bytes"))
    stats = sized.agg(
        F.expr("percentile(bytes, 0.5)").alias("median"),
        F.expr("percentile(bytes, 0.99)").alias("p99"),
        F.expr("percentile(bytes, 0.999)").alias("p999"),
        F.max("bytes").alias("max"),
        F.sum("bytes").alias("total"),
    ).collect()[0]

    # Predicted straggle under single-tier salted hash partitioning:
    # repartition(P, xxhash64(url)) places a row in
    # pmod(murmur3(xxhash64(url)), P) — F.hash IS that murmur3 (seed 42),
    # so this reproduces the exact assignment law without running the job.
    part = F.pmod(F.hash(F.xxhash64("url")), F.lit(cores))
    loads = sized.groupBy(part.alias("p")).agg(
        F.sum("bytes").alias("load")).agg(
        F.max("load").alias("mx"), F.avg("load").alias("mean")).collect()[0]
    imbalance = round(loads["mx"] / loads["mean"], 3)

    configs = {
        "single_tier": None,
        "control_no_split": int(stats["max"]) + 1,
        "thr_median_x4": int(stats["median"] * 4),
        "thr_100k": 100_000,
        "thr_p99": int(stats["p99"]),
    }

    sink = lambda df: df.agg(F.sum("word_count")).collect()

    def task_metrics(group: str) -> dict:
        """Per-task durations for every stage of the tagged job(s), via
        the REST API (attributed by jobGroup). All job statuses are
        scanned and each stage is read at its LATEST attempt — reading
        only succeeded jobs / attempt 0 would silently drop evidence
        from exactly the retried/speculated stages a straggler bench
        provokes; any stage that still can't be read is surfaced in
        ``skipped_stages`` instead of vanishing from the numbers."""
        jobs = _rest(ui, f"applications/{app_id}/jobs")
        stage_ids = set()
        for j in jobs:
            if j.get("jobGroup") == group:
                stage_ids.update(j.get("stageIds", []))
        durs = []
        skipped = []
        for sid in sorted(stage_ids):
            try:
                attempts = _rest(ui, f"applications/{app_id}/stages/{sid}")
                latest = max(a.get("attemptId", 0) for a in attempts)
                tasks = _rest(
                    ui, f"applications/{app_id}/stages/{sid}/{latest}"
                        "/taskList?length=10000")
            except Exception:
                skipped.append(sid)
                continue
            durs.extend(t["duration"] / 1000.0 for t in tasks
                        if "duration" in t)
        if not durs:
            return {"skipped_stages": skipped} if skipped else {}
        durs.sort()
        # p50 over substantive tasks only: the two-tier plans carry
        # near-empty scatter/scan tasks (ms-scale) that would drag the
        # median to zero and make the max/p50 ratio meaningless
        kernel = [d for d in durs if d >= 1.0] or durs
        out = {
            "n_tasks": len(durs),
            "p50_kernel_task_sec": round(kernel[len(kernel) // 2], 3),
            "max_task_sec": round(durs[-1], 3),
            "sum_task_sec": round(sum(durs), 3),
        }
        if skipped:
            out["skipped_stages"] = skipped
        return out

    def run(name: str, rep: int, thr) -> tuple[float, str]:
        group = f"{name}-rep{rep}"
        sc.setJobGroup(group, name)
        t = time.monotonic()
        sink(extract_pages(pages, with_routing_column=False,
                           salt_partitions=cores,
                           giant_threshold_bytes=thr))
        wall = time.monotonic() - t
        sc.setJobGroup("idle", "idle")
        return wall, group

    run("warmup", 0, None)  # untimed: JIT + Python worker pool + cache
    best: dict[str, tuple[float, str]] = {}
    for rep in range(1, reps + 1):
        for name, thr in configs.items():
            wall, group = run(name, rep, thr)
            if name not in best or wall < best[name][0]:
                best[name] = (wall, group)

    results = {}
    for name in configs:
        wall, group = best[name]
        m = task_metrics(group)
        entry = {"sec": round(wall, 3), **m}
        if m:
            entry["task_max_over_p50"] = round(
                m["max_task_sec"] / max(m["p50_kernel_task_sec"], 1e-9), 2)
            entry["ideal_sec"] = round(m["sum_task_sec"] / cores, 3)
            entry["utilization"] = round(
                m["sum_task_sec"] / (cores * wall), 3)
        if name != "single_tier":
            thr = configs[name]
            entry["threshold_bytes"] = thr
            entry["giants"] = sized.filter(F.col("bytes") > thr).count()
            entry["speedup_vs_single"] = round(
                best["single_tier"][0] / wall, 3)
        results[name] = entry

    out = {
        "metric": "heavy_tail_straggler_containment",
        "pages": n, "cores": cores, "pinned_cores": pinned,
        "sf_dir": sf_dir, "reps": reps,
        "size_bytes": {"median": int(stats["median"]),
                       "p99": int(stats["p99"]),
                       "p999": int(stats["p999"]),
                       "max": int(stats["max"]),
                       "total": int(stats["total"])},
        "p999_over_median": round(stats["p999"] / stats["median"], 1),
        "single_tier_partition_max_over_mean_bytes": imbalance,
        "configs": results,
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
