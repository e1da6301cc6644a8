"""Scale evidence for ops/dedup.dedup_substrings: the same planted
corpus run at two parallelism levels (the in-sandbox proxy for the
two-cluster-size rule — see BENCH/BASELINE.md for why the raw same-box
ratio is frequency-bounded ~0.70-0.75 by all-core turbo and shared
DRAM, which separate executor machines do not share).

The corpus is synthesized IN SPARK (spark.range + expressions, no
driver data, no external input): N docs of ~150 tokens, 20% carrying a
shared 60-token passage mid-document — the ExactSubstr hit case. Each
parallelism level runs in its own subprocess (fresh JVM, fresh session)
and reports wall seconds plus a deterministic output hash; the parent
asserts the hash is IDENTICAL across levels (layout independence) and
emits throughput + scaling efficiency.

Usage: python tools/substring_dedup_bench.py [out.json]
       python tools/substring_dedup_bench.py --run <cores>   (child)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SPARK_GRAFT_SUBSTR_DOCS", "480000"))
UNIQ_TOKENS = 45          # prefix and suffix, unique per doc
PASSAGE_TOKENS = 60       # the planted duplicated span
WINDOW = 50


def synthesize(spark):
    from pyspark.sql import functions as F
    did = F.col("id")
    uniq = lambda lo, hi: F.transform(  # noqa: E731
        F.sequence(F.lit(lo), F.lit(hi)),
        lambda j: F.concat(F.lit("u"), did.cast("string"), F.lit("x"),
                           j.cast("string")))
    passage = F.transform(
        F.sequence(F.lit(1), F.lit(PASSAGE_TOKENS)),
        lambda j: F.concat(F.lit("shared"), j.cast("string")))
    middle = F.when(did % 5 == 0, passage) \
              .otherwise(uniq(UNIQ_TOKENS + 1, UNIQ_TOKENS + PASSAGE_TOKENS))
    text = F.array_join(F.concat(
        uniq(1, UNIQ_TOKENS), middle,
        uniq(UNIQ_TOKENS + PASSAGE_TOKENS + 1,
             UNIQ_TOKENS + PASSAGE_TOKENS + UNIQ_TOKENS)), " ")
    return (spark.range(N_DOCS)
            .repartition(64)
            .select(did.alias("doc_id"), text.alias("text")))


def run_child(cores: int) -> None:
    from pyspark.sql import functions as F

    from defuddle_spark.ops.dedup import dedup_substrings
    from defuddle_spark.spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"substr-bench-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synthesize(spark).localCheckpoint(eager=True)  # exclude gen cost
    t0 = time.monotonic()
    out = dedup_substrings(docs, n=WINDOW)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_tokens_removed").alias("removed"),
        F.sum(F.xxhash64("doc_id", "text").cast("decimal(38,0)"))
        .alias("h")).collect()[0]
    print(json.dumps({
        "cores": cores, "seconds": round(time.monotonic() - t0, 3),
        "docs": agg["n"], "tokens": int(agg["tok"]),
        "tokens_removed": int(agg["removed"]), "output_hash": str(agg["h"]),
    }))
    spark.stop()


def _spawn(cores_spec: str, n_cores: int) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", cores_spec, sys.executable,
         os.path.abspath(__file__), "--run", str(n_cores)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)


def _result(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}")
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_child(int(sys.argv[2]))
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    unit, units = 8, 4
    # Cluster-equivalent N->4N (the BENCH/BASELINE.md methodology): the
    # low level is `units` CONCURRENT replicas, each pinned to its own
    # `unit`-core slice and running the identical job — four "executor
    # machines" under all-core platform conditions (turbo + shared DRAM
    # held constant, conservatively including cross-replica DRAM
    # contention a real cluster would not have). The high level is one
    # pinned job across all the same cores. Efficiency = wide-job
    # throughput / summed concurrent-replica throughput.
    replicas = [_spawn(f"{i * unit}-{(i + 1) * unit - 1}", unit)
                for i in range(units)]
    try:
        rep_runs = [_result(p) for p in replicas]
    finally:
        # one failed child must not leave its siblings burning 24
        # pinned cores as orphaned JVMs (they also corrupt any
        # subsequent timing run on the box)
        for p in replicas:
            if p.poll() is None:
                p.kill()
    wide = _result(_spawn(f"0-{unit * units - 1}", unit * units))
    planted = (N_DOCS // 5 - 1) * PASSAGE_TOKENS
    if wide["tokens_removed"] != planted:
        raise RuntimeError(
            f"tokens_removed {wide['tokens_removed']} != planted "
            f"{planted}: the op excised the wrong spans")
    # raw bracket: ONE pinned unit-core job with the rest of the box
    # idle — unfairly FAST (solo turbo, whole DRAM to itself), where
    # the concurrent replicas are unfairly SLOW (4x Spark shuffle jobs
    # share DRAM, which 4 executor machines would not). The true
    # cluster N->4N efficiency for this shuffle-heavy op lies between
    # the two reported efficiencies.
    solo = _result(_spawn(f"0-{unit - 1}", unit))
    hashes = ({r["output_hash"] for r in rep_runs}
              | {wide["output_hash"], solo["output_hash"]})
    if len(hashes) != 1:
        raise RuntimeError("output DIVERGED across parallelism levels")
    rep_thr = [r["docs"] / r["seconds"] for r in rep_runs]
    wide_thr = wide["docs"] / wide["seconds"]
    solo_thr = solo["docs"] / solo["seconds"]
    result = {
        "metric": "substring_dedup_cluster_equiv",
        "n_docs": N_DOCS, "window": WINDOW, "dup_docs_pct": 20.0,
        "unit_cores": unit, "units": units,
        "replica_seconds": [r["seconds"] for r in rep_runs],
        "replica_docs_per_sec_sum": round(sum(rep_thr), 1),
        "wide_seconds": wide["seconds"],
        "wide_docs_per_sec": round(wide_thr, 1),
        "solo_unit_seconds": solo["seconds"],
        "solo_unit_docs_per_sec": round(solo_thr, 1),
        "tokens_removed": wide["tokens_removed"],
        "output_layout_independent": True,
        "scaling_efficiency_vs_concurrent": round(wide_thr / sum(rep_thr), 3),
        "scaling_efficiency_vs_solo": round(wide_thr / (solo_thr * units), 3),
        "note": ("true N->4N efficiency lies between the two: the solo "
                 "baseline over-credits the low level (solo turbo + "
                 "exclusive DRAM), the concurrent baseline over-charges "
                 "it (4x Spark shuffles share one DRAM bus)"),
        "load_avg": round(os.getloadavg()[0], 2),
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
