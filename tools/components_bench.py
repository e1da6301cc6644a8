"""Connected-components algorithm evidence: star contraction vs label
propagation on planted pair graphs (verdict r6 #6).

Near-dup pair graphs at crawl scale are not all blobs: template-drift
chains (snapshot N pairs only with snapshot N±1) give components whose
DIAMETER grows with crawl count. Label propagation needs O(diameter)
rounds — each one a full join+groupBy over the edge set — while
alternating large-star/small-star contraction (Kiveris et al.) needs
O(log n). This harness plants both shapes, runs both algorithms through
the SAME public duplicate_components API, differential-checks the
outputs, and records rounds + wall seconds per (shape, algorithm) to
BENCH/components_star_r{N}.json.

Usage: python tools/components_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def planted_pairs(spark, shape: str):
    """Pair frames built with spark.range — no driver-side data."""
    if shape == "chains_64":
        # 2000 chains of 64 nodes: diameter 63, the label worst case
        n, clen = 128_000, 64
        return (spark.range(n).filter((F.col("id") + 1) % clen != 0)
                .select(F.col("id").alias("id_a"),
                        (F.col("id") + 1).alias("id_b")))
    if shape == "blobs_5":
        # 25k dense blobs of 5 nodes: diameter 1, label's best case
        n = 125_000
        base = spark.range(n // 5).select(
            (F.col("id") * 5).alias("root"))
        pairs = None
        for i in range(1, 5):
            p = base.select(F.col("root").alias("id_a"),
                            (F.col("root") + i).alias("id_b"))
            pairs = p if pairs is None else pairs.unionByName(p)
        return pairs
    raise ValueError(shape)


def main() -> None:
    from defuddle_spark.ops.dedup import duplicate_components
    from defuddle_spark.spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cpus, app_name="components-bench")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"metric": "components_rounds_and_seconds",
                    "cpus": cpus, "shapes": {}}
    for shape in ("chains_64", "blobs_5"):
        pairs = planted_pairs(spark, shape).localCheckpoint(eager=True)
        per_algo: dict = {}
        outputs = {}
        for algo in ("auto", "star", "label"):
            stats: dict = {}
            t0 = time.monotonic()
            comp = duplicate_components(pairs, algorithm=algo,
                                        max_iters=100, stats=stats)
            # one deterministic aggregate materializes the full result
            agg = comp.agg(
                F.count("*").alias("n"),
                F.count_distinct("component").alias("n_comp"),
                F.sum(F.xxhash64("doc_id", "component")
                      .cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            per_algo[algo] = {
                "rounds": stats["rounds"],
                "converged": stats["converged"],
                "resolved": stats["algorithm"],
                "seconds": round(time.monotonic() - t0, 3),
            }
            outputs[algo] = (agg["n"], agg["n_comp"], agg["h"])
        if len(set(outputs.values())) != 1:
            raise RuntimeError(
                f"{shape}: algorithm outputs DIVERGED: {outputs}")
        per_algo["outputs_identical"] = True
        per_algo["nodes"] = outputs["star"][0]
        per_algo["components"] = outputs["star"][1]
        result["shapes"][shape] = per_algo

    result["load_avg"] = round(os.getloadavg()[0], 2)
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
