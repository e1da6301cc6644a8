"""Plan-only parallelism probes (no jobs, no AQE stage materialization).

``df.rdd.getNumPartitions()`` finalizes the physical plan; under AQE that
MATERIALIZES any upstream shuffle stages before the real job runs — paying
them twice — and burns driver CPU re-planning complex queries. The probes
here look only at the analyzed plan's leaf scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def is_narrow(df: DataFrame, target: int) -> bool:
    """True when ``df`` should be widened to ``target`` partitions before
    row-amplifying / kernel work.

    Every leaf input file contributes at least one scan partition, so
    ``len(inputFiles()) >= target`` proves the input is wide enough without
    touching the scheduler. Frames with few or no input files (a single
    parquet file, an in-memory synthesized relation) are treated as narrow —
    repartitioning those is the point of the probe. Two documented
    imprecisions, both erring toward an extra (skew-defending) repartition:

    - a single LARGE file splits into many scan partitions
      (spark.sql.files.maxPartitionBytes), which this undercounts;
    - a shuffle-bearing input is judged by its leaves, not by the shuffle's
      partitioning — callers with pre-shuffled inputs should pass an
      explicit partition count / widen flag instead of relying on the probe.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return True
    return len(files) < target
