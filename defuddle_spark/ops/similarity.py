"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact cosine against a query vector —
  one whole-stage-codegen projection (zip_with + aggregate), no Python,
  no shuffle until the final top-k (which Spark executes as a
  TakeOrderedAndProject: per-partition heap + driver merge, no full sort).
- ``lsh_topk``: the 100 TB path — random-hyperplane signatures bucket the
  corpus; only the query's bucket(s) are exactly re-ranked. Hyperplanes
  are pseudo-random but fully deterministic (seeded from xxhash64 of
  (plane, dim)), so results are reproducible across runs/executors.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F


def _as_double_array(vec: Sequence[float]) -> F.Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in vec])


def cosine_similarity_col(emb_col: str, query: Sequence[float]) -> F.Column:
    q = _as_double_array(query)
    emb = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(emb, q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm_e = F.sqrt(F.aggregate(F.transform(emb, lambda a: a * a),
                                F.lit(0.0), lambda acc, x: acc + x))
    norm_q = float(math.sqrt(sum(float(x) * float(x) for x in query))) or 1.0
    return dot / (norm_e * F.lit(norm_q))


def cosine_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
                id_col: str = "vec_id", emb_col: str = "embedding",
                round_digits: int = 4) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic (rounded sim, id) order."""
    sim = F.round(cosine_similarity_col(emb_col, query), round_digits)
    return (embeddings
            .select(F.col(id_col), sim.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.col(id_col))
            .limit(k))


def _hyperplane(plane: int, dim: int) -> List[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Python-side constant generation (broadcast as literals); matches
    nothing external — just a fixed seeded construction.
    """
    out = []
    for d in range(dim):
        # xorshift-style mix of (plane, d); stable across processes
        x = (plane * 1_000_003 + d * 19_349_663 + 0x9E3779B9) & 0xFFFFFFFF
        x ^= x >> 13
        x = (x * 0x5BD1E995) & 0xFFFFFFFF
        x ^= x >> 15
        out.append((x / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_signature_col(emb_col: str, dim: int, planes: int = 16) -> F.Column:
    """Random-hyperplane bit signature (int) of an embedding column."""
    emb = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for p in range(planes):
        h = _as_double_array(_hyperplane(p, dim))
        dot = F.aggregate(F.zip_with(emb, h, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        sig = sig.bitwiseOR(F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p))
                            .otherwise(F.lit(0).cast("long")))
    return sig


def lsh_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
             id_col: str = "vec_id", emb_col: str = "embedding",
             planes: int = 12, max_hamming: int = 2,
             round_digits: int = 4) -> DataFrame:
    """Approximate top-k: candidates whose signature is within
    ``max_hamming`` bits of the query signature, exactly re-ranked.

    At scale the signature is a partition/bucket key: the scan prunes to
    a tiny fraction of the corpus before any exact math runs.
    """
    dim = len(query)
    sig = lsh_signature_col(emb_col, dim, planes)

    qsig = 0
    for p in range(planes):
        h = _hyperplane(p, dim)
        if sum(float(a) * b for a, b in zip(query, h)) >= 0:
            qsig |= 1 << p
    candidates = embeddings.withColumn("sig", sig).filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming)
    sim = F.round(cosine_similarity_col(emb_col, query), round_digits)
    return (candidates
            .select(F.col(id_col), sim.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.col(id_col))
            .limit(k))
