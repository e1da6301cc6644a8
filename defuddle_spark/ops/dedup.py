"""Deduplication operators over a (doc_id, text) corpus.

Scale notes (designed for ~10^9-10^12 docs; tested at sf0.01/0.1):
- exact dedup shuffles 16-byte md5 keys, not full texts (map-side partial
  aggregation collapses duplicates before the shuffle);
- MinHash signatures are computed with native xxhash64 expressions (one
  whole-stage-codegen projection, no Python); LSH banding turns the
  quadratic all-pairs problem into a shuffle on (band, band_hash);
- exact n-gram Jaccard joins on shingles, which is only sane below ~10^7
  docs — it exists as the oracle-checkable ground-truth variant; the LSH
  path is the one that survives 100 TB.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicates by md5(text); keeps the lowest id per group.

    Returns (doc_id, dup_count) for surviving representatives.
    """
    return (docs
            .groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("text_md5"))
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").cast("int").alias("dup_count"))
            .select(id_col, "dup_count"))


def _ensure_parallel(docs: DataFrame) -> DataFrame:
    """Repartition narrow inputs before row-amplifying work.

    A single parquet file scans as ONE partition, which serializes the
    explode-heavy operators onto one core (measured: 64-perm MinHash over
    5k docs took 5.4 s single-partition vs sub-second parallel). At
    cluster scale the input already has thousands of partitions and this
    is a no-op; the check costs a plan->RDD conversion, not a job.
    """
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def _token_shingles(text_col: str, k: int):
    """Array of k-token shingles (space-joined), native expressions only."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(tokens)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
    )).otherwise(F.array(F.concat_ws(" ", tokens)))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_perm: int = 64,
                       shingle_k: int = 3) -> DataFrame:
    """(doc_id, sig array<long>) — num_perm minhashes over k-shingles.

    Universal-hashing construction: each shingle is string-hashed twice
    (h1 = xxhash64(s) mod 2^61-1, h2 = xxhash64(s,1) mod 2^31-1);
    permutation i is min over shingles of h1 + i*h2 (never overflows
    int64 under ANSI). Implemented as explode + hash aggregate rather
    than array higher-order functions: Catalyst interprets transform/
    zip_with lambdas per element, while min() aggregates run in
    whole-stage codegen with map-side partial aggregation (the shuffle
    carries one row per doc, not per shingle).
    """
    shingles = F.array_distinct(_token_shingles(text_col, shingle_k))
    docs = _ensure_parallel(docs)
    exploded = docs.select(F.col(id_col), F.explode(shingles).alias("_sh"))
    hashed = exploded.select(
        F.col(id_col),
        F.pmod(F.xxhash64("_sh"), F.lit(2305843009213693951)).alias("_h1"),
        F.pmod(F.xxhash64("_sh", F.lit(1)), F.lit(2147483647)).alias("_h2"))
    aggd = hashed.groupBy(id_col).agg(*[
        F.min(F.col("_h1") + F.lit(i).cast("long") * F.col("_h2")).alias(f"_m{i}")
        for i in range(num_perm)
    ])
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_perm)])
    return aggd.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_candidates(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: (id_a, id_b, est_jaccard).

    rows_per_band = num_perm // bands. Pairs are emitted once (id_a < id_b)
    with the signature-estimated Jaccard.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_perm, shingle_k)
    banded = sigs.select(
        id_col, "sig",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(
                ",", *[F.col("sig")[b * rows_per_band + r].cast("string")
                       for r in range(rows_per_band)]))
            for b in range(bands)
        ])).alias("band", "band_hash"),
    )
    # The self-join would otherwise recompute the whole signature
    # pipeline for each side (AQE's broadcast choice defeats exchange
    # reuse); persist the banded frame so it is computed once. Size is
    # (id, 64-long sig, band, hash) x bands — bounded and spillable.
    banded = banded.persist()
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (a.join(b, ["band", "band_hash"])
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.sig").alias("sig_a"),
                     F.col("b.sig").alias("sig_b"))
             .dropDuplicates(["id_a", "id_b"]))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    ) / F.lit(num_perm)
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        threshold: float = 0.6) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (ground truth / oracle variant).

    (id_a, id_b, jaccard) for distinct-shingle Jaccard >= threshold.
    """
    sh = _ensure_parallel(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(_token_shingles(text_col, k))).alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, "sh")
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count("*").alias("n_common")))
    jac = (inter
           .join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a"), "id_a")
           .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b"), "id_b")
           .withColumn("jaccard", F.round(
               F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return jac


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens, weight 1 per token.

    bit_j(doc) = sign(sum_tokens(bit_j(xxhash64(token)) ? +1 : -1)).
    Built entirely from native expressions: explode tokens, per-bit
    accumulation via aggregate over 64 shiftright/bitwise ops.
    """
    tokens = _ensure_parallel(docs).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
    h = F.xxhash64("tok")
    bit_cols = [
        F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{j}")
        for j in range(64)
    ]
    agg = tokens.groupBy(id_col).agg(*bit_cols)
    sim = F.lit(0).cast("long")
    for j in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long")))
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: block on 4 16-bit chunks (pigeonhole: any pair within
    Hamming 3 shares at least one exact chunk), join per block, verify
    with bit_count. Avoids the all-pairs product.
    """
    sims = simhash64(docs, id_col, text_col)
    chunks = sims.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ])).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (a.join(b, ["chunk_idx", "chunk"])
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .dropDuplicates(["id_a", "id_b"]))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
