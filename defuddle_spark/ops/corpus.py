"""Composed corpus-preparation pipeline (the C4-style shape).

Individual operators (dedup, quality, lang-id) are each gate-verified on
their own; this module proves they COMPOSE into the filter every
training-data pipeline runs before tokenization, still as one lazy
Catalyst plan (no intermediate materialization, full pushdown through
the composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import text_quality


def filter_corpus(docs: DataFrame, min_quality: float = 0.5,
                  min_tokens: int = 20, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact-dedup (keep the minimum id per content hash) then
    quality-gate: (doc_id, n_tokens, quality_score) for surviving docs.

    Scale shape: the dedup representative set is a groupBy on the
    16-byte md5 key with map-side partial aggregation (ids only through
    the shuffle); the survivor join is id-keyed; quality scoring is one
    codegen projection. At 10^12 docs this is two shuffles (hash, id)
    and zero Python.
    """
    reps = (docs
            .groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_h"))
            .agg(F.min(id_col).alias(id_col))
            .select(id_col))
    kept = docs.join(reps, id_col)
    q = text_quality(kept, id_col, text_col)
    return (q.filter((F.col("quality_score") >= min_quality)
                     & (F.col("n_tokens") >= min_tokens))
            .select(id_col, "n_tokens", "quality_score"))


def hash_sample(docs: DataFrame, rate: float, id_col: str = "doc_id",
                buckets: int = 10_000, salt: str = "") -> DataFrame:
    """Deterministic content-addressed sampling: keep a doc iff its
    md5-bucket falls under ``rate`` — the reproducible train/holdout
    split every training-data pipeline needs.

    Unlike ``df.sample`` (rand(seed) is partition-order dependent, so
    reruns and layout changes pick different rows), the decision is a
    pure function of the id: stable across runs, cluster layouts, and
    engines — the same split can be recomputed in any system that has
    md5. One codegen projection + filter, no shuffle, fully
    pushdown-friendly.
    """
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long") % buckets
    return docs.filter(bucket < int(rate * buckets))


def stratified_hash_sample(docs: DataFrame, rates: dict,
                           strata_col: str, id_col: str = "doc_id",
                           buckets: int = 10_000,
                           default_rate: float = 0.0,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    downsample dominant languages, keep the tail): ``rates`` maps
    stratum value -> keep-rate; unlisted strata use ``default_rate``.
    Same content-addressed determinism (and the same ``salt`` semantics
    — different salts draw INDEPENDENT splits over the same ids) as
    hash_sample. The per-stratum threshold is a map-literal lookup, not
    a chained CASE, so the expression stays flat however many strata the
    caller rebalances — still a single codegen filter."""
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long") % buckets
    default = F.lit(int(default_rate * buckets))
    if rates:
        rate_map = F.create_map(*[
            lit for value, rate in rates.items()
            for lit in (F.lit(value), F.lit(int(rate * buckets)))])
        threshold = F.coalesce(rate_map.getItem(F.col(strata_col)), default)
    else:
        threshold = default
    return docs.filter(bucket < threshold)


def c4_line_filter(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words_per_line: int = 3,
                   min_sentences: int = 5) -> DataFrame:
    """The C4 line/page cleaning rules (Raffel et al. 2020, §2.2 —
    public): keep only lines that end in terminal punctuation
    (``. ! ? "`` or a closing curly quote) and have at least
    ``min_words_per_line`` words; drop lines containing the word
    "javascript" (case-insensitive); drop PAGES that mention
    "lorem ipsum", contain a ``{`` (code), or whose kept text has fewer
    than ``min_sentences`` sentences (terminal-punctuation count).
    C4's obscenity blocklist is deliberately not bundled; compose a
    caller-provided filter upstream if needed.

    Returns every input doc as (id, text, n_lines, n_lines_kept,
    n_sentences, page_kept): ``text`` is the kept lines joined with
    newlines; callers filter on ``page_kept`` (returning the flag
    instead of dropping rows keeps the op auditable — loss accounting
    is one aggregation away, same convention as the WARC reader).

    Scale shape: entirely row-local array higher-order functions — one
    codegen projection, zero shuffle, trivially partition-parallel.
    """
    did = F.col(id_col)
    lines = F.transform(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
        lambda l: F.trim(l))
    # a kept line: terminal punctuation, >= N words, no "javascript"
    kept_arr = F.filter(lines, lambda l: (
        l.rlike('[.!?"”]$')
        & (F.size(F.split(l, "[ \t\x0b\f\r]+")) >= min_words_per_line)
        & ~F.lower(l).contains("javascript")))
    joined = F.array_join(kept_arr, "\n")
    n_sent = F.regexp_count(joined, F.lit('[.!?]'))
    lower_all = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    page_ok = (~lower_all.contains("lorem ipsum")
               & ~lower_all.contains("{")
               & (n_sent >= min_sentences))
    # filter(trim) on the raw array counts non-blank source lines
    n_lines = F.size(F.filter(lines, lambda l: l != ""))
    return docs.select(
        did,
        joined.alias("text"),
        n_lines.cast("int").alias("n_lines"),
        F.size(kept_arr).cast("int").alias("n_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        page_ok.alias("page_kept"))


def mix_sources(docs: DataFrame, weights: dict, strata_col: str,
                id_col: str = "doc_id", text_col: str = "text",
                budget_tokens: int | None = None, salt: str = "",
                rates_out: dict | None = None) -> DataFrame:
    """Deterministic source mixing to a token budget (the data-mixture
    step before tokenization: "20% code, 30% web, 50% books"):
    ``weights`` maps stratum value -> target fraction of the sampled
    token mass. Keep-rates are derived from the corpus's actual
    per-stratum token counts, then applied with the content-addressed
    stratified sampler — so the mixture is reproducible across runs,
    layouts, and engines, and rebalancing is a one-line weight change.

    ``budget_tokens`` caps total sampled tokens; omitted, the budget is
    the LARGEST achievable under the weights (the binding stratum keeps
    rate 1.0). Weights are normalized over the strata present; a weight
    on a stratum with zero tokens raises (the mixture is unachievable,
    and silently renormalizing would mis-state every other proportion).
    Sampling is doc-level, so per-stratum token mass matches the target
    in expectation (exact-mass packing would need per-doc knapsack).
    ``rates_out``, if given, receives {stratum: keep_rate} plus the
    resolved budget under key ``None`` for audit.

    Scale shape: one map-side-combined aggregate over (stratum) to get
    token counts — the collect is len(weights) rows — then the same
    zero-shuffle hash filter as stratified_hash_sample.
    """
    from .textstats import token_count_col
    if any(w < 0 for w in weights.values()):
        raise ValueError("mix_sources: weights must be >= 0")
    # weight 0.0 is the natural spelling of "exclude this stratum"
    weights = {k: w for k, w in weights.items() if w > 0}
    if not weights:
        raise ValueError("mix_sources: no stratum has a positive weight")
    total_w = sum(weights.values())
    target = {k: w / total_w for k, w in weights.items()}
    counts = {r["_s"]: r["_tok"] for r in (docs
              .filter(F.col(strata_col).isin(list(weights)))
              .groupBy(F.col(strata_col).alias("_s"))
              .agg(F.sum(token_count_col(text_col)).alias("_tok"))
              .collect())}
    missing = [k for k in weights if not counts.get(k)]
    if missing:
        raise ValueError(
            f"mix_sources: strata {missing} have no tokens in the "
            f"corpus; the requested mixture is unachievable")
    # the binding stratum: smallest tokens/weight ratio caps the budget
    max_budget = min(counts[k] / target[k] for k in weights)
    budget = (min(budget_tokens, max_budget)
              if budget_tokens is not None else max_budget)
    rates = {k: min(1.0, (target[k] * budget) / counts[k])
             for k in weights}
    if rates_out is not None:
        rates_out.update(rates)
        rates_out[None] = int(budget)
    return stratified_hash_sample(docs, rates, strata_col, id_col,
                                  default_rate=0.0, salt=salt)
