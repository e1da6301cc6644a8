"""Text analysis operators: token counts, quality scoring, language-id,
document fingerprints. All native Spark SQL expressions (JVM-side,
whole-stage codegen); language-id is a pure column expression too —
an n-gram/stopword-marker heuristic, no model download."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Small deterministic English stopword list (public, standard function words)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
    "from", "have", "has", "not", "but", "they", "you", "his", "her",
]

# Marker words per language for the heuristic language-id
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "que", "por"],
}


# explicit charclass instead of \s: Java regex \s includes \x0B,
# RE2 (the DuckDB oracles, Go) does not — spelling out ASCII whitespace
# keeps Spark and oracle tokenization identical on every byte. THE
# single source of truth: dedup/decontam import these so a future edit
# cannot silently diverge their tokenization from the text stats.
ASCII_WS_CHARS = " \t\n\x0B\f\r"
ASCII_WS_RE = "[" + ASCII_WS_CHARS + "]+"


def _tokens(text_col: str) -> F.Column:
    return F.split(F.trim(F.col(text_col)), ASCII_WS_RE)


def token_count_col(text_col: str) -> F.Column:
    return F.size(_tokens(text_col))


# GPT-2-style pre-tokenizer shape (contractions, letter runs, digit runs,
# punctuation runs, each optionally space-prefixed) — kept to syntax both
# Java regex (Spark) and RE2 (DuckDB oracle) interpret identically:
# no lookarounds, no unicode property classes, and no \s (Java's
# includes \x0B, RE2's does not — ASCII whitespace spelled out instead,
# as literal control characters, which both class syntaxes accept).
BPE_TOKEN_RE = ("'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                "| ?[^A-Za-z0-9 \t\n\x0b\f\r]+")


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, chars_per_bpe_token) — the two
    token-count bases an LLM-data pipeline budgets with: whitespace words
    and a BPE-ish subword proxy (regexp_count stays in whole-stage codegen;
    no Python tokenizer in the hot path)."""
    n_ws = F.size(_tokens(text_col))
    n_bpe = F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE))
    return docs.select(
        F.col(id_col),
        n_ws.cast("int").alias("n_ws_tokens"),
        n_bpe.cast("int").alias("n_bpe_tokens"),
        F.round(F.length(text_col).cast("double")
                / F.greatest(n_bpe, F.lit(1)), 6).alias("chars_per_bpe_token"))


def text_quality(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, stopword_ratio,
    punct_ratio, digit_ratio, quality_score). Length/punct/stopword-ratio
    quality scoring per the training-data-pipeline spec."""
    tokens = _tokens(text_col)
    n_tokens = F.size(tokens)
    n_chars = F.length(F.col(text_col))
    avg_len = F.round(
        F.aggregate(tokens, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t)).cast("double")
        / F.greatest(n_tokens, F.lit(1)), 6)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, F.lower(t))))
    # raw (unrounded) ratios feed the composite so the score never sits on
    # a decimal rounding boundary; reported columns are rounded copies
    stop_raw = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[,.!?:;]", ""))
    punct_raw = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    n_digit = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    digit_raw = n_digit.cast("double") / F.greatest(n_chars, F.lit(1))
    # simple composite: longer docs with some stopwords and few digits score higher
    quality = F.round(
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_raw * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(digit_raw * F.lit(10.0), F.lit(1.0))) * 0.2, 6)
    return docs.select(
        F.col(id_col),
        n_tokens.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars"),
        avg_len.alias("avg_token_len"),
        F.round(stop_raw, 6).alias("stopword_ratio"),
        F.round(punct_raw, 6).alias("punct_ratio"),
        F.round(digit_raw, 6).alias("digit_ratio"),
        quality.alias("quality_score"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, fp_md5, fp_poly) — md5 of whitespace-normalized text plus an
    order-sensitive polynomial rolling hash over token lengths, computed
    mod 1e9+7 so the arithmetic is portable (no ANSI int64 overflow)."""
    norm = F.concat_ws(" ", _tokens(text_col))
    fp_md5 = F.md5(F.encode(norm, "UTF-8"))
    fp_poly = F.aggregate(
        _tokens(text_col), F.lit(7).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31).cast("long")
                              + F.length(t).cast("long"),
                              F.lit(1000000007).cast("long")))
    return docs.select(F.col(id_col), fp_md5.alias("fp_md5"),
                       fp_poly.alias("fp_poly"))


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — heuristic: CJK char ratio → zh, else the
    language whose marker-word hit count is highest (ties: en)."""
    tokens = F.transform(_tokens(text_col), F.lower)
    n_cjk = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[一-鿿]", ""))
    def _marker_score(markers):
        arr = F.array(*[F.lit(w) for w in markers])
        return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))

    scores = {lang: _marker_score(markers)
              for lang, markers in LANG_MARKERS.items()}
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("de", "fr", "es"):
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    pred = F.when(n_cjk * 4 > F.length(F.col(text_col)), F.lit("zh")).otherwise(best)
    return docs.select(F.col(id_col), pred.alias("pred_lang"))


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       ngram_ns: tuple = (2, 3, 4)) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1)
    — the quality signals that catch boilerplate/spam pages C4-style
    ratio filters miss: documents dominated by REPEATED lines,
    paragraphs, or n-grams.

    Per document: (n_lines, n_paras, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac, top_{n}gram_char_frac per n).

    - dup_*_frac: fraction of lines/paragraphs that are repeats of an
      earlier one ((count − distinct) / count). Lines split on "\\n",
      paragraphs on "\\n\\n", blank-after-trim entries dropped.
    - dup_*_char_frac: fraction of line/paragraph characters sitting in
      those repeats ((total chars − distinct-entry chars) / total).
    - top_{n}gram_char_frac: characters covered by the MOST frequent
      word n-gram (count × gram length / total text chars); ties break
      deterministically by (count, covered chars, gram) descending.

    Scale shape: line/paragraph signals are pure row-local array
    expressions (whole-stage codegen, no shuffle). The n-gram signals
    explode one row per (doc, n, gram) — the same explode + two-level
    hash-aggregate shape as vocab_topk, with map-side partial counts —
    then a per-(doc, n) struct-max and a pivot back to columns; shuffle
    keyed on (doc, n, gram), never all-pairs.
    """
    did = F.col(id_col)
    # NULL text means every signal is 0, not NULL — and the DuckDB
    # oracle coalesces the same way, so the two engines can't diverge
    # on a nullable text column
    text = F.coalesce(F.col(text_col), F.lit(""))

    def _dup(arr):
        n = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        chars = F.aggregate(arr, F.lit(0).cast("long"),
                            lambda a, x: a + F.length(x))
        chars_d = F.aggregate(F.array_distinct(arr),
                              F.lit(0).cast("long"),
                              lambda a, x: a + F.length(x))
        frac = F.round((n - nd).cast("double")
                       / F.greatest(n, F.lit(1)), 6)
        cfrac = F.round((chars - chars_d).cast("double")
                        / F.greatest(chars, F.lit(1)).cast("double"), 6)
        return n, frac, cfrac

    lines = F.filter(F.split(text, "\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    paras = F.filter(F.split(text, "\n\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    n_lines, dl, dlc = _dup(lines)
    n_paras, dp, dpc = _dup(paras)
    base = docs.select(
        did, F.length(text).alias("_chars"),
        n_lines.cast("int").alias("n_lines"),
        n_paras.cast("int").alias("n_paras"),
        dl.alias("dup_line_frac"), dlc.alias("dup_line_char_frac"),
        dp.alias("dup_para_frac"), dpc.alias("dup_para_char_frac"))

    # One scan for every n: per-n (n, gram) struct arrays are built in a
    # single projection and flattened before ONE explode — a per-n
    # union would re-execute the whole upstream plan len(ngram_ns)
    # times when docs is the output of an expensive pipeline stage.
    tokens = F.split(F.trim(text), r"\s+")

    def _gram_structs(n):
        return F.when(
            F.size(tokens) >= n,
            F.transform(F.sequence(F.lit(0), F.size(tokens) - n),
                        lambda i: F.struct(
                            F.lit(n).alias("_n"),
                            F.concat_ws(" ", F.slice(tokens, i + 1, n))
                            .alias("gram")))
        ).otherwise(F.array().cast("array<struct<_n:int,gram:string>>"))

    exploded = (docs.select(
        did, F.explode(F.flatten(F.array(
            *[_gram_structs(n) for n in ngram_ns]))).alias("_g"))
        .select(did, F.col("_g._n").alias("_n"),
                F.col("_g.gram").alias("gram")))
    counts = exploded.groupBy(id_col, "_n", "gram").agg(
        F.count("*").alias("_c"))
    # lexicographic struct max == ORDER BY c DESC, chars DESC, gram DESC
    top = (counts
           .withColumn("_chars_cov", F.col("_c") * F.length("gram"))
           .groupBy(id_col, "_n")
           .agg(F.max(F.struct("_c", "_chars_cov", "gram")).alias("_t")))
    pivoted = (top.groupBy(id_col)
               .pivot("_n", list(ngram_ns))
               .agg(F.first("_t._chars_cov")))
    out = base.join(pivoted, id_col, "left")
    cols = [F.col(id_col), "n_lines", "n_paras",
            "dup_line_frac", "dup_line_char_frac",
            "dup_para_frac", "dup_para_char_frac"]
    for n in ngram_ns:
        # least(1.0): overlapping occurrences overcount characters (the
        # published count x len definition can exceed the text length —
        # "x y x y x y" has two overlapping "x y x y", 14 covered chars
        # in an 11-char text); clamp so the column stays a fraction
        cols.append(F.round(F.least(
            F.lit(1.0),
            F.coalesce(F.col(str(n)), F.lit(0)).cast("double")
            / F.greatest(F.col("_chars"), F.lit(1)).cast("double")), 6)
            .alias(f"top_{n}gram_char_frac"))
    return out.select(*cols)


def vocab_topk(docs: DataFrame, k: int = 100, id_col: str = "doc_id",
               text_col: str = "text",
               lowercase: bool = True) -> DataFrame:
    """Global vocabulary: the k most frequent whitespace tokens with
    counts and corpus rank — (rank, token, n_occurrences, n_docs).

    The classic pre-tokenizer pipeline step (frequency-ordered vocab /
    stopword discovery). Scale shape: explode + two-level hash aggregate
    — map-side partial counts collapse each partition's token
    multiplicities before the shuffle, so the shuffle carries one row
    per (partition, distinct token), and the final top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    full sort. Ties rank by token ascending, deterministically.
    """
    tok = F.explode(_tokens(text_col)).alias("token")
    toks = docs.select(F.col(id_col).alias("_d"), tok)
    if lowercase:
        toks = toks.select("_d", F.lower(F.col("token")).alias("token"))
    counts = (toks.groupBy("token")
              .agg(F.count("*").alias("n_occurrences"),
                   F.countDistinct("_d").alias("n_docs")))
    top = (counts
           .orderBy(F.desc("n_occurrences"), F.col("token"))
           .limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("n_occurrences"), F.col("token"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "token", "n_occurrences", "n_docs")


def unigram_cross_entropy(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          lowercase: bool = True) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram LM —
    the CCNet-style statistical quality score (perplexity bucketing):
    documents full of rare gibberish score high, documents of common
    fluent text score low; downstream filters threshold or stratify on
    it. ``perplexity = exp(cross_entropy)``.

    Returns (id, n_tokens, cross_entropy): ``n_tokens`` counts the
    doc's (lowercased) whitespace tokens — the same tokenization as
    vocab_topk, minus the empty pseudo-token that splitting an
    empty/whitespace-only text yields (left in the LM it would inflate
    N and shift EVERY document's score) — and ``cross_entropy`` is
    ``-(1/n) * sum_t log p(t)`` with ``p(t) = corpus_count(t) / N``,
    NULL for token-less documents (every doc still gets a row).

    Reproducibility: per-token log-probabilities are rounded to 9
    decimals and accumulated as DECIMAL(20,9) fixed-point, so the score
    is bit-identical across partition layouts, shuffle orders, and
    engines — a float sum over a reshuffled corpus is not (the
    embedding_centroids lesson). The final mean is one double division
    rounded to 6 decimals. Per-doc term frequencies must fit
    DECIMAL(10,0) (one token repeated < 1e10 times within a single
    document).

    Scale shape: two-level map-side-combined aggregates throughout.
    Raw tokens collapse to distinct (doc, token) term frequencies
    BEFORE any join, so the LM join moves one row per distinct pair,
    not one per token occurrence; the 1-row corpus total is an
    explicit broadcast. Stopword skew on the token-keyed join is
    bounded by the tf side being distinct-per-doc (≤ n_docs rows per
    token) and left to AQE's skew handling.
    """
    did = F.col(id_col)
    toks = (docs.select(did, F.explode(_tokens(text_col)).alias("token"))
            .filter(F.col("token") != ""))
    if lowercase:
        toks = toks.select(did, F.lower(F.col("token")).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    cf = tf.groupBy("token").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("n_total"))
    lm = (cf.join(F.broadcast(total))
          .select("token",
                  F.round(F.log(F.col("cf").cast("double")
                                / F.col("n_total").cast("double")), 9)
                  .cast("decimal(20,9)").alias("lp")))
    scored = (tf.join(lm, "token")
              .groupBy(id_col)
              .agg(F.sum("tf").alias("n_tokens"),
                   F.sum(F.col("tf").cast("decimal(10,0)")
                         * F.col("lp")).alias("lp_sum")))
    return (docs.select(did).join(scored, id_col, "left")
            .select(did,
                    F.coalesce("n_tokens", F.lit(0)).cast("bigint")
                    .alias("n_tokens"),
                    F.round(-F.col("lp_sum").cast("double")
                            / F.col("n_tokens").cast("double"), 6)
                    .alias("cross_entropy")))
