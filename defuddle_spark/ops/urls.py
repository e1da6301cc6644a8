"""URL canonicalization and URL-level dedup (the crawl-frontier /
re-crawl collapse every web corpus runs before content dedup: the same
page arrives as http/https, with/without www, with tracking params, in
any query-param order, with or without a fragment).

Canonical form: lowercase scheme and host, optional www. strip, default
ports dropped (http:80 / https:443), userinfo dropped, trailing path
slashes trimmed, fragment dropped, tracking params removed, surviving
query params sorted. Unparseable URLs canonicalize to their trimmed
original (identity fallback) so no row is lost.

Scale shape: canonicalization is one codegen projection built from
try_parse_url + array higher-order functions — zero shuffle;
dedup_by_url is the dedup_exact shape (one groupBy on the canonical
string with map-side partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Public cross-site tracking params (the adblock/ClearURLs core set);
# compared against the LOWERCASED key, exact match only.
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "gclid", "gbraid", "wbraid", "fbclid", "msclkid", "mc_cid",
    "mc_eid", "igshid", "yclid", "ref_src", "ref_url", "_ga", "_gl",
    "spm", "mkt_tok",
]

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonical_url_col(url_col: str = "url", strip_www: bool = True,
                      tracking_params: list | None = None) -> F.Column:
    """Column expression for the canonical form of ``url_col``."""
    tracking = [p.lower() for p in (tracking_params if tracking_params
                                    is not None else TRACKING_PARAMS)]
    url = F.col(url_col)
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, ":([0-9]+)$", 1)
    default_port = F.lit("")
    for scheme, p in _DEFAULT_PORTS.items():
        default_port = F.when(proto == scheme, F.lit(p)) \
                        .otherwise(default_port)
    port_part = F.when((port == "") | (port == default_port), F.lit("")) \
                 .otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")),
        "/+$", "")
    kept_params = F.array_sort(F.filter(
        F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")),
                "&"),
        lambda p: (p != "") & ~F.lower(F.substring_index(p, "=", 1))
        .isin(tracking)))
    query = F.array_join(kept_params, "&")
    query_part = F.when(query == "", F.lit("")) \
                  .otherwise(F.concat(F.lit("?"), query))
    rebuilt = F.concat(proto, F.lit("://"), host, port_part, path,
                       query_part)
    return F.when(proto.isNull() | host.isNull() | (host == ""),
                  F.trim(url)).otherwise(rebuilt)


def canonicalize_urls(docs: DataFrame, url_col: str = "url",
                      strip_www: bool = True,
                      tracking_params: list | None = None) -> DataFrame:
    """Append ``canonical_url`` to ``docs``."""
    return docs.withColumn(
        "canonical_url",
        canonical_url_col(url_col, strip_www, tracking_params))


def dedup_by_url(docs: DataFrame, id_col: str = "doc_id",
                 url_col: str = "url", strip_www: bool = True,
                 tracking_params: list | None = None) -> DataFrame:
    """URL-level duplicates: keeps the lowest id per canonical URL.

    Returns (doc_id, canonical_url, dup_count) for surviving
    representatives — the dedup_exact contract keyed on the canonical
    URL instead of the content hash. Docs whose canonical form is NULL
    or empty (missing/blank url metadata) are NOT a dup group: each
    keeps its own row with dup_count 1 — a crawl shard with absent urls
    must never collapse to a single survivor.
    """
    canon = canonical_url_col(url_col, strip_www, tracking_params)
    # group key: the canonical URL, or a per-doc sentinel when there is
    # no usable URL ("\0" cannot appear in a parse_url rebuild)
    key = F.coalesce(F.nullif(canon, F.lit("")),
                     F.concat(F.lit("\x00"), F.col(id_col).cast("string")))
    return (docs
            .select(F.col(id_col), canon.alias("canonical_url"),
                    key.alias("_key"))
            .groupBy("_key")
            .agg(F.min(id_col).alias(id_col),
                 F.max("canonical_url").alias("canonical_url"),
                 F.count("*").cast("int").alias("dup_count"))
            .select(id_col, "canonical_url", "dup_count"))


def domain_stats(docs: DataFrame, url_col: str = "url",
                 text_col: str = "text", strip_www: bool = True) -> DataFrame:
    """Per-domain corpus audit: (domain, n_docs, n_tokens, doc_share,
    token_share), descending by tokens — the first thing to look at
    after a crawl lands (boilerplate farms and SEO spam show up as
    token-heavy domains) and the input to per-domain caps or blocklist
    decisions. ``domain`` is the lowercased host (www-stripped by
    default); docs with no parseable host group under NULL.

    Scale shape: one codegen projection + one map-side-combined groupBy
    on the host; the share columns divide by grand totals computed with
    a single-row broadcast join (never a window over the whole corpus).
    """
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    from .textstats import token_count_col
    per = (docs
           .select(host.alias("domain"),
                   token_count_col(text_col).alias("_tok"))
           .groupBy("domain")
           .agg(F.count("*").alias("n_docs"),
                F.sum("_tok").alias("n_tokens")))
    totals = per.agg(F.sum("n_docs").alias("_td"),
                     F.sum("n_tokens").alias("_tt"))
    return (per.crossJoin(F.broadcast(totals))
            .select("domain", "n_docs",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.round(F.col("n_docs") / F.col("_td"), 6)
                    .alias("doc_share"),
                    F.round(F.col("n_tokens") / F.col("_tt"), 6)
                    .alias("token_share"))
            .orderBy(F.desc("n_tokens"), "domain"))
