"""PII detection and redaction (the Dolma / CCNet pre-release scrub):
emails, IPv4 addresses, and US-shaped phone numbers found by regex,
counted per document and maskable in place.

These are the published heuristic patterns, with the published caveats:
regex PII detection trades recall for zero model cost — version strings
can look like IPs, international phone formats are out of scope, and
names/addresses need an NER model this container doesn't ship. The mask
strings are Dolma's public ``|||EMAIL_ADDRESS|||`` convention so
downstream tokenizer special-casing matches.

Patterns use Java-regex features (lookarounds, \\b) — these operators
are pytest-pinned, not DuckDB-oracled, so RE2 parity is NOT maintained
here (unlike textstats.BPE_TOKEN_RE).

Scale shape: both operators are a single codegen projection
(regexp_count / chained regexp_replace), zero shuffle, trivially
partition-parallel — at 100 TB they run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9][A-Za-z0-9.\-]*\.[A-Za-z]{2,}"
# octet-exact, digit-bounded so 1.2.3.4000 or 12.3.4.5.6 runs don't match
_OCT = r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
# trailing boundary matches PHONE_RE's: a bare dot may follow (sentence-
# final "connect to 1.2.3.4." still redacts) but a dot-digit may not
# ("1.2.3.4.5" version runs stay unmatched) — ADVICE r7
IPV4_RE = rf"(?<![0-9.]){_OCT}\.{_OCT}\.{_OCT}\.{_OCT}(?!\.?[0-9])"
# US-shaped: optional (area), first separator optional (covers
# "(555)123-4567"), second required so bare 10-digit runs (ids,
# timestamps) never match. Bounded by digits AND dot-digit on both
# ends: "3.141 592.6535" must not yield a phone starting after the
# decimal point, and "555 123.4567.89" must not steal a decimal's
# integer part — but a sentence-final "...-4567." still matches.
PHONE_RE = (r"(?<![0-9])(?<!\.)"
            r"\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}(?!\.?[0-9])")

MASKS = {"email": "|||EMAIL_ADDRESS|||", "ipv4": "|||IP_ADDRESS|||",
         "phone": "|||PHONE_NUMBER|||"}
# email first (an address can embed digit runs), then the stricter ipv4,
# then phone (never spans an already-masked token)
_ORDERED = [("email", EMAIL_RE), ("ipv4", IPV4_RE), ("phone", PHONE_RE)]


def pii_signals(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, has_pii) per document —
    the release-gate signal (filter or route to redaction)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = {k: F.regexp_count(text, F.lit(p)) for k, p in _ORDERED}
    return docs.select(
        F.col(id_col),
        counts["email"].cast("int").alias("n_emails"),
        counts["ipv4"].cast("int").alias("n_ipv4"),
        counts["phone"].cast("int").alias("n_phones"),
        (counts["email"] + counts["ipv4"] + counts["phone"] > 0)
        .alias("has_pii"))


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               masks: dict | None = None) -> DataFrame:
    """(doc_id, text, n_redacted): every detected span replaced by its
    mask string, in detection order (emails before IPs before phones so
    later patterns can't re-match inside earlier spans). NULL text
    stays NULL; ``n_redacted`` counts replaced spans for loss/audit
    accounting, the same convention as the other corpus operators."""
    masks = {**MASKS, **(masks or {})}
    text = F.col(text_col)
    total = F.lit(0)
    for kind, pattern in _ORDERED:
        total = total + F.when(
            text.isNull(), F.lit(0)).otherwise(
            F.regexp_count(text, F.lit(pattern)))
        # quoteReplacement: a caller mask containing '\' or '$' must be
        # literal, not a Java group reference (unescaped '$1' throws at
        # runtime mid-corpus)
        mask = masks[kind].replace("\\", "\\\\").replace("$", "\\$")
        text = F.regexp_replace(text, pattern, mask)
    return docs.select(
        F.col(id_col),
        text.alias("text"),
        total.cast("int").alias("n_redacted"))
