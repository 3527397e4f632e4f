"""PII / URL scrubbing: regex redaction with per-category counts.

The privacy-filtering pass of a training-data pipeline (C4/RefinedWeb
style): replace URLs, e-mail addresses, IPv4 literals, and long digit
runs (phone/account/CC-shaped) with typed sentinels, and report how
many of each were found per document. The reference has no text stack;
extension surface.

Cross-engine regex discipline: every pattern is written in the
intersection of Java `java.util.regex` (Spark) and RE2 (DuckDB) —
character classes, bounded repetition, alternation-free, no
lookaround (RE2 has none), no backreferences. Counts are taken BEFORE
each stage's replacement on the stage's input text, and stages apply
in a fixed order (URL -> EMAIL -> IP -> NUM) so later patterns can
never re-match inside an earlier sentinel (sentinels contain no
digits, dots, @ or //).

Scale shape: a pure per-row projection — zero shuffles, regex runs
inside whole-stage codegen on the JVM; at 100 TB this is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns: identical semantics in Java regex and RE2 (see module doc).
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
LONGNUM_RE = r"[0-9]{9,}"

STAGES: tuple[tuple[str, str, str], ...] = (
    ("n_urls", URL_RE, "<URL>"),
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ips", IPV4_RE, "<IP>"),
    ("n_longnums", LONGNUM_RE, "<NUM>"),
)


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """Append per-category match counts and the fully redacted text."""
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pattern, sentinel in STAGES:
        counts.append(_count(cur, pattern).alias(name))
        cur = F.regexp_replace(cur, pattern, sentinel)
    return df.select("*", *counts, cur.alias(out_col))
