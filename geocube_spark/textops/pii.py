"""PII detection and scrubbing for training-data curation.

Web-corpus pipelines redact personally identifiable information before
a document reaches a training mix. This module implements the standard
regex-family pass (emails, US-style SSNs, phone numbers, IPv4
addresses) as pure JVM Column expressions: detection is
``regexp_extract_all`` counts, scrubbing is a fixed-order
``regexp_replace`` chain. No Python workers, no shuffle — a narrow map
over the scan that whole-stage codegen fuses with the surrounding
projection, so it costs one pass over the text bytes at any scale.

The patterns are deliberately portable across regex engines (Java's
``java.util.regex`` on the Spark side, RE2 in DuckDB for the oracles):
character classes, ``\\b`` word boundaries, and bounded quantifiers
only — no backreferences or lookaround, which RE2 rejects.

Scrub order is fixed (email, SSN, phone, IPv4): replacement tokens
contain no digits, so an earlier replacement can never create a later
pattern, and the orderings where one raw pattern could shadow another
(an SSN's 3-2-4 digit groups vs a phone's 3-3-4) are disjoint by
construction.

The reference (corteva/geocube) has no text operators at all; this
belongs to the training-data-pipeline extension family alongside
``textops.analysis`` (quality/lang-id) and ``functions.dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) in scrub order. Patterns are valid and
# equivalent under both java.util.regex and RE2.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
)


def pii_counts(col: Column) -> dict:
    """Per-category match counts on the raw text (``n_<name>`` ints).

    Counted independently per pattern on the ORIGINAL text (the
    categories are mutually exclusive on raw text — see the module
    docstring), so the counts are stable regardless of scrub order.
    """
    return {
        f"n_{name}": F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def scrub_pii(col: Column) -> Column:
    """Redact every PII category, replacing matches with typed tokens
    (``<EMAIL>``, ``<SSN>``, ``<PHONE>``, ``<IPV4>``)."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def with_pii(df, text_col: str = "text", scrub: bool = True):
    """Append per-category PII counts (+ optionally a ``clean_text``
    scrubbed column) to ``df``. Narrow map, no shuffle."""
    col = F.col(text_col)
    out = df
    for name, expr in pii_counts(col).items():
        out = out.withColumn(name, expr)
    if scrub:
        out = out.withColumn("clean_text", scrub_pii(col))
    return out
