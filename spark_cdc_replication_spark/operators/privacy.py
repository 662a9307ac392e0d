"""PII detection / redaction for training corpora ([EXT]).

Regex-based scrubbing of the classic personally-identifying patterns
(emails, IPv4 addresses, phone numbers) — the standard pre-training
hygiene pass.  Everything is native ``regexp_extract_all`` /
``regexp_replace`` (whole-stage codegen, zero Python), and each
pattern has an exact DuckDB twin so the workload query is fully
oracle-checkable.

The pattern set is deliberately small and dialect-portable (no
lookarounds, no word-boundary semantics that differ between Java
regex and RE2); production deployments extend ``PII_PATTERNS`` with
locale-specific entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: name -> (pattern, replacement).  Ordered: redaction applies top to
#: bottom (emails first so their domains aren't half-eaten by other
#: rules).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    "phone": (r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
}


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts plus the fingerprint of the fully
    redacted text.

    Output: ``(id_col, n_email, n_ipv4, n_phone, redacted_fp)`` where
    ``redacted_fp = md5(text with every pattern replaced)`` — the md5
    pins the exact redaction output without shipping document bodies
    through the result, and is engine-portable (unlike xxhash64).

    One scan, one projection: counting and redaction are row-local, so
    this parallelizes embarrassingly at any corpus size.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    redacted = F.col(text_col)
    for pat, repl in PII_PATTERNS.values():
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(F.col(id_col), *counts, F.md5(redacted).alias("redacted_fp"))


def redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every ``PII_PATTERNS`` match in ``text_col`` in place —
    the write-path twin of :func:`pii_stats` for producing the cleaned
    corpus itself."""
    redacted = F.col(text_col)
    for pat, repl in PII_PATTERNS.values():
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.withColumn(text_col, redacted)
