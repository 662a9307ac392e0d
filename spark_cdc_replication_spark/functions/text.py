"""Native (JVM-side) text-analysis expressions.

Everything here is built from ``pyspark.sql.functions`` so the hot path
stays inside whole-stage codegen — no Python UDFs.  Each expression has
a documented ANSI-SQL twin used by the DuckDB oracles in
``workloads/llmdata.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny English stopword list for the language-ID / quality heuristics.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: Exactly Java regex ``\s`` (no UNICODE_CHARACTER_CLASS): space, tab,
#: LF, vertical tab, form feed, CR — the set ``btrim`` strips below.
_WS_CHARS = " \t\n\x0b\f\r"


def ws_trimmed(col: str | Column) -> Column:
    """Strip leading/trailing WHITESPACE (all of ``\\s``, not just the
    space character ``trim`` handles): a doc ending in a newline —
    nearly every real text file — would otherwise keep the ``\\n``,
    and ``split('\\s+')`` keeps leading/trailing empties, producing a
    phantom ''-token that inflates every raw-word stat (code review
    r8).  Implemented as ``btrim`` over the ``\\s`` character set — a
    JVM intrinsic touching only the string ends — because the first
    cut's ``regexp_replace(text, '^\\s+|\\s+$', '')`` scanned (and
    backtracked) the FULL text of every document: measured 1.6x on a
    pure token-count scan at sf1, and it is on the hot path of every
    raw-word stat.  SQL twin (oracle side, equivalent on ``\\s``):
    ``regexp_replace(text, '^\\s+|\\s+$', '', 'g')``."""
    return F.btrim(_c(col), F.lit(_WS_CHARS))


def words(col: str | Column) -> Column:
    """Whitespace tokenizer.  SQL twin:
    ``string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
    '\\s+')`` (DuckDB)."""
    return F.split(ws_trimmed(col), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count; blank (incl. whitespace-only) text
    counts 0."""
    return F.when(F.length(ws_trimmed(col)) == 0, F.lit(0)).otherwise(
        F.size(words(col))
    )


def bpe_ish_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, single other
    non-space chars.  SQL twin: ``len(regexp_extract_all(text,
    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))``."""
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )


def count_matching(words_col: Column, values: tuple[str, ...]) -> Column:
    """``size(filter(words, w -> w IN (...)))`` — counts tokens that are
    members of ``values`` (duplicates counted, unlike array_intersect).
    SQL twin: ``len(list_filter(words, w -> w IN (...)))``."""
    return F.size(F.filter(words_col, lambda w: w.isin(*values)))


def stopword_ratio(col: str | Column) -> Column:
    """Stopword tokens / total tokens (NULL-safe on blank text)."""
    w = words(col)
    return count_matching(w, STOPWORDS) / F.nullif(F.size(w), F.lit(0))


def punct_ratio(col: str | Column) -> Column:
    """Punctuation chars / total chars.  SQL twin:
    ``len(regexp_extract_all(text,'[^A-Za-z0-9\\s]')) / nullif(length(text),0)``."""
    n_punct = F.size(F.regexp_extract_all(_c(col), F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    return n_punct / F.nullif(F.length(_c(col)), F.lit(0))


def normalized(col: str | Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim.
    SQL twin: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.

    md5 is identical across Spark and DuckDB, so this is fully
    oracle-checkable (unlike xxhash64, whose implementations differ)."""
    return F.md5(normalized(col))
