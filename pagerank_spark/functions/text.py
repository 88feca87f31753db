"""Text expression helpers — portable (exact ANSI-SQL equivalents
exist; the DuckDB oracles in ``__spark_entry__.py`` mirror them)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def occurrences(col: Column, needle: str) -> Column:
    """Occurrence count of a literal substring via length-replace
    arithmetic (no regex, exact in every SQL dialect)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def word_occurrences(col: Column, word: str) -> Column:
    """EXACT whole-word occurrence count: tokenize on any whitespace and
    count equal tokens. (A replace-based count misses newline-delimited
    words and adjacent repeats sharing a delimiter.) Portable: DuckDB's
    ``len(list_filter(string_split_regex(...), x -> x = w))`` is
    identical."""
    return F.size(
        F.filter(F.split(col, r"\s+"), lambda x: x == F.lit(word))
    ).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/whitespace-only text counts 0
    (``split('')`` returns ``['']`` — guard the off-by-one)."""
    return (
        F.when(F.trim(col) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(col), r"\s+")))
        .cast("long")
    )


def hash64(col: Column, fn: str = "xxhash64") -> Column:
    """64-bit string hash as a Spark long, in one of two modes:

    - ``"xxhash64"`` (default): Spark's native JVM hash — the fast
      production path, but Spark-specific (no DuckDB equivalent).
    - ``"md5"``: the top 60 bits of md5 as a non-negative long —
      portable: ``CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)`` in
      DuckDB yields the identical value, so fingerprint/MinHash/SimHash
      pipelines built on it are value-checkable cross-engine. 15 hex
      chars (not 16) keeps the value inside a SIGNED 64-bit int —
      ANSI-safe in both engines.
    """
    if fn == "xxhash64":
        return F.xxhash64(col)
    if fn == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash fn {fn!r} (use 'xxhash64' or 'md5')")


def shingles(col: Column, k: int) -> Column:
    """k-token shingles of a text column as ``array<string>``."""
    tokens = F.split(col, r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k)))
