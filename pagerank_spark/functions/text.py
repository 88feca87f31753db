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
    """Whole-word occurrence count (space-delimited tokens)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return occurrences(padded, f" {word} ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+")).cast("long")


def shingles(col: Column, k: int) -> Column:
    """k-token shingles of a text column as ``array<string>``."""
    tokens = F.split(col, r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k)))
