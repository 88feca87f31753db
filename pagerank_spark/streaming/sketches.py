"""Streaming cardinality sketches — windowed HyperLogLog uniques.

Extension surface (the C reference is batch-only, SURVEY.md §2.2): the
standard "distinct users per window, forever, in bounded state" stream
problem. An exact windowed ``count(distinct user_id)`` carries one
state row per (window, user) — unbounded in the user dimension; the
HLL register table carries exactly ``m = 2^p`` rows per window
regardless of how many distinct users the window sees, and the
watermark expires whole windows — the canonical bounded-state shape
for a 100 TB/day event stream.

Two deliberate design points:

- **Order independence.** The per-register reduction is ``max`` — a
  commutative, idempotent monoid — so the drained result is invariant
  to micro-batch boundaries, partitioning, AND arrival order. The
  streaming result equals the batch computation bit-for-bit, which is
  what makes this gate value-checkable (unlike order-sensitive
  sketches, e.g. Misra-Gries counters, whose state depends on batch
  cut points).
- **Portable hashing.** ``hash_fn="md5"`` derives register index and
  rank from the same 60-bit md5 value the HyperANF oracle replays
  (``functions.text.hash64``), so a DuckDB oracle recomputes every
  register and the estimate exactly. ``xxhash64`` is the fast
  production twin (value masked to 60 bits so the arithmetic is
  identical).

Register placement and estimator follow Flajolet et al. 2007 (HLL)
with the small-range linear-counting rule, matching
``operators/anf.py`` (``hyper_anf``)'s arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions.text import hash64


def _alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def _register_cols(key: Column, p: int, hash_fn: str) -> tuple[Column, Column]:
    """(j, rho) from the 60-bit hash of ``key``: j = low p bits' bucket
    (h % m), rho = 1-based position of the lowest set bit of h >> p
    (60-p+1 when the remainder is all zeros)."""
    bits = 60
    h = hash64(key.cast("string"), hash_fn)
    if hash_fn == "xxhash64":
        # mask to the same non-negative 60-bit domain as md5 (bitwise,
        # not abs: abs(Long.MIN_VALUE) overflows under ANSI mode)
        h = h.bitwiseAND(F.lit((1 << bits) - 1))
    m = 1 << p
    rest = F.shiftright(h, p)
    rho = (
        F.when(rest == 0, F.lit(bits - p + 1))
        .otherwise(F.bit_count((rest.bitwiseAND(-rest)) - 1) + 1)
        .cast("int")
    )
    return (h % m).cast("int").alias("j"), rho.alias("rho")


def windowed_hll_registers(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming register table ``(window_start, j, rho)`` — the HLL
    max-register per tumbling window. Works identically on a batch
    DataFrame (the gate oracle IS the batch run). State: m rows per
    live window, expired by the watermark.
    """
    j, rho = _register_cols(F.col(key_col), p, hash_fn)
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.select(F.window("ts", window).alias("w"), j, rho)
        .groupBy(F.col("w.start").alias("window_start"), "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, p: int, group_cols: list[str] | None = None
) -> DataFrame:
    """HLL cardinality estimate per group from a register table —
    ``(<group_cols>, uniques_est)``. Flajolet alpha bias correction +
    the small-range linear-counting rule; absent registers count as
    zeros (2^0 terms), exactly like ``operators/anf.py``.

    Batch post-processing over m rows per group — runs on the drained
    stream table or any batch register frame.
    """
    group_cols = group_cols or ["window_start"]
    m = 1 << p
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
    )
    raw = F.lit(_alpha(m) * m * m) / (F.col("_s") + (F.lit(m) - F.col("_c")))
    zeros = F.lit(m) - F.col("_c")
    return agg.select(
        *group_cols,
        F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        )
        .otherwise(raw)
        .alias("uniques_est"),
    )
