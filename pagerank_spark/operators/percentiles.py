"""Grouped percentiles — exact and sketch-based.

Package-level API for the per-group quantile summaries the gate layer
previously computed inline (VERDICT r04 item 8): a link-graph /
training-data pipeline reports per-type value distributions (event
values, document lengths, quality scores) constantly, so the recipe
belongs in ``operators/``, not in a driver gate.

Two forms, one signature:

- **exact** (default): ``F.percentile`` — the ANSI ``quantile_cont``
  definition (linear interpolation on the sorted values). Spark
  evaluates it with a per-group sort, so the cost is a full shuffle +
  sort of the value column per group — the correct/delegated form when
  groups fit an executor, and the form every oracle can replay.
- **approx**: ``F.approx_percentile`` — Greenwald-Khanna ε-approximate
  quantiles with ``accuracy = 1/ε``. Bounded state per group
  (O(accuracy · log n) entries), map-side combinable, no sort — the
  100 TB path. Guarantee: the returned value's RANK is within
  ``n/accuracy`` of the requested rank (an ε-rank guarantee, NOT a
  value-distance guarantee — on heavy-tailed values the value gap at
  equal rank error can be large). At stream scale the engine's
  bounded-state alternatives are the HLL/top-k pair
  (``streaming/sketches.py``).

The C reference has no analytics surface at all (its output is a rank
vector, ``Page_Rank_SERIAL.c:280-300`` prints it); this is part of the
§2.3 extension family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["value_percentiles"]


def _col_name(p: float) -> str:
    # 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
    s = f"{p * 100:g}".replace(".", "_")
    return f"p{s}"


def value_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group percentile summary — ``DataFrame[*group_cols, n,
    p50, p90, p99, ...]`` (column names derived from
    ``probabilities``). ``approx=True`` switches the exact
    sort-based ``percentile`` for the Greenwald-Khanna sketch with
    rank error ≤ ``count/accuracy`` per group (see module docstring);
    ``n`` is exact in both forms. Empty ``group_cols`` gives one
    global row.
    """
    if not probabilities:
        raise ValueError("probabilities must be non-empty")
    for p in probabilities:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability {p} outside [0, 1]")
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    if approx:
        pct = F.approx_percentile(value_col, probs, F.lit(int(accuracy)))
    else:
        pct = F.percentile(value_col, probs)
    grouped = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n"), pct.alias("_p")
    )
    return grouped.select(
        *group_cols,
        "n",
        *[
            F.col("_p")[i].cast("double").alias(_col_name(p))
            for i, p in enumerate(probabilities)
        ],
    )
