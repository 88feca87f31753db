"""Gap-based sessionization, batch flavor — pure window functions.

The batch twin of ``streaming.sessions.sessionize`` (the
``applyInPandasWithState`` stateful operator): a session is a maximal
run of one user's events with no gap larger than ``gap_minutes``
between consecutive events. Here the whole history is present, so the
operator is expressible entirely in JVM window functions — lag to find
breaks, a running sum to number sessions, then one aggregate — i.e.
whole-stage codegen, no Python, and exactly two shuffles (one
partition-by-user sort for the windows, one for the final group-by,
which AQE typically collapses since the keys share a prefix).

This shape is how a 100 TB backfill computes the same sessions the
streaming job maintains incrementally: same gap rule, same
deterministic (ts, order_col) event ordering.

Pure extension surface: the C reference is a batch graph kernel only
(SURVEY.md §2.2 — no windows/sessions exist in it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """``(user_id, session_seq, session_start, session_end, n_events,
    total_value)`` — one row per closed session, ``session_seq``
    numbering a user's sessions 1..k in time order.

    ``order_col`` breaks timestamp ties so the session assignment is
    deterministic across partitionings. ``total_value`` is summed
    through DECIMAL(20,2) (exact, order-independent) then cast back to
    double — two-decimal event values aggregate reproducibly.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # cast: unix_micros rejects TIMESTAMP_NTZ (parquet default); the
    # session runs UTC so NTZ -> TIMESTAMP is the identity mapping
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    brk = F.when(
        prev_ts.isNull() | (us(F.col(ts_col)) - us(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    # Two selects: a window expression cannot nest inside another
    # window aggregate. Keeping the ORIGINAL column names through both
    # windows lets Catalyst see the orderings as identical, so the plan
    # is ONE exchange + ONE sort feeding both Window operators; the
    # final group-by is clustering-satisfied by the same user_col
    # partitioning (grouping keys are a superset) — one shuffle total.
    flagged = events.select(
        user_col, ts_col, value_col, order_col, brk.alias("__brk")
    )
    w2 = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.select(
            user_col,
            ts_col,
            value_col,
            F.sum("__brk").over(w2).cast("long").alias("session_seq"),
        )
        .groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(20,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col(user_col).alias("user_id"),
            "session_seq",
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )
