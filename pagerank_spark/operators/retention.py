"""Activity analytics over the events table — DAU and N-day retention.

Extension beyond the C reference (SURVEY.md §2.3 family): the standard
product-analytics pair every event pipeline ships. Both reduce the
event stream to the distinct ``(day, user)`` activity table FIRST —
one map-side-combinable distinct whose output is bounded by
days × distinct-users, not stream length — and every later step joins
only that skinny table against itself. At 100 TB of raw events the
activity table is the only thing that ever shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _activity(events: DataFrame, ts_col: str, user_col: str) -> DataFrame:
    return events.select(
        F.to_date(ts_col).alias("day"), F.col(user_col).alias("user_id")
    ).distinct()


def daily_active_users(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """``DataFrame[day: date, dau: long]`` — distinct users per day."""
    return (
        _activity(events, ts_col, user_col)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    )


def retention(
    events: DataFrame,
    horizons: tuple[int, ...] = (1, 7),
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-day cohort retention: for each activity day d and horizon h,
    how many of day d's active users were also active on day d+h —
    ``DataFrame[day, dau, retained_d{h}, retention_d{h}, ...]``.

    ``retention_d{h} = retained_d{h} / dau`` (one double division per
    output row — the counts are exact integers). Days whose d+h lies
    beyond the data's last day still get a row (their retained count
    is simply what the data shows: 0 joins) — trimming is the caller's
    policy decision.

    Shape: the activity table self-joins once per horizon on
    ``(user_id, day+h)`` — equi-joins on the skinny distinct table,
    each output ≤ activity rows; then one groupBy(day) folds all
    horizons (map-side combinable).
    """
    act = _activity(events, ts_col, user_col).localCheckpoint()
    out = act.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    for h in horizons:
        later = act.select(
            F.col("user_id"),
            F.date_sub(F.col("day"), h).alias("day"),
        )
        ret = (
            act.join(later, ["day", "user_id"], "left_semi")
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias(f"retained_d{h}"))
        )
        out = out.join(ret, "day", "left")
    cols = ["day", "dau"]
    for h in horizons:
        kept = F.coalesce(F.col(f"retained_d{h}"), F.lit(0))
        cols += [
            kept.alias(f"retained_d{h}"),
            (kept.cast("double") / F.col("dau")).alias(f"retention_d{h}"),
        ]
    return out.select(*cols)


def funnel(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Sequential conversion funnel — ``DataFrame[step, event_type,
    users, conversion]``: how many users performed the funnel's steps
    in order (each step strictly AFTER the previous one), and the
    fraction relative to step 1.

    Completion uses the greedy earliest-occurrence chain (t_i = first
    event of type i after t_{i-1}), which is exact for existence: if
    ANY in-order chain exists, the greedy one does — the standard
    funnel semantics of product analytics engines.

    Shape: events are filtered to funnel types once; each step is one
    min-aggregate over the previous step's survivors joined against
    that step's events — k steps = k skinny joins whose inputs only
    shrink. No window over the full stream, no per-user event
    collection.
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    spark = events.sparkSession
    ev = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(type_col).alias("etype"),
            F.col(ts_col).alias("ts"),
        )
        .where(F.col("etype").isin(list(steps)))
        .localCheckpoint()
    )
    reached = None  # DataFrame[user_id, _t] of the previous step
    counts = []
    for i, s in enumerate(steps):
        cur = ev.where(F.col("etype") == s)
        if reached is None:
            stage = cur.groupBy("user_id").agg(F.min("ts").alias("_t"))
        else:
            stage = (
                cur.join(reached.withColumnRenamed("_t", "_prev"), "user_id")
                .where(F.col("ts") > F.col("_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("_t"))
            )
        reached = stage.localCheckpoint()
        counts.append((i + 1, s, reached.count()))
    base = max(counts[0][2], 1)
    return spark.createDataFrame(
        [(i, s, c, c / base) for i, s, c in counts],
        "step int, event_type string, users long, conversion double",
    )
