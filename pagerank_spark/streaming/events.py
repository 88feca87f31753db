"""Structured Streaming over the events table.

The C reference is batch-only (finite file input — SURVEY.md §2.2
verifies no streaming constructs exist), so this module is pure
extension surface: incremental graph/event analytics with the standard
Spark shape — ``readStream`` → event-time window + watermark →
``writeStream``. Tested with the file source + ``availableNow`` trigger
(replays the parquet as a bounded stream), which is execution-identical
to the continuous case at the operator level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet directory."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data bound.

    The watermark caps state: rows later than ``watermark`` behind the
    max event time are dropped and their window finalized — the
    standard unbounded-state guard for 100 TB/day streams.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-exact sum (order-independent) then one rounding
            # point: deterministic across partitionings AND engines
            F.round(
                F.sum(F.col("value").cast("decimal(20,2)")).cast("double"), 6
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_edge_degrees(events: DataFrame) -> DataFrame:
    """Incremental out-degree over a (user -> event_type) interaction
    graph: the streaming analogue of the engine's degree operator —
    running totals maintained by the state store, emitted per update."""
    return (
        events.select(
            F.col("user_id").alias("src"),
            F.xxhash64("event_type").alias("dst"),
        )
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
    )


def run_stream_once(stream_df: DataFrame, sink_path: str, checkpoint: str, output_mode: str = "append"):
    """Drain the stream with availableNow into parquet; returns the query."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def windowed_top_items(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 5,
) -> tuple[DataFrame, "object"]:
    """EXACT windowed heavy hitters in two composable halves:

    - the STREAMING half returns per-(window, key) running counts —
      the state store holds one row per (live window, distinct key in
      that window), and the watermark expires whole windows, so state
      is bounded by windows × per-window-distinct, never stream
      length. (This is the honest exact-top-k state bound; a
      Misra-Gries sketch would be smaller but its counters depend on
      micro-batch cut points — not batching-invariant, so not
      value-checkable. The engine's batching-invariant small-state
      alternative is ``sketches.windowed_hll_registers``.)
    - ``finish`` is the batch top-k projection to run on the drained
      table: rank by (count DESC, key ASC) — a deterministic total
      order — and keep ranks ≤ k.

    Returns ``(counts_stream, finish)`` where ``finish(df) ->
    DataFrame[window_start, key, n_events, rank]``.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    counts = (
        src.select(F.window("ts", window).alias("w"), F.col(key_col))
        .groupBy(F.col("w.start").alias("window_start"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )

    def finish(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        w = W.partitionBy("window_start").orderBy(
            F.col("n_events").desc(), F.col(key_col).asc()
        )
        return (
            df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("window_start", key_col, "n_events", "rank")
        )

    return counts, finish
