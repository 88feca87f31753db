"""Ingest-time corpus-drift monitoring.

A training-data pipeline wants to know, WHILE a crawl streams in,
whether today's token distribution is drifting from the reference
mixture — before a skewed month of data is already persisted. The
unbounded-state version (per-window vocabulary counts) is undeployable
at 100 TB; the bounded form is the hashed histogram
(``operators.textstats.hashed_token_histogram``): per window exactly
``n_buckets`` counters in the state store, with drift read off as the
hashed JS/TV divergence against a reference histogram
(``hashed_divergence``). Hashed divergences lower-bound the exact
ones (data-processing inequality), which is the right direction for
an alarm: a hashed alarm is always a real alarm.

Because the per-(window, bucket) count is a plain streaming
aggregation of an append source, the drained histogram is
bit-identical to the batch ``hashed_token_histogram`` on the same
rows regardless of micro-batch boundaries — exactly what the
``drift_stream`` driver gate checks (stream → histogram → divergence
vs a pure-SQL replay of the whole pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_token_histogram(
    docs: DataFrame,
    window_expr: Column,
    n_buckets: int = 1024,
    hash_fn: str = "xxhash64",
    text_col: str = "text",
) -> DataFrame:
    """Per-window hashed token histogram over a document stream.

    ``window_expr`` assigns each document to a window (a time bucket,
    a source tag, a doc-id range …). Returns the streaming aggregate
    ``(win, bucket, c)`` — run it with ``outputMode("complete")`` (or
    update mode into a keyed sink); state is ``n_buckets`` counters
    per open window, bounded by construction.
    """
    from pagerank_spark.functions.text import hash64

    if not docs.isStreaming:
        raise ValueError(
            "streaming_token_histogram expects a streaming DataFrame; "
            "use operators.textstats.hashed_token_histogram for batch"
        )
    tok = docs.select(
        window_expr.alias("win"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).where(F.col("w") != "")
    return (
        tok.withColumn(
            "bucket", F.pmod(hash64(F.col("w"), hash_fn), F.lit(n_buckets))
        )
        .groupBy("win", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
