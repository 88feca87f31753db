"""Streaming exact deduplication over a document stream.

The streaming twin of ``operators.dedup.exact_duplicates``: as
documents arrive, the state store maintains one row per distinct
content hash — the surviving (minimum) doc id and how many copies have
been seen. A training-data ingest pipeline runs this continuously so
the dedup decision is available the moment a document lands, instead
of waiting for a batch sweep.

State is bounded by the number of DISTINCT contents (not the stream
length): the aggregation key is the 128-bit content hash, and min/count
are constant-size per key — the same state-shape argument as the
windowed aggregations in ``events.py``, minus the watermark (content
hashes never expire; a production deployment shards this state by hash
prefix across executors, which Spark's state store does for free via
the groupBy hash partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_docs_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a documents parquet directory."""
    return spark.readStream.schema(DOCS_SCHEMA).parquet(path)


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """Running duplicate groups per content hash:
    ``(content_hash, keeper, copies)`` with ``keeper`` = min doc_id
    seen so far — emitted per update (complete/update mode), equal to
    the batch md5 group-by once the stream drains."""
    return (
        docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("copies"),
        )
    )
