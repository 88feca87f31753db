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


def streaming_minhash_buckets(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming LSH band buckets — near-dup detection at ingest:
    ``(band, band_hash, content_keys: array<long>, arrivals: long)``.

    Each arriving document is shingled, MinHash-signed, and banded by
    the SAME vectorized Arrow kernel as the batch path
    (``operators.dedup.minhash_bands`` — shingling/hashing JVM-side,
    signatures in one ``mapInArrow`` pass); the state store then keeps,
    per (band, band_hash) bucket, the SET of member content keys. A
    new document colliding with a non-singleton bucket is a live
    near-dup candidate the moment it lands.

    The membership key is the portable 60-bit md5 hash of the text —
    the streaming twin of the batch rep-collapse guard: a boilerplate
    flood of byte-identical documents collapses inside ``collect_set``
    to ONE member per bucket, so state is bounded by
    O(distinct contents × bands) regardless of stream length (and
    ``arrivals`` still counts every row). Pairing/verification/
    clustering stay a drain-time batch composition
    (``near_dedup_keep_set``): global connected components are not
    expressible incrementally in Spark's streaming model, and the
    scan-heavy part (signatures) is exactly what this moves to ingest.
    """
    from pagerank_spark.functions.text import hash64
    from pagerank_spark.operators.dedup import minhash_bands

    keyed = docs.select(
        hash64(F.col(text_col), "md5").alias("content_key"),
        F.col(text_col).alias("text"),
    )
    b = minhash_bands(
        keyed, id_col="content_key", text_col="text",
        shingle_k=shingle_k, num_perm=num_perm, bands=bands, seed=seed,
        hash_fn=hash_fn,
    )
    return (
        b.withColumnRenamed("doc_id", "content_key")
        .groupBy("band", "band_hash")
        .agg(
            F.collect_set("content_key").alias("content_keys"),
            F.count(F.lit(1)).alias("arrivals"),
        )
    )


def near_dedup_keep_set(
    docs: DataFrame,
    buckets: DataFrame,
    threshold: float = 0.8,
    shingle_k: int = 3,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drain-time near-dup keep set from STREAMED band buckets:
    ``DataFrame[id_col]`` — equal to batch ``dedup_near`` on the same
    corpus (``docs`` = the drained stream read as a batch table,
    ``buckets`` = the drained ``streaming_minhash_buckets`` state).

    Composition: within-bucket content-key pairs (distinct-content
    granularity, so floods cannot go quadratic) → translate to
    representative doc ids → exact shingle-Jaccard verification →
    the shared cluster tail (``operators.dedup._near_keep_ids``:
    connected components + member attach + min-id survivor). The
    candidate set equals the batch LSH band join's by construction
    (identical signatures land in identical buckets), so the keep set
    matches bit-for-bit.
    """
    from pagerank_spark.functions.text import hash64
    from pagerank_spark.operators.dedup import (
        _content_groups,
        _near_keep_ids,
        _shingle_hashes,
    )

    mapping = _content_groups(docs, id_col, text_col).localCheckpoint()
    ckmap = (
        docs.select(
            hash64(F.col(text_col), "md5").alias("ck"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("ck")
        .agg(F.min("doc_id").alias("rep"))
        .localCheckpoint()
    )
    # the right side re-aliases every column so the self-join's
    # children share NO output attribute ids (a memory-sink view
    # self-joined through Generate trips "conflicting references"
    # resolution otherwise)
    ma = buckets.select(
        "band", "band_hash", F.explode("content_keys").alias("cka")
    )
    mb = buckets.select(
        F.col("band").alias("_b2"),
        F.col("band_hash").alias("_h2"),
        F.explode("content_keys").alias("ckb"),
    )
    cand_ck = (
        ma.join(
            mb,
            (F.col("band") == F.col("_b2"))
            & (F.col("band_hash") == F.col("_h2")),
        )
        .where(F.col("cka") < F.col("ckb"))
        .select("cka", "ckb")
        .distinct()
    )
    cand = (
        cand_ck.join(
            ckmap.select(F.col("ck").alias("cka"), F.col("rep").alias("ra")),
            "cka",
        )
        .join(
            ckmap.select(F.col("ck").alias("ckb"), F.col("rep").alias("rb")),
            "ckb",
        )
        .select(
            F.least("ra", "rb").alias("a"),
            F.greatest("ra", "rb").alias("b"),
        )
        .distinct()
    )
    rep_docs = docs.join(
        mapping.where(F.col("doc_id") == F.col("rep")).select(
            F.col("doc_id").alias(id_col)
        ),
        id_col,
        "left_semi",
    )
    sh = _shingle_hashes(
        rep_docs, id_col, text_col, shingle_k, hash_fn
    ).localCheckpoint()
    hs = sh.select("doc_id", F.array_distinct("hashes").alias("hset"))
    verified = (
        cand.join(
            hs.select(F.col("doc_id").alias("a"), F.col("hset").alias("ha")),
            "a",
        )
        .join(
            hs.select(F.col("doc_id").alias("b"), F.col("hset").alias("hb")),
            "b",
        )
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("ha", "hb"))
                / F.size(F.array_union("ha", "hb"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    nonempty = sh.where(F.size("hashes") > 0).select("doc_id")
    return _near_keep_ids(mapping, verified, nonempty, threshold, id_col)
