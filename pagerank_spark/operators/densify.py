"""Id densification: arbitrary vertex ids → dense ``0..n-1`` longs.

The reference assumes dense int ids straight from the file header
(``Page_Rank_SERIAL.c:155-159``). Real corpora have string/sparse ids
(repo names, 64-bit hashes); the broadcast-rank PageRank path indexes a
NumPy vector by id, so it needs dense ids.

Implementation: distinct ids, sorted, then the JVM-side global row
numbering in ``plans.rank.zip_with_index`` (per-partition counts +
broadcast offsets — no single-partition window, no driver collect, and
no Python row pass), which is exactly what a scale-safe dense rank
requires. Sorting first makes the assignment deterministic across runs
and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densify_ids(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> tuple[DataFrame, DataFrame]:
    """Return ``(dense_edges, mapping)``.

    ``dense_edges`` is ``DataFrame[src: long, dst: long]`` with ids in
    ``0..n-1``; ``mapping`` is ``DataFrame[orig_id, id]`` for joining
    results back to the original id space.
    """
    spark = edges.sparkSession
    ids = (
        edges.select(F.col(src).alias("orig_id"))
        .union(edges.select(F.col(dst).alias("orig_id")))
        .distinct()
        .sort("orig_id")
    )
    from pagerank_spark.plans.rank import zip_with_index

    mapping = zip_with_index(ids, out="id", start=0).select(
        "orig_id", F.col("id").cast("long")
    )
    dense = (
        edges.join(mapping.withColumnRenamed("orig_id", src), src)
        .select(F.col("id").alias("_src"), dst)
        .join(mapping.withColumnRenamed("orig_id", dst), dst)
        .select(F.col("_src").alias("src"), F.col("id").alias("dst"))
    )
    return dense, mapping
