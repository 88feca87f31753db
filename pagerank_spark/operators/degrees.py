"""Degree aggregations (reference O4/O5: ``Page_Rank_SERIAL.c:142-143``).

Duplicate edges are counted — a doubled edge doubles the degree
(``Page_Rank_SERIAL.c:131-143``), so these are plain ``count(*)``
aggregations, NOT ``count(distinct)``. Spark executes them as
partial (map-side) + final hash aggregates: the shuffle carries one
row per distinct vertex, not per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """``DataFrame[id, out_deg]`` — edges counted per source, duplicates kept."""
    return edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def in_degrees(edges: DataFrame, dst: str = "dst") -> DataFrame:
    """``DataFrame[id, in_deg]`` — edges counted per destination."""
    return edges.groupBy(F.col(dst).alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """``DataFrame[degree: long, n_vertices: long]`` — distribution of
    TOTAL degree (out + in, duplicates counted, matching ``degrees``).

    Two chained aggregations, both map-side combinable; the second's
    input is one row per vertex, so the histogram is effectively free
    after the degree pass — the standard first look at a web-scale
    graph (power-law check, max-degree skew estimate for salting).
    """
    total = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return total.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """``DataFrame[reciprocity: double]`` (one row) — the fraction of
    distinct non-loop directed edges whose reverse edge also exists.

    One self-join on the deduplicated edge set; at scale both sides
    shuffle on (src, dst) once — there is no cheaper exact formulation
    (reciprocity is inherently a pair lookup). 0.0 for a graph with no
    non-loop edges.
    """
    d = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    rev = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    both = d.join(rev, ["src", "dst"], "left_semi")
    return both.agg(F.count(F.lit(1)).alias("_m")).crossJoin(
        d.agg(F.count(F.lit(1)).alias("_t"))
    ).select(
        F.when(F.col("_t") > 0, F.col("_m") / F.col("_t"))
        .otherwise(F.lit(0.0))
        .alias("reciprocity")
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """``DataFrame[id, out_deg, in_deg]`` — full outer join of both sides.

    Vertices appearing only as a source (dangling) or only as a
    destination still get a row, with the missing side coalesced to 0.
    """
    return (
        out_degrees(edges, src)
        .join(in_degrees(edges, dst), "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
