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
