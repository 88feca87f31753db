"""Link prediction by neighborhood overlap — common-neighbors /
Jaccard / Adamic-Adar scores for non-adjacent vertex pairs.

Extension beyond the C reference (SURVEY.md §2.3 family): the standard
feature set a link-graph pipeline computes for edge recommendation and
graph-ML training labels (Liben-Nowell & Kleinberg, "The Link
Prediction Problem for Social Networks", CIKM'03).

Shape: one wedge self-join of the symmetrized simple edge table
generates every common-neighbor triple (a, w, b) exactly once
(a < b), a single groupBy(a, b) folds all three scores, and a left-anti
join removes already-connected pairs. The wedge join is Σ deg(w)² rows
— the inherent 2-hop cost. At 100 TB that sum is dominated by hub
vertices, so ``max_degree`` caps the common-neighbor role: vertices
above the cap generate no wedges (the standard approximation — a hub's
Adamic-Adar contribution 1/ln(deg) is negligible anyway, and the cap
bounds the join at |V|·cap² instead of Σ deg²). None = exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.triangles import (
    _simple_degrees,
    _simple_undirected,
)


def link_prediction(
    edges: DataFrame,
    min_common: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """``DataFrame[a, b, common, jaccard, adamic_adar]`` with a < b for
    every NON-adjacent pair sharing >= ``min_common`` neighbors.

    ``jaccard = |Γa∩Γb| / |Γa∪Γb|``; ``adamic_adar = Σ_w 1/ln(deg w)``
    over common neighbors (degree-1 common neighbors are impossible by
    construction, so ln(deg) >= ln 2 > 0). Undirected simple-graph
    semantics, like the triangle family.
    """
    simple = _simple_undirected(edges).localCheckpoint()
    deg = _simple_degrees(simple).localCheckpoint()
    sym = simple.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        simple.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    center_deg = deg.withColumnRenamed("id", "v")
    if max_degree is not None:
        center_deg = center_deg.where(F.col("deg") <= max_degree)
    # (a, w, b): w adjacent to both, each unordered pair once via a < b;
    # the center's degree rides along so Adamic-Adar needs no post-join
    wedges = (
        sym.join(center_deg, "v")
        .select("u", F.col("v").alias("w"), "deg")
        .alias("l")
        .join(
            sym.select(F.col("u").alias("w"), F.col("v").alias("b")).alias(
                "r"
            ),
            "w",
        )
        .where(F.col("u") < F.col("b"))
        .select(
            F.col("u").alias("a"),
            "b",
            (1.0 / F.log(F.col("deg"))).alias("aa_w"),
        )
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common"),
        F.sum("aa_w").alias("adamic_adar"),
    )
    non_adjacent = scored.join(simple, ["a", "b"], "left_anti")
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("_db"))
    return (
        non_adjacent.where(F.col("common") >= min_common)
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            (
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
