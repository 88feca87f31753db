"""One-call graph profile — the first query anyone runs on a new
edge table.

Composes the engine's own operators (degrees, triangles, transitivity,
reciprocity, connected components) into a single one-row DataFrame; at
100 TB each constituent is the already-scale-audited implementation,
and the driver only ever holds the handful of scalars. Doubles are
derived from exact integer aggregates with one IEEE division each, so
an ANSI oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.components import connected_components
from pagerank_spark.operators.degrees import reciprocity
from pagerank_spark.operators.triangles import (
    _orient,
    _simple_degrees,
    _simple_undirected,
    _triangles,
)


def graph_summary(edges: DataFrame) -> DataFrame:
    """``DataFrame`` with ONE row:

    ``n_vertices, n_edges, n_simple_edges, density, max_degree,
    avg_degree, triangles, transitivity, reciprocity, n_components``

    where degree/triangle/component figures are over the undirected
    simple projection (matching the triangle/CC family), ``n_edges``
    counts raw rows (duplicate-edge multiplicity preserved), and
    ``density = 2·e_s / (n·(n−1))``, ``avg_degree = 2·e_s / n``.
    """
    # ONE materialized pass over the source, then the simple projection
    # and degree table are shared by every downstream figure — the
    # degree-oriented triangle join (the costly constituent) runs once
    # and transitivity reuses its count plus the degree aggregate.
    edges = edges.select("src", "dst").localCheckpoint()
    simple = _simple_undirected(edges).localCheckpoint()
    deg = _simple_degrees(simple).localCheckpoint()
    n_edges = edges.count()
    e_s = simple.count()
    deg_row = deg.agg(
        F.max("deg").alias("maxd"),
        F.sum(F.col("deg") * (F.col("deg") - 1)).alias("w2"),
    ).collect()[0]
    n = int(
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    o = _orient(simple, deg).localCheckpoint()
    tri = int(
        _triangles(o).agg(F.count(F.lit(1)).alias("t")).collect()[0]["t"]
    )
    # same operand order as the clustering_global oracle: 3.0*t / (W/2)
    wedges = (deg_row["w2"] or 0) / 2
    trans = (3.0 * tri / wedges) if wedges > 0 else 0.0
    rec = float(reciprocity(edges).collect()[0]["reciprocity"])
    ncomp = int(
        connected_components(edges)
        .select("component")
        .distinct()
        .count()
    )
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n,
                n_edges,
                e_s,
                (2.0 * e_s / (n * (n - 1))) if n > 1 else 0.0,
                int(deg_row["maxd"] or 0),
                (2.0 * e_s / n) if n else 0.0,
                tri,
                trans,
                rec,
                ncomp,
            )
        ],
        "n_vertices long, n_edges long, n_simple_edges long, "
        "density double, max_degree long, avg_degree double, "
        "triangles long, transitivity double, reciprocity double, "
        "n_components long",
    )
