"""Triangle counting via degree-ordered edge iteration.

Extension mandated by BASELINE.json.north_star (SURVEY.md §2.3).
Counts triangles of the UNDIRECTED SIMPLE projection (self-loops
dropped, duplicates and direction collapsed) — the oracle is
trace(A³)/6 on that projection (FIXTURES.md F1: DEMO → 4).

Degree ordering is the classic shuffle-volume bound: orient every
edge from its lower-(degree, id) endpoint to the higher one, so each
wedge is generated exactly once at its lowest-degree corner — the
heavy-hitter vertex never fans out its full neighborhood. Triangles
are then two self-joins of the oriented edge table (wedge build +
closing-edge semi-join), all JVM-side, whole-stage-codegen'd, with AQE
free to pick broadcast sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """``(a, b)`` with a < b — the distinct simple undirected edge set."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def _simple_degrees(simple: DataFrame) -> DataFrame:
    """``(id, deg)`` — neighbor counts of the simple undirected graph."""
    return (
        simple.select(F.col("a").alias("id"))
        .union(simple.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _orient(simple: DataFrame, deg: DataFrame) -> DataFrame:
    # Orient low (deg, id) -> high (deg, id): total order, no 2-cycles.
    return (
        simple.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )


def _oriented_simple(edges: DataFrame) -> DataFrame:
    simple = _simple_undirected(edges)
    return _orient(simple, _simple_degrees(simple))


def _triangles(o: DataFrame) -> DataFrame:
    """``(x, y, z)`` triangle corner triples from a (checkpointed)
    degree-oriented edge table: wedge self-join + closing-edge join."""
    wedges = o.alias("e1").join(
        o.alias("e2"), F.col("e1.v") == F.col("e2.u")
    ).select(
        F.col("e1.u").alias("x"),
        F.col("e1.v").alias("y"),
        F.col("e2.v").alias("z"),
    )
    return wedges.join(
        o.select(F.col("u").alias("x"), F.col("v").alias("z")), ["x", "z"]
    )


def _corner_counts(tris: DataFrame) -> DataFrame:
    """``(id, triangles)`` per corner. ONE scan of the triangle join: a
    3-branch union would recompute the two self-joins once per corner
    position (measured 2.2x slower at sf0.1); explode emits the three
    corners per triangle in place."""
    corners = tris.select(F.explode(F.array("x", "y", "z")).alias("id"))
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))


def triangle_count(edges: DataFrame, per_vertex: bool = False) -> DataFrame:
    """Total triangle count (``DataFrame[triangles: long]``, one row),
    or per-vertex corner counts (``DataFrame[id, triangles]``)."""
    o = _oriented_simple(edges).localCheckpoint()
    tris = _triangles(o)
    if not per_vertex:
        return tris.agg(F.count(F.lit(1)).alias("triangles"))
    return _corner_counts(tris)


def clustering_coefficient(
    edges: DataFrame, per_vertex: bool = True
) -> DataFrame:
    """Clustering coefficient of the undirected simple graph.

    Per-vertex (``DataFrame[id, coeff]``): closed-wedge fraction
    ``2·T(v) / (deg(v)·(deg(v)−1))``, 0.0 for degree-<2 vertices;
    every vertex of the simple graph gets a row. Global
    (``DataFrame[coeff]``, one row): transitivity ``3·T / W`` with
    ``W = Σ deg·(deg−1)/2`` open+closed wedges (0.0 on a wedgeless
    graph).

    Shares the degree-oriented triangle join with ``triangle_count``;
    the degree table is reused for the denominator, so the only extra
    work over a triangle count is one broadcast-size join.
    """
    simple = _simple_undirected(edges)
    deg = _simple_degrees(simple).localCheckpoint()
    o = _orient(simple, deg).localCheckpoint()
    tris = _triangles(o)
    if per_vertex:
        return (
            deg.join(_corner_counts(tris), "id", "left")
            .select(
                "id",
                F.when(
                    F.col("deg") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                )
                .otherwise(F.lit(0.0))
                .alias("coeff"),
            )
        )
    total = tris.agg(F.count(F.lit(1)).alias("t"))
    wedges = deg.agg(
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).alias("w")
    )
    return total.crossJoin(wedges).select(
        F.when(F.col("w") > 0, 3.0 * F.col("t") / F.col("w"))
        .otherwise(F.lit(0.0))
        .alias("coeff")
    )


def effective_size(edges: DataFrame) -> DataFrame:
    """Burt's structural-hole metrics on the unweighted undirected
    simple graph — ``DataFrame[id, deg, effective_size, efficiency]``,
    one row per non-isolated vertex.

    ``effective_size(v) = deg(v) − 2·T(v)/deg(v)`` — the Borgatti 1997
    simplification of Burt 1992's redundancy formula for unweighted
    ego networks: each triangle through v makes one alter redundant
    with another, so the ego's non-redundant contact count is degree
    minus the mean alter-alter tie count. ``efficiency`` divides by
    degree ([1/deg, 1]; 1 = no two contacts know each other — the
    broker position). The standard ego-level complement of the
    edge-level Backstrom-Kleinberg dispersion already in the engine.

    Cost: exactly the per-vertex triangle kernel (Σ min-deg oriented
    join — hub-safe) plus the O(V) degree join
    :func:`clustering_coefficient` already pays; no new shuffle shape.
    """
    simple = _simple_undirected(edges)
    deg = _simple_degrees(simple).localCheckpoint()
    o = _orient(simple, deg).localCheckpoint()
    tri = _corner_counts(_triangles(o))
    es = F.col("deg") - 2.0 * F.coalesce("triangles", F.lit(0)) / F.col("deg")
    return deg.join(tri, "id", "left").select(
        "id",
        "deg",
        es.alias("effective_size"),
        (es / F.col("deg")).alias("efficiency"),
    )


def burt_constraint(edges: DataFrame) -> DataFrame:
    """Burt's network constraint (Burt 1992, "Structural Holes", eq.
    2.4; unweighted undirected ego networks) — ``DataFrame[id,
    constraint]``, one row per non-isolated vertex:

        c(v) = Σ_{j∈N(v)} ( p_vj + Σ_{q∈N(v)∩N(j)} p_vq · p_qj )²

    with ``p_xy = 1/deg(x)`` (equal investment across an ego's ties).
    Low constraint = the ego brokers structural holes (contacts don't
    know each other); high = the ego is locked inside one dense group.
    The scalar that, with :func:`effective_size`, completes the
    standard structural-holes pair.

    Shape: the indirect term is a per-ORDERED-edge weighted
    common-neighbor sum — each triangle (x, y, z) contributes to all
    six ordered (v, j) corner pairs with weight 1/(deg_v · deg_q) —
    i.e. the SAME oriented triangle kernel `edge_dispersion` uses
    (Σ min-deg join rows, hub-safe), plus two O(V) degree joins and
    one per-vertex fold. No wedge join, no Σ deg² term.
    """
    simple = _simple_undirected(edges).localCheckpoint()
    deg = _simple_degrees(simple).localCheckpoint()
    o = _orient(simple, deg).localCheckpoint()
    # ordered-edge frame (v, j): both directions of every simple edge
    ordered = simple.select(
        F.col("a").alias("v"), F.col("b").alias("j")
    ).union(simple.select(F.col("b").alias("v"), F.col("a").alias("j")))
    # triangle corner contributions: for ordered pair (v, j), q is the
    # third corner; weight 1/(deg_v * deg_q)
    tris = _triangles(o)
    corner = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("x").alias("v"), F.col("y").alias("j"),
                         F.col("z").alias("q")),
                F.struct(F.col("y").alias("v"), F.col("x").alias("j"),
                         F.col("z").alias("q")),
                F.struct(F.col("x").alias("v"), F.col("z").alias("j"),
                         F.col("y").alias("q")),
                F.struct(F.col("z").alias("v"), F.col("x").alias("j"),
                         F.col("y").alias("q")),
                F.struct(F.col("y").alias("v"), F.col("z").alias("j"),
                         F.col("x").alias("q")),
                F.struct(F.col("z").alias("v"), F.col("y").alias("j"),
                         F.col("x").alias("q")),
            )
        ).alias("_t")
    ).select("_t.v", "_t.j", "_t.q")
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("_dv"))
    dq = deg.select(F.col("id").alias("q"), F.col("deg").alias("_dq"))
    indirect = (
        corner.join(dv, "v")
        .join(dq, "q")
        .groupBy("v", "j")
        .agg(
            F.sum(1.0 / (F.col("_dv") * F.col("_dq"))).alias("_ind")
        )
    )
    per_tie = (
        ordered.join(indirect, ["v", "j"], "left")
        .join(dv, "v")
        .select(
            "v",
            (
                (1.0 / F.col("_dv") + F.coalesce("_ind", F.lit(0.0)))
                ** 2
            ).alias("_c"),
        )
    )
    return per_tie.groupBy(F.col("v").alias("id")).agg(
        F.sum("_c").alias("constraint")
    )
