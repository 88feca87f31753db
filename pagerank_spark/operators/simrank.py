"""SimRank structural similarity (Jeh & Widom, KDD 2002: "SimRank: a
measure of structural-context similarity").

``s(a,b) = C / (|I(a)||I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i,j)`` with
``s(a,a) = 1`` — two pages are similar when they are pointed to by
similar pages. The natural link-graph companion to PageRank (same
random-surfer model, pairwise instead of per-vertex), and the C
reference's per-vertex scan shapes (``Page_Rank_SERIAL.c:206-279``)
have no pairwise analogue — this is a from-scratch DataFrame design.

Execution shape: the score matrix is kept SPARSE and symmetric — one
``(a, b, score)`` row per unordered pair with ``a < b`` and nonzero
score; the diagonal is implicit (always 1). Each iteration is two
self-equi-joins of the score frame against the (deduplicated) edge
table plus one partial-aggregated groupBy — no driver loops, no UDFs.
The diagonal's contribution ``|I(a) ∩ I(b)|`` is iteration-invariant,
so it is computed ONCE and re-added each round instead of re-joined.

Scale notes: exact SimRank's score frame is inherently O(pairs with a
common ancestor-path); ``prune_eps`` is the published practical knob
(drop pairs below eps each round — Lizorkin et al. VLDB 2008 show the
error is bounded by eps/(1-C)). ``max_in_degree`` is the web-scale
candidate restriction: vertices whose in-degree exceeds the cap are
dropped as pair ENDPOINTS (their in-edges are removed; they still act
as in-neighbors of others), bounding |I(v)| ≤ cap for every scored
vertex, so each pair's recursion averages over ≤ cap² terms and a
link-farm target with 10⁶ spam in-links (Σ in-deg² wedge blow-up)
contributes zero rows instead of 10¹². This mirrors
``link_prediction(max_degree=)`` and is the standard hub
approximation: a hub's own scores are already driven toward 0 by the
1/(|I(a)||I(b)|) normalization. Multi-edges collapse (SimRank is
defined on simple graphs) and self-loops are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["simrank"]


def simrank(
    edges: DataFrame,
    c: float = 0.8,
    iters: int = 3,
    prune_eps: float | None = None,
    max_in_degree: int | None = None,
) -> DataFrame:
    """Iterate SimRank ``iters`` times; returns ``(a, b, score)`` for
    unordered off-diagonal pairs (``a < b``) reachable by the
    recursion (both endpoints must have in-edges). ``prune_eps``
    drops pairs whose score falls below eps after each round — the
    standard truncation for web-scale runs (exact when None).
    ``max_in_degree`` drops over-cap vertices as pair endpoints (see
    module docstring) — the hub cap that bounds the wedge joins;
    exact when None or when no vertex exceeds the cap.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    if max_in_degree is not None:
        # the over-cap set is tiny by construction (few true hubs) —
        # broadcast it and strip their in-edges before any wedge forms
        hot = (
            e.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") > max_in_degree)
            .select("dst")
        )
        capped = e.join(F.broadcast(hot), "dst", "left_anti").persist()
        e.unpersist()
        e = capped
    ind = e.groupBy(F.col("dst").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("ind")
    )
    # |I(a) ∩ I(b)| — the diagonal's per-pair contribution, constant
    # across iterations
    cab = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.src") == F.col("e2.src"))
        .where(F.col("e1.dst") < F.col("e2.dst"))
        .groupBy(
            F.col("e1.dst").alias("a"), F.col("e2.dst").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("cab"))
        .persist()
    )

    def _scored(pairs: DataFrame) -> DataFrame:
        """score = C * val / (ind(a) * ind(b)) for (a, b, val) rows."""
        out = (
            pairs.join(ind.withColumnRenamed("v", "a"), "a")
            .withColumnRenamed("ind", "ind_a")
            .join(ind.withColumnRenamed("v", "b"), "b")
            .select(
                "a",
                "b",
                (
                    F.lit(float(c))
                    * F.col("val")
                    / (F.col("ind_a") * F.col("ind"))
                ).alias("score"),
            )
        )
        if prune_eps is not None:
            out = out.where(F.col("score") >= prune_eps)
        return out

    s = _scored(cab.withColumnRenamed("cab", "val")).localCheckpoint()
    for _ in range(1, iters):
        sym = s.select(
            F.col("a").alias("i"), F.col("b").alias("j"), "score"
        ).unionByName(
            s.select(
                F.col("b").alias("i"), F.col("a").alias("j"), "score"
            )
        )
        # ordered (i, j) pairs propagate along out-edges i→a, j→b;
        # keeping a < b yields exactly Σ_{i∈I(a), j∈I(b)} s(i, j)
        t2 = (
            sym.join(
                e.select(F.col("src").alias("i"), F.col("dst").alias("a")),
                "i",
            )
            .join(
                e.select(F.col("src").alias("j"), F.col("dst").alias("b")),
                "j",
            )
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("score").alias("t2"))
        )
        nxt = (
            t2.join(cab, ["a", "b"], "full_outer")
            .select(
                "a",
                "b",
                (
                    F.coalesce("cab", F.lit(0.0))
                    + F.coalesce("t2", F.lit(0.0))
                ).alias("val"),
            )
        )
        s = _scored(nxt).localCheckpoint()
    e.unpersist()
    cab.unpersist()
    return s
