"""Absorbing-walk analytics: truncated expected hitting time.

The expected hitting time E[τ_T] of a target set T under the uniform
out-edge random walk is the classic absorbing-chain statistic behind
"how far is this page from the trusted core" / navigability analyses
(Aldous & Fill, "Reversible Markov Chains and Random Walks on Graphs",
ch. 2; Levin & Peres, "Markov Chains and Mixing Times", §10). On web
graphs the exact quantity can be infinite (walks that never reach T),
so the operational form is the K-truncated value

    h_K(v) = E[min(τ_T, K)]

which satisfies the well-known recursion h_0 = 0 and

    h_{k+1}(v) = 0                       if v ∈ T
               = 1 + Σ_u P(v,u) h_k(u)   otherwise

— each level is exactly one out-edge SpMV, the transpose of the
PageRank gather. Dangling vertices (no out-edges) are patched with a
self-loop, the standard absorbing-chain convention: their truncated
value is the horizon K itself, which is also the correct limit
("never hits").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hitting_time(
    edges: DataFrame,
    targets: list[int],
    horizon: int = 20,
    n: int | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """K-truncated expected hitting time to ``targets`` per vertex.

    Returns ``(id, hitting)`` for every id in [0, n): 0.0 on targets,
    in (0, horizon] elsewhere. Parallel edges carry multiplicity
    (P(v,u) = multiplicity / out_deg), matching the engine's
    multigraph convention everywhere else.

    Scale shape per level: ONE join of the (src, dst, p) stochastic
    edge frame against the O(n) value frame on ``dst`` plus a
    map-side-combinable sum keyed on ``src`` — identical cost to one
    PageRank iteration in join mode; the value frame is
    localCheckpoint-ed every ``checkpoint_every`` levels to keep the
    lineage flat. Horizon is fixed, so the whole run is ``horizon``
    SpMVs, no convergence loop.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    if n is None:
        row = e.agg(F.max(F.greatest("src", "dst")).alias("m")).first()
        if row is None or row["m"] is None:
            raise ValueError("hitting_time: empty edge table")
        n = int(row["m"]) + 1
    tset = sorted({int(t) for t in targets})
    if not tset:
        raise ValueError("hitting_time: empty target set")

    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    w = e.join(od, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("_od")).alias("p")
    )
    v = spark.range(n).select(F.col("id").cast("long").alias("id"))
    is_target = F.col("id").isin(tset)
    h = v.select("id", F.lit(0.0).alias("h"))
    for k in range(horizon):
        g = (
            w.join(h.withColumnRenamed("id", "_d"), w["dst"] == F.col("_d"))
            .groupBy("src")
            .agg(F.sum(F.col("p") * F.col("h")).alias("_g"))
            .withColumnRenamed("src", "id")
        )
        nxt = (
            h.join(g, "id", "left")
            .select(
                "id",
                F.when(is_target, F.lit(0.0))
                .otherwise(1.0 + F.coalesce(F.col("_g"), F.col("h")))
                .alias("h"),
            )
        )
        h = (
            nxt.localCheckpoint(eager=True)
            if (k + 1) % checkpoint_every == 0
            else nxt
        )
    return h.select("id", F.col("h").alias("hitting"))
