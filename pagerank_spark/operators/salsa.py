"""SALSA — the Stochastic Approach for Link-Structure Analysis
(Lempel & Moran 2000).

Like HITS, SALSA scores every page as a *hub* (good link source) and
an *authority* (good link target), but on the random-walk rather than
mutual-reinforcement model — which makes it resistant to the
tightly-knit-community (TKC) effect that lets link farms capture HITS:
a dense clique inflates its own eigenvector, while SALSA's stationary
distribution only rewards it in proportion to plain degree. The
reference's workload is exactly this kind of web link graph
(``Page_Rank_SERIAL.c:101-142`` builds the same adjacency SALSA walks
over).

Closed form instead of power iteration (Lempel & Moran §3.2): on each
connected component *c* of the bipartite support graph
(hub-side i ↔ authority-side j for every distinct edge i→j), the
two-step walk's stationary distribution is proportional to degree,
and a uniform start leaves each component exactly its share of mass:

    authority(j) = (|A_c| / |A|) · indeg(j)  / Σ_{k ∈ A_c} indeg(k)
    hub(i)       = (|H_c| / |H|) · outdeg(i) / Σ_{k ∈ H_c} outdeg(k)

where A/H are all vertices with in/out-edges and A_c/H_c those in
component c. Degrees count *distinct* non-loop edges (the support
graph is simple by construction).

Spark shape: this is degree aggregation + one connected-components run
on the bipartite graph (vertex i as 2i on the hub side, j as 2j+1 on
the authority side) + per-component combinable sums — no iteration at
all, which is the whole point of preferring the closed form at 100 TB.
Both scores sum to 1 over their side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components

__all__ = ["salsa"]


def _side_scores(
    deg: DataFrame, comp: DataFrame, parity: int, name: str
) -> DataFrame:
    """Per-vertex closed-form score for one side. ``deg`` =
    DataFrame[id, deg]; ``comp`` = bipartite CC labels; ``parity`` = 0
    for the hub side (2i), 1 for the authority side (2j+1)."""
    # pmod, not %: Spark's % keeps the dividend's sign (-5 % 2 = -1),
    # which would silently drop every negative-id authority vertex;
    # the decode divides an exact even long, so integer division via
    # floor() is lossless for any valid encoded id
    side = (
        comp.where(F.pmod(F.col("id"), F.lit(2)) == parity)
        .select(
            F.floor((F.col("id") - parity) / 2).cast("long").alias("id"),
            "component",
        )
        .join(deg, "id")
    )
    stats = side.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.sum("deg").alias("deg_c"),
    )
    total = side.select(F.count(F.lit(1)).alias("n_all"))
    return (
        side.join(stats, "component")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            (
                (F.col("n_c").cast("double") / F.col("n_all"))
                * F.col("deg")
                / F.col("deg_c")
            ).alias(name),
        )
    )


def salsa(edges: DataFrame) -> DataFrame:
    """``DataFrame[id: long, hub: double, authority: double]`` — one
    row per vertex of ``edges``; a side's score is 0.0 for vertices
    absent from it (no out-edges / no in-edges). Deterministic; each
    score column sums to 1 when its side is non-empty.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # precondition: |id| < 2^62 so the 2i / 2j+1 side-encoding cannot
    # overflow long (same contract pagerank documents for vertex ids)
    bip = e.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    )
    comp = connected_components(bip)
    hub = _side_scores(outdeg, comp, 0, "hub")
    auth = _side_scores(indeg, comp, 1, "authority")
    return (
        vertices.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )
