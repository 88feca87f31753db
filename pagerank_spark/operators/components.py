"""Connected components via alternating small-star / large-star.

Algorithm: Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond" (SOCC'14) — the
extension mandated by BASELINE.json.north_star. Not present in the C
reference (SURVEY.md §2.3); built on the same partitioned edge-table
substrate as PageRank.

Each round is two bounded shuffles (a groupBy-min per star operation,
expressed as aggregate + re-join so Catalyst plans partial hash
aggregates). Edges monotonically contract toward stars rooted at each
component's minimum id; convergence (edge set unchanged) is detected
with an order-insensitive xxhash64 checksum + count — one tiny action
per round. Lineage is truncated per round with ``localCheckpoint`` so
the plan stays O(1) across iterations.

Semantics: components are those of the UNDIRECTED simple graph
(direction ignored, self-loops and duplicates irrelevant — they never
change connectivity). Output labels are exact: every vertex maps to
the minimum vertex id in its component, so "components match exactly"
(north_rule) is well-defined and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) ∪ {u}).

    ``nbrs`` feeds two consumers (the min-aggregate and the join) and
    is deliberately NOT persisted/pre-partitioned: measured at 10M
    edges, recomputing it into each consumer's own compressed shuffle
    is ~25% faster than building a columnar cache of it per round
    (exchange reuse can't merge the two shuffles — the join branch
    gets IsNotNull pushed beneath its exchange, so the subtrees are
    unequal). LPA's edge table IS persisted — but that one is
    loop-invariant, paying its cache build once, not per round.
    """
    nbrs = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = nbrs.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient u ≥ v; connect all small neighbors (and u) to m = min(N⁻(u) ∪ {u})."""
    oriented = e.where(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    linked = oriented.join(mins, "src")
    out = linked.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        linked.select("src", F.col("m").alias("dst"))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive, no ANSI overflow (edge set is distinct,
    # so xor-cancellation of duplicates cannot occur).
    row = e.agg(
        F.count(F.lit(1)).alias("c"),
        F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"] or 0)


def _count(e: DataFrame) -> int:
    return int(e.agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"])


def connected_components(
    edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """``DataFrame[id: long, component: long]`` — component = min id in it.

    Every vertex appearing in ``edges`` gets a row (isolated vertices —
    present only via self-loops — label themselves).
    """
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    # Convergence = edge set unchanged. Count-first detection: the
    # contraction shrinks the edge set most rounds, so a bare count()
    # (no per-row hash evaluation) usually proves "changed" on its own;
    # the order-insensitive xxhash64 checksum runs only when counts of
    # consecutive rounds agree. The previous round's hash is then
    # computed lazily from its localCheckpoint (an in-memory scan), so
    # the cheap path never costs an extra star round.
    from pagerank_spark.plans.iterate import iterate

    ctx = {"count": _count(e), "hash": None}

    def _converged(prev: DataFrame, new: DataFrame, _round: int) -> bool:
        new_count = _count(new)
        if new_count == ctx["count"]:
            if ctx["hash"] is None:
                ctx["hash"] = _signature(prev)[1]
            new_hash = _signature(new)[1]
            if new_hash == ctx["hash"]:
                return True
            ctx["hash"] = new_hash
        else:
            ctx["hash"] = None
        ctx["count"] = new_count
        return False

    e, _rounds, _done = iterate(
        e,
        lambda s, _r: _small_star(_large_star(s)),
        _converged,
        max_iter,
        warn=(
            f"connected_components: edge-set signature did not stabilize "
            f"within max_iter={max_iter} rounds; labels may not be final "
            "(a non-converged edge set is not a star forest)"
        ),
    )
    # Converged edge set is a star forest: (u → component root). Roots
    # and isolated vertices label themselves via the left join.
    labels = vertices.join(
        e.select(F.col("src").alias("id"), F.col("dst").alias("component")),
        "id",
        "left",
    ).select("id", F.coalesce("component", "id").alias("component"))
    return labels
