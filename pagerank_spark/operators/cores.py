"""k-core extraction by iterative peeling.

Extension beyond the C reference (SURVEY.md §2.3 family): the k-core
is the maximal subgraph of the UNDIRECTED SIMPLE graph in which every
vertex has degree ≥ k — the standard coreness filter a link-graph
pipeline runs before expensive per-vertex analytics (spam farms and
leaf pages peel away; the dense core survives).

Peeling is a textbook fixpoint on the ``plans.iterate`` harness: each
round computes induced degrees (one map-side-combinable aggregate),
drops vertices below k (two left-semi joins against the surviving
vertex set), and stops when the edge count is stable — degrees only
ever decrease, so a stable count IS the fixpoint, one cheap action per
round. Lineage is truncated per round by the harness. At 100 TB each
round is bounded shuffles over a monotonically SHRINKING edge set;
rounds-to-fixpoint is small in practice (degenerate long-chain peels
are bounded by ``max_iter``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.triangles import (
    _simple_degrees,
    _simple_undirected,
)
from pagerank_spark.plans.iterate import iterate


def k_core(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """``DataFrame[id: long]`` — vertices of the k-core.

    ``k <= 1`` returns every non-isolated vertex of the simple graph
    (the 1-core); the 0-core additionally keeps self-loop-only
    vertices, so ``k <= 0`` returns all vertices appearing in
    ``edges``. An empty result (no k-core) is a valid outcome.
    """
    if k <= 0:
        return (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    state = _simple_undirected(edges).localCheckpoint()

    def _step(e: DataFrame, _round: int) -> DataFrame:
        keep = _simple_degrees(e).where(F.col("deg") >= k).select("id")
        return (
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
        )

    ctx = {"count": state.count()}

    def _converged(_prev: DataFrame, new: DataFrame, _round: int) -> bool:
        c = new.count()
        stable = c == ctx["count"]
        ctx["count"] = c
        return stable

    final, _rounds, done = iterate(
        state,
        _step,
        _converged,
        max_iter,
        warn=(
            f"k_core: peeling did not reach a fixpoint within "
            f"max_iter={max_iter} rounds; result may contain vertices "
            f"below the core degree"
        ),
    )
    return (
        final.select(F.col("a").alias("id"))
        .union(final.select(F.col("b").alias("id")))
        .distinct()
    )


def coreness(
    edges: DataFrame,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """``DataFrame[id: long, coreness: long]`` — the core number of
    every non-isolated vertex of the undirected simple graph (the
    largest k such that the vertex survives in the k-core).

    Distributed H-index fixpoint (Lü, Zhou, Zhang & Stanley, "The
    H-index of a network node and its relation to degree and
    coreness", Nature Communications 2016): starting from H₀ = degree,
    each round replaces H(v) with the H-index of its neighbors' values
    — the largest h such that at least h neighbors have H ≥ h. The
    sequence is monotonically non-increasing and converges EXACTLY to
    the core number, turning the inherently sequential min-degree peel
    (Batagelj-Zaveršnik) into a Pregel-style fixpoint the iterate
    harness runs like CC or LPA — no global priority queue, no
    serialized peel order.

    The per-round fold deliberately avoids a per-vertex sort window
    (a 10⁸-degree hub would sort 10⁸ rows in one task): neighbor
    values are first capped at the receiver's CURRENT H (sound — the
    sequence is non-increasing, so the result never exceeds it) and
    histogrammed by ``groupBy(id, value)``, shrinking the window input
    from deg(v) rows to ≤ H(v)+1 distinct values; the H-index is then
    ``max(min(t, #neighbors ≥ t))`` over a descending cumulative sum
    of that compressed histogram. Per round: one O(E) message join
    keyed by vertex + two map-side-combinable aggregations; rounds to
    fixpoint are small on real graphs (≤ ~O(diameter)-ish in
    practice), bounded by ``max_iter``. Convergence is one O(V)
    changed-count action per round. Every per-round quantity is
    integer arithmetic on deterministic inputs — the driver gate's
    DuckDB oracle replays each round in ANSI SQL bit-for-bit.

    Cross-operator invariant (machine-checked in tests):
    ``k_core(edges, k)`` equals ``coreness(edges) ≥ k`` for every k.
    """
    from pyspark.sql import Window

    simple = _simple_undirected(edges).localCheckpoint()
    nbr = (
        simple.select(F.col("a").alias("id"), F.col("b").alias("nb"))
        .union(simple.select(F.col("b").alias("id"), F.col("a").alias("nb")))
        .localCheckpoint()
    )
    state = nbr.groupBy("id").agg(F.count(F.lit(1)).alias("h"))

    def _step(h: DataFrame, _round: int) -> DataFrame:
        msgs = nbr.join(
            h.select(F.col("id").alias("nb"), F.col("h").alias("nh")), "nb"
        ).join(h, "id")
        hist = (
            msgs.select("id", F.least("nh", "h").alias("t"))
            .groupBy("id", "t")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = (
            Window.partitionBy("id")
            .orderBy(F.desc("t"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            hist.select("id", "t", F.sum("c").over(w).alias("ge"))
            .select("id", F.least("t", "ge").alias("m"))
            .groupBy("id")
            .agg(F.max("m").alias("h"))
        )

    def _converged(prev: DataFrame, new: DataFrame, _round: int) -> bool:
        return (
            new.join(
                prev.select("id", F.col("h").alias("_ph")), "id"
            )
            .where(F.col("h") != F.col("_ph"))
            .count()
            == 0
        )

    final, _rounds, _done = iterate(
        state,
        _step,
        _converged,
        max_iter,
        warn=(
            f"coreness: H-index fixpoint did not converge within "
            f"max_iter={max_iter} rounds; values are upper bounds on "
            "the true core numbers"
        ),
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    return final.select("id", F.col("h").alias("coreness"))


def k_truss(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """``DataFrame[a: long, b: long]`` (a < b) — edges of the k-truss:
    the maximal subgraph of the undirected simple graph in which every
    edge closes at least ``k − 2`` triangles WITHIN the subgraph
    (Cohen 2008, "Trusses: cohesive subgraphs for social network
    analysis"). The (k)-truss is a stricter cohesion filter than the
    (k−1)-core it is contained in — the standard community-core miner.

    Peeling fixpoint on the ``plans.iterate`` harness. Triangles are
    enumerated ONCE, up front, via the degree-ordered orientation join
    (the engine's triangle kernel — no wedge explosion at hubs): the
    peel only ever REMOVES edges, so the triangles of any later
    round's graph are exactly the original triangles whose three
    member edges all survive. Each round therefore (a) filters the
    materialized triangle table with three semi-joins against the
    surviving edge set, (b) recounts per-edge support by exploding
    the surviving triangles (one scan — a 3-branch union would re-run
    the filter per edge position), (c) drops edges below support, and
    stops when the edge count is stable (support only ever decreases
    as edges leave, so a stable count is the fixpoint — one cheap
    action per round, the same monotone argument as :func:`k_core`).
    ``k <= 2`` degenerates to the whole simple edge set (every edge
    trivially closes ≥ 0 triangles).

    This trades O(#triangles) materialized skinny rows (6 longs each,
    spillable localCheckpoint — the same storage class the trussness
    decomposition's triangle→member-edge table already uses) for
    removing the two O(E^1.5-ish) wedge self-joins from EVERY round
    after the first: rounds become bounded semi-joins + one
    map-side-combinable aggregate over a monotonically shrinking
    triangle set.
    """
    from pagerank_spark.operators.triangles import _orient, _triangles

    state = _simple_undirected(edges).localCheckpoint()
    if k <= 2:
        return state
    o = _orient(state, _simple_degrees(state)).localCheckpoint()
    # LAZY triangle plan: round 1 streams it straight into the support
    # aggregate (a graph whose peel converges immediately — common for
    # dense cores — then never pays the O(#triangles) materialization;
    # measured 9.2 s of pure checkpoint write at sf0.1's 20.2M
    # triangles). The first round that actually filters (round 2)
    # re-runs the enumeration once and checkpoints the SURVIVING set;
    # later rounds filter the shrinking materialized table.
    tri0 = _triangles(o).select(
        F.least("x", "y").alias("a1"),
        F.greatest("x", "y").alias("b1"),
        F.least("y", "z").alias("a2"),
        F.greatest("y", "z").alias("b2"),
        F.least("x", "z").alias("a3"),
        F.greatest("x", "z").alias("b3"),
    )
    tri_ctx = {"tri": tri0}

    def _step(e: DataFrame, _round: int) -> DataFrame:
        tri = tri_ctx["tri"]
        if _round > 1:
            # surviving triangles = rows whose three edges all survive
            tri = (
                tri.join(
                    e.select(F.col("a").alias("a1"), F.col("b").alias("b1")),
                    ["a1", "b1"],
                    "left_semi",
                )
                .join(
                    e.select(F.col("a").alias("a2"), F.col("b").alias("b2")),
                    ["a2", "b2"],
                    "left_semi",
                )
                .join(
                    e.select(F.col("a").alias("a3"), F.col("b").alias("b3")),
                    ["a3", "b3"],
                    "left_semi",
                )
                .localCheckpoint()
            )
            tri_ctx["tri"] = tri
        support = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("a1").alias("a"), F.col("b1").alias("b")
                        ),
                        F.struct(
                            F.col("a2").alias("a"), F.col("b2").alias("b")
                        ),
                        F.struct(
                            F.col("a3").alias("a"), F.col("b3").alias("b")
                        ),
                    )
                ).alias("_e")
            )
            .select("_e.a", "_e.b")
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("_sup"))
            .where(F.col("_sup") >= k - 2)
            .select("a", "b")
        )
        return e.join(support, ["a", "b"], "left_semi")

    ctx = {"count": state.count()}

    def _converged(_prev: DataFrame, new: DataFrame, _round: int) -> bool:
        c = new.count()
        stable = c == ctx["count"]
        ctx["count"] = c
        return stable

    final, _rounds, _done = iterate(
        state,
        _step,
        _converged,
        max_iter,
        warn=(
            f"k_truss: peeling did not reach a fixpoint within "
            f"max_iter={max_iter} rounds; result may contain edges "
            f"below the truss support"
        ),
    )
    return final.select("a", "b")


def densest_subgraph(
    edges: DataFrame, epsilon: float = 0.0, max_iter: int = 100
) -> DataFrame:
    """Greedy densest-subgraph approximation: ``DataFrame[id: long]``
    — the vertex set of the densest prefix of the peel (density =
    |E|/|V| of the undirected simple projection).

    Charikar's greedy 2-approximation in its parallel form (Bahmani,
    Kumar & Vassilvitskii, "Densest subgraph in streaming and
    MapReduce", VLDB'12): each round removes EVERY vertex with induced
    degree ≤ (1+ε)·average, tracking the density before each removal;
    the best-density snapshot wins (ties → the earliest round, i.e.
    the largest such subgraph — deterministic). ε=0 keeps the full
    2-approximation guarantee; ε>0 trades a (2+2ε) factor for
    O(log n / ε) rounds on adversarial graphs.

    Per round: one degree aggregate + two semi-joins over a
    monotonically shrinking edge set; snapshots are localCheckpoints
    (O(rounds) small vertex tables). The density/argmax bookkeeping is
    driver-side floats over exact integer counts — replayable in SQL.
    """
    state = _simple_undirected(edges).localCheckpoint()
    verts = (
        state.select(F.col("a").alias("id"))
        .union(state.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    best_density = -1.0
    best = verts
    drained = False
    for _ in range(max_iter):
        n_v = verts.count()
        if n_v == 0:
            drained = True
            break
        n_e = state.count()
        density = n_e / n_v
        if density > best_density:
            best_density = density
            best = verts
        if n_e == 0:
            drained = True
            break
        thresh = (1.0 + epsilon) * (2.0 * n_e / n_v)
        deg = _simple_degrees(state)
        keep = deg.where(F.col("deg") > F.lit(thresh)).select("id")
        state = (
            state.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
        verts = (
            state.select(F.col("a").alias("id"))
            .union(state.select(F.col("b").alias("id")))
            .distinct()
            .localCheckpoint()
        )
    if not drained:
        import warnings

        warnings.warn(
            f"densest_subgraph: peel did not drain within "
            f"max_iter={max_iter} rounds — the approximation guarantee "
            "covers only the inspected prefixes; raise max_iter or set "
            "epsilon > 0 for the O(log n / eps) round bound",
            RuntimeWarning,
            stacklevel=2,
        )
    return best


def trussness(
    edges: DataFrame,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """``DataFrame[a, b, trussness]`` (a < b) — the truss number of
    every simple undirected edge: the largest k such that the edge
    survives in the k-truss (edges in no triangle get the convention
    value 2).

    Distributed H-index fixpoint on EDGES — the nucleus-decomposition
    generalization of the vertex-coreness iteration (Sariyüce, Seshadri
    & Pinar, "Local Algorithms for Hierarchical Dense Subgraph
    Discovery", VLDB 2018): h₀(e) = triangle support; each round every
    triangle sends its member edge the MIN of the other two edges'
    current values, and h(e) becomes the H-index of the received
    multiset. The sequence is monotone non-increasing and converges
    exactly to the support-peel number; ``trussness = h + 2``. Like
    :func:`coreness`, this turns the sequential min-support peel into
    a Pregel-style fixpoint — no global priority queue.

    Shape: the triangle→member-edge table (3·#triangles rows, built
    ONCE from the degree-oriented kernel and checkpointed) is the
    per-round message source; values are capped at the receiver's
    current h before the histogram fold, so the per-edge window input
    is ≤ h(e)+1 distinct values, never the raw triangle count of a hot
    edge. Per round: two skinny hash joins against the O(E) state +
    two map-side-combinable aggregations. Every quantity is integer
    arithmetic on deterministic inputs — the gate's DuckDB oracle
    replays each round bit-for-bit.

    Cross-operator invariant (machine-checked in tests):
    ``k_truss(edges, k)`` equals ``trussness(edges) >= k`` per edge.
    """
    from pyspark.sql import Window

    from pagerank_spark.operators.triangles import _orient, _triangles

    simple = _simple_undirected(edges).localCheckpoint()
    o = _orient(simple, _simple_degrees(simple)).localCheckpoint()

    def _ek(u, v):
        return F.struct(
            F.least(u, v).alias("a"), F.greatest(u, v).alias("b")
        )

    # one row per (triangle, member edge), carrying the other two edges
    tri_edges = (
        _triangles(o)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        _ek(F.col("x"), F.col("y")).alias("e"),
                        _ek(F.col("y"), F.col("z")).alias("o1"),
                        _ek(F.col("x"), F.col("z")).alias("o2"),
                    ),
                    F.struct(
                        _ek(F.col("y"), F.col("z")).alias("e"),
                        _ek(F.col("x"), F.col("y")).alias("o1"),
                        _ek(F.col("x"), F.col("z")).alias("o2"),
                    ),
                    F.struct(
                        _ek(F.col("x"), F.col("z")).alias("e"),
                        _ek(F.col("x"), F.col("y")).alias("o1"),
                        _ek(F.col("y"), F.col("z")).alias("o2"),
                    ),
                )
            ).alias("_t")
        )
        .select("_t.e", "_t.o1", "_t.o2")
        .localCheckpoint()
    )
    state = tri_edges.groupBy("e").agg(F.count(F.lit(1)).alias("h"))

    def _step(h: DataFrame, _round: int) -> DataFrame:
        msgs = (
            tri_edges.join(
                h.select(F.col("e").alias("o1"), F.col("h").alias("h1")),
                "o1",
            )
            .join(
                h.select(F.col("e").alias("o2"), F.col("h").alias("h2")),
                "o2",
            )
            .join(h, "e")
            .select("e", F.least("h1", "h2", "h").alias("t"))
        )
        hist = msgs.groupBy("e", "t").agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.partitionBy("e")
            .orderBy(F.desc("t"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            hist.select("e", "t", F.sum("c").over(w).alias("ge"))
            .select("e", F.least("t", "ge").alias("m"))
            .groupBy("e")
            .agg(F.max("m").alias("h"))
        )

    def _converged(prev: DataFrame, new: DataFrame, _round: int) -> bool:
        return (
            new.join(prev.select("e", F.col("h").alias("_ph")), "e")
            .where(F.col("h") != F.col("_ph"))
            .count()
            == 0
        )

    final, _rounds, _done = iterate(
        state,
        _step,
        _converged,
        max_iter,
        warn=(
            f"trussness: H-index fixpoint did not converge within "
            f"max_iter={max_iter} rounds; values are upper bounds on "
            "the true truss numbers"
        ),
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    return (
        simple.join(
            final.select(F.col("e.a").alias("a"), F.col("e.b").alias("b"), "h"),
            ["a", "b"],
            "left",
        )
        .select(
            "a",
            "b",
            (F.coalesce("h", F.lit(0)) + F.lit(2))
            .cast("long")
            .alias("trussness"),
        )
    )
