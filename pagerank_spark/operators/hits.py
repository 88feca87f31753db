"""HITS (hubs & authorities) — Kleinberg's link-analysis companion to
PageRank.

Extension beyond the C reference (it computes only PageRank,
``Page_Rank_SERIAL.c:206-279``); a link-graph engine's users expect
the other classic eigenvector pair on the same edge table. Mutual
recursion: a vertex is a good *authority* when good hubs point AT it,
a good *hub* when it points at good authorities —

    auth_k = normalize(Aᵀ · hub_{k-1});   hub_k = normalize(A · auth_k)

with L2 normalization after each half-step (the classic formulation;
the iteration converges to the principal singular pair of the
adjacency matrix). Duplicate edges count with multiplicity, matching
the engine's degree semantics (``degrees.py``).

Execution model (same loop-invariant motion as LPA / shortest paths):
the edge table is hash-partitioned and persisted ONCE per join key —
``src`` for the authority gather, ``dst`` for the hub gather — so
each round's two joins move only the O(V) score side (broadcast for
small vertex sets, shuffle-hash above; the cached O(E) sides never
re-exchange for the join). The remaining per-round O(E) motion is the
gather's partial-aggregated message shuffle (groupBy the opposite
endpoint) — the same inherent delivery cost LPA documents; PageRank
avoids it only via its specialized CSR block store, which is the
flagship path, not replicated here (measured ~10s per half-step at
E=10M on local[32]). Each half-step is materialized once and its L2 norm applied
as an in-plan broadcast scalar over the checkpointed rows — one job
per half-step, two per round (see ``_l2_normalized`` for why the
checkpoint is what prevents a 4x gather re-evaluation). Lineage stays
O(1) because every round's leaves are the half-step checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.plans.iterate import iterate


def _l2_normalized(scores: DataFrame, col: str) -> DataFrame:
    """Materialize the half-step, then divide by its L2 norm via a
    broadcast scalar subframe over the CHECKPOINTED rows.

    The checkpoint is load-bearing: the norm agg and the consuming
    select are two plan subtrees, and without it each would re-run the
    whole gather join — the doubling compounds across the hub
    half-step into ~4 gather joins per round (measured 28s for 8
    rounds at sf0.1 vs ~9s checkpointed). With the checkpoint both
    subtrees are in-memory scans, and keeping the norm in-plan (rather
    than a driver collect) keeps the round at one materialization job
    per half-step."""
    scores = scores.localCheckpoint()
    nrm = scores.agg(
        F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_nrm")
    )
    return scores.crossJoin(F.broadcast(nrm)).select(
        "id",
        (
            F.col(col)
            / F.when(F.col("_nrm") > 0, F.col("_nrm")).otherwise(F.lit(1.0))
        ).alias(col),
    )


def hits(
    edges: DataFrame,
    max_iter: int = 20,
    tol: float | None = None,
    weight_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``DataFrame[id: long, hub: double, authority: double]``.

    Runs exactly ``max_iter`` rounds when ``tol`` is None (the
    fixed-iteration form an external oracle can replay); with ``tol``
    set, stops early once the L1 delta of both score vectors drops
    below it (one extra comparison join per round). ``weight_col``
    scales both gathers by the edge weight (weighted HITS — the
    natural form on contracted/co-occurrence graphs).
    """
    spark = edges.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    # NOTE: a multiplicity pre-fold of parallel edges (bit-exact for
    # the gather sums at every driver SF) was A/B-measured in r6 and
    # REGRESSED ~20% here: with the score side broadcast, each gather
    # streams the cached edge rows through codegen anyway, and the
    # aggregated cache scans slower than the raw projection at this
    # scale — so the raw per-instance table stays (contrast
    # personalized_pagerank_keyed, where the fold won).
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = edges.select(*cols)
    if weight_col:
        e = e.withColumn(weight_col, F.col(weight_col).cast("double"))
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = vertices.count()
    # broadcast only for genuinely small score vectors: each round
    # re-broadcasts the O(V) scores FOUR times (two gathers + two
    # norms), i.e. a driver collect + torrent per use — measured 34
    # s/round at V=500k/E=10M vs ~8s with shuffle-hash against the
    # pre-partitioned caches, which moves only one O(V) exchange per
    # gather and never touches the fat side
    join_hint = "broadcast" if n <= 100_000 else "shuffle_hash"
    if join_hint == "broadcast":
        # score side replicates; a broadcast-hash join needs no fat-side
        # partitioning, so ONE cached edge copy serves both gathers
        e_src = e_dst = e.persist()
    else:
        # one persisted copy per join key: each shuffle-hash gather's
        # fat side is exchange-free every round (persist keeps the
        # partitioning visible to the planner; localCheckpoint would
        # drop it)
        e_src = e.repartition(P, "src").persist()
        e_dst = e.repartition(P, "dst").persist()

    wmul = (lambda c: F.col(weight_col) * c) if weight_col else (lambda c: c)

    def _step(state: DataFrame, _round: int) -> DataFrame:
        a_raw = (
            e_src.join(
                state.select(F.col("id").alias("src"), "hub").hint(join_hint),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(wmul(F.col("hub"))).alias("authority"))
        )
        a_full = vertices.join(a_raw, "id", "left").select(
            "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
        )
        auth = _l2_normalized(a_full, "authority")
        h_raw = (
            e_dst.join(
                auth.select(F.col("id").alias("dst"), "authority").hint(
                    join_hint
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(wmul(F.col("authority"))).alias("hub"))
        )
        h_full = vertices.join(h_raw, "id", "left").select(
            "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
        )
        hub = _l2_normalized(h_full, "hub")
        return hub.join(auth, "id")

    if tol is None:
        _converged = lambda _p, _n, _r: False  # noqa: E731 — run all rounds
    else:

        def _converged(prev: DataFrame, new: DataFrame, _round: int) -> bool:
            delta = (
                new.join(
                    prev.select(
                        "id",
                        F.col("hub").alias("_ph"),
                        F.col("authority").alias("_pa"),
                    ),
                    "id",
                )
                .agg(
                    F.sum(
                        F.abs(F.col("hub") - F.col("_ph"))
                        + F.abs(F.col("authority") - F.col("_pa"))
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            return delta is not None and delta < tol

    init = vertices.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    )
    # checkpoint=False: both half-steps are already materialized inside
    # _l2_normalized; the returned hub⋈auth join is a cheap plan over
    # those checkpoints, and a third materialization per round would
    # only add a job (round floors dominate at small scale)
    state, _rounds, _done = iterate(
        init, _step, _converged, max_iter, checkpoint=False
    )
    e_src.unpersist()
    e_dst.unpersist()
    return state.select("id", "hub", "authority")
