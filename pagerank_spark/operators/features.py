"""Recursive structural vertex features (ReFeX-style).

Henderson et al., "It's Who You Know: Graph Mining Using Recursive
Structural Features" (KDD 2011): start from local features (degrees)
and repeatedly append neighborhood aggregates of the previous round's
features. Two rounds already separate roles (hub, bridge, periphery,
spam-farm satellite) that raw degree can't — the classic cheap
"structural embedding" for role mining and as input to downstream
link-graph classifiers.

This implementation keeps every recursive feature an INTEGER SUM
(counts and sums of counts), so results are exact, order-independent,
and bit-reproducible in ANSI SQL — the published mean/variance
variants are one division away from these sufficient statistics and
are emitted as final-step ratios. Int64 bounds: a round-2 sum is at
most E·max(round-1 sum) ≤ E²·max_deg, which stays inside int64
(< 9.2e18) for any graph with E·max_deg·max_deg' < 2^63 — every
realistic web graph, but exceedable by an adversarial 10⁹-edge /
10⁷-degree-hub shape. The engine runs Spark's ANSI mode (the Spark 4
default), so that extreme FAILS LOUDLY with an arithmetic-overflow
error rather than silently wrapping (the failure mode the s-metric
hardening closed); widen the sums to ``decimal(38,0)`` the way
``wl.py:74`` does if such a graph is the actual workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def refex_features(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Recursive feature vectors over the directed edge table.

    Round 0 per vertex: ``out_deg``, ``in_deg`` (edge multiplicity
    counts, consistent with the engine's multigraph semantics).
    Round r ≥ 1 appends, for each round-(r−1) feature f, the sums of
    f over out-neighbors and over in-neighbors (with multiplicity —
    each edge contributes once, the regular-equivalence convolution).
    The full recursive closure grows exponentially in r; this build
    carries the degree-chain subset (the features the ReFeX paper's
    pruning step retains first): round 1 has the 4 cross sums
    (out/in × out_deg/in_deg) and round 2 the 4 second-order sums of
    the round-1 out/in sums along the same side.

    Returns one row per vertex (column names are ``prefix + '_' +
    source column``, so the degree columns appear with underscores)::

        (id, out_deg, in_deg,
         s_out_out_deg, s_out_in_deg, s_in_out_deg, s_in_in_deg,
         s2_out_s_out_out_deg, s2_out_s_out_in_deg,
         s2_in_s_in_out_deg, s2_in_s_in_in_deg,
         mean_out_outdeg, mean_in_indeg)

    The two trailing means (avg out-degree of out-neighbors, avg
    in-degree of in-neighbors) are the classic "neighbor degree"
    ratios, computed as exact-integer / exact-integer at the very end.

    Scale shape per round: two shuffles keyed on ``src``/``dst`` (the
    same partitioning every round — co-partitioned with the degree
    frames), map-side-combinable sums, O(V) state. No explosion: the
    feature frame is one row per vertex regardless of rounds.
    """
    if rounds != 2:
        raise ValueError("refex_features: this build pins rounds=2")
    e = edges.select("src", "dst")
    od = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    idg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    base = (
        od.join(idg, "id", "full")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )

    def agg_over(e_df, key, other, feats, prefix):
        """Sum the neighbor's features over edges grouped by `key`."""
        nb = base if feats is None else feats
        joined = e_df.join(
            nb.withColumnRenamed("id", "_nb"),
            F.col(other) == F.col("_nb"),
        )
        cols = [c for c in nb.columns if c != "id"]
        return joined.groupBy(F.col(key).alias("id")).agg(
            *[F.sum(c).alias(f"{prefix}_{c}") for c in cols]
        )

    # round 1: neighbor degree sums
    r1_out = agg_over(e, "src", "dst", None, "s_out")  # over out-nbrs
    r1_in = agg_over(e, "dst", "src", None, "s_in")  # over in-nbrs
    f1 = (
        base.join(r1_out, "id", "left")
        .join(r1_in, "id", "left")
        .select(
            "id",
            "out_deg",
            "in_deg",
            *[
                F.coalesce(c, F.lit(0)).alias(c)
                for c in (
                    "s_out_out_deg",
                    "s_out_in_deg",
                    "s_in_out_deg",
                    "s_in_in_deg",
                )
            ],
        )
    )
    # round 2: second-order sums of the same-side round-1 features
    out_feats = f1.select("id", "s_out_out_deg", "s_out_in_deg")
    in_feats = f1.select("id", "s_in_out_deg", "s_in_in_deg")
    r2_out = agg_over(e, "src", "dst", out_feats, "s2_out")
    r2_in = agg_over(e, "dst", "src", in_feats, "s2_in")
    f2 = (
        f1.join(r2_out, "id", "left")
        .join(r2_in, "id", "left")
        .select(
            *f1.columns,
            *[
                F.coalesce(c, F.lit(0)).alias(c)
                for c in (
                    "s2_out_s_out_out_deg",
                    "s2_out_s_out_in_deg",
                    "s2_in_s_in_out_deg",
                    "s2_in_s_in_in_deg",
                )
            ],
        )
    )
    return f2.select(
        *f2.columns,
        F.when(
            F.col("out_deg") > 0,
            F.col("s_out_out_deg").cast("double") / F.col("out_deg"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_out_outdeg"),
        F.when(
            F.col("in_deg") > 0,
            F.col("s_in_in_deg").cast("double") / F.col("in_deg"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_in_indeg"),
    )
