"""Degree aggregations (reference O4/O5: ``Page_Rank_SERIAL.c:142-143``).

Duplicate edges are counted — a doubled edge doubles the degree
(``Page_Rank_SERIAL.c:131-143``), so these are plain ``count(*)``
aggregations, NOT ``count(distinct)``. Spark executes them as
partial (map-side) + final hash aggregates: the shuffle carries one
row per distinct vertex, not per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """``DataFrame[id, out_deg]`` — edges counted per source, duplicates kept."""
    return edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def in_degrees(edges: DataFrame, dst: str = "dst") -> DataFrame:
    """``DataFrame[id, in_deg]`` — edges counted per destination."""
    return edges.groupBy(F.col(dst).alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """``DataFrame[degree: long, n_vertices: long]`` — distribution of
    TOTAL degree (out + in, duplicates counted, matching ``degrees``).

    Two chained aggregations, both map-side combinable; the second's
    input is one row per vertex, so the histogram is effectively free
    after the degree pass — the standard first look at a web-scale
    graph (power-law check, max-degree skew estimate for salting).
    """
    total = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return total.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """``DataFrame[reciprocity: double]`` (one row) — the fraction of
    distinct non-loop directed edges whose reverse edge also exists.

    One self-join on the deduplicated edge set; at scale both sides
    shuffle on (src, dst) once — there is no cheaper exact formulation
    (reciprocity is inherently a pair lookup). 0.0 for a graph with no
    non-loop edges.
    """
    d = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    rev = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    both = d.join(rev, ["src", "dst"], "left_semi")
    return both.agg(F.count(F.lit(1)).alias("_m")).crossJoin(
        d.agg(F.count(F.lit(1)).alias("_t"))
    ).select(
        F.when(F.col("_t") > 0, F.col("_m") / F.col("_t"))
        .otherwise(F.lit(0.0))
        .alias("reciprocity")
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """``DataFrame[id, out_deg, in_deg]`` — full outer join of both sides.

    Vertices appearing only as a source (dangling) or only as a
    destination still get a row, with the missing side coalesced to 0.
    """
    return (
        out_degrees(edges, src)
        .join(in_degrees(edges, dst), "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """``DataFrame[assortativity: double]`` (one row) — Pearson
    correlation between source out-degree and destination in-degree
    across directed edge instances (the out-in degree assortativity of
    Newman, "Assortative mixing in networks", PRL 2002). Positive:
    hubs link to hubs; negative: hubs link to leaves; NULL when either
    variance is zero (e.g. a regular graph).

    Numerics: the five moment sums are aggregated as exact integers
    (decimal(38,0) — order-insensitive, so the result is
    bit-reproducible across partitionings AND engines), and the
    Pearson formula is one closed-form double expression at the end.
    That's deliberately NOT ``F.corr`` — streaming covariance
    accumulates float error in partition order. The two degree joins
    move only the O(V) degree tables against the edge list; the
    moment aggregation is a single map-side-combinable pass.
    """
    xy = (
        edges.select("src", "dst")
        .join(out_degrees(edges).select(F.col("id").alias("src"), F.col("out_deg").alias("_x")), "src")
        .join(in_degrees(edges).select(F.col("id").alias("dst"), F.col("in_deg").alias("_y")), "dst")
    )
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d(F.col("_x"))).cast("double").alias("sx"),
        F.sum(d(F.col("_y"))).cast("double").alias("sy"),
        F.sum(d(F.col("_x")) * d(F.col("_x"))).cast("double").alias("sxx"),
        F.sum(d(F.col("_y")) * d(F.col("_y"))).cast("double").alias("syy"),
        F.sum(d(F.col("_x")) * d(F.col("_y"))).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.when(
            (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
        ).alias("assortativity")
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """``DataFrame[k, n_rich, e_rich, rich_club]`` — the rich-club
    coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) of the undirected simple
    graph, where N_k counts vertices of degree > k and E_k the edges
    between them (Zhou & Mondragón, "The rich-club phenomenon in the
    Internet topology", IEEE Comm. Lett. 2004). A rising φ(k) means
    hubs preferentially interlink — the structural signature of a
    link-farm core or an oligarchic backbone.

    φ is piecewise-constant between consecutive degree values, so the
    output grid is k = 0 plus every distinct degree present — every
    distinct φ value appears exactly once. Rows with N_k < 2 (φ
    undefined) are dropped.

    Shape: one degree pass (O(V) rows shuffled), one degree histogram
    and one edge min-endpoint-degree histogram (both map-side
    combinable, output ≤ one row per DISTINCT degree value — thousands
    even at web scale), then suffix sums by descending k on that tiny
    frame. The single-partition window is deliberate and safe: its
    input is the histogram, never the graph. Extension beyond the C
    reference (SURVEY.md §2.3 family).
    """
    from pyspark.sql import Window

    from pagerank_spark.operators.triangles import (
        _simple_degrees,
        _simple_undirected,
    )

    simple = _simple_undirected(edges).localCheckpoint()
    deg = _simple_degrees(simple).localCheckpoint()
    dhist = deg.groupBy(F.col("deg").alias("k")).agg(
        F.count(F.lit(1)).alias("_nv")
    )
    # min(deg a, deg b) per edge: an edge survives the degree-> k cut
    # iff BOTH endpoints exceed k, i.e. iff min(da, db) > k.
    mhist = (
        simple.join(
            deg.select(F.col("id").alias("a"), F.col("deg").alias("_da")),
            "a",
        )
        .join(
            deg.select(F.col("id").alias("b"), F.col("deg").alias("_db")),
            "b",
        )
        .groupBy(F.least("_da", "_db").alias("k"))
        .agg(F.count(F.lit(1)).alias("_ne"))
    )
    zero = edges.sparkSession.range(1).select(
        F.lit(0).cast("long").alias("k")
    )
    grid = (
        dhist.select("k")
        .union(zero)
        .distinct()
        .join(dhist, "k", "left")
        .join(mhist, "k", "left")
        .select(
            "k",
            F.coalesce("_nv", F.lit(0)).alias("_nv"),
            F.coalesce("_ne", F.lit(0)).alias("_ne"),
        )
    )
    # suffix sums: everything STRICTLY above this k (rows are distinct
    # k values, so "previous rows in descending order" is exactly > k)
    w = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        grid.select(
            "k",
            F.coalesce(F.sum("_nv").over(w), F.lit(0)).alias("n_rich"),
            F.coalesce(F.sum("_ne").over(w), F.lit(0)).alias("e_rich"),
        )
        .where(F.col("n_rich") >= 2)
        .select(
            "k",
            "n_rich",
            "e_rich",
            (
                2.0
                * F.col("e_rich")
                / (F.col("n_rich") * (F.col("n_rich") - F.lit(1)))
            ).alias("rich_club"),
        )
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """``DataFrame[degree, knn, n_vertices]`` — the degree-correlation
    curve k_nn(k): for each degree class k, the mean over vertices of
    degree k of the average degree of their neighbors
    (Pastor-Satorras, Vázquez & Vespignani, "Dynamical and correlation
    properties of the Internet", PRL 2001). A falling curve is
    disassortative (hubs feed leaves — typical of the web); rising is
    assortative. The per-vertex intermediate is the standard ML
    feature; the curve is its stable, plottable summary.

    Numerics: within a degree class every vertex divides by the same
    k, so the mean of per-vertex averages collapses to
    ``Σ_v S_v / (k · N_k)`` with ``S_v`` the integer sum of v's
    neighbor degrees — aggregated exactly (order-insensitive, so the
    result is bit-reproducible across partitionings AND engines, the
    assortativity convention), one closed-form double at the end.

    Shape: one degree pass, one join of the O(E) symmetric edge list
    against the O(V) degree table (degree rides to the neighbor side),
    then two map-side-combinable integer aggregations (per vertex, per
    degree class). No window, no driver state. Undirected simple-graph
    semantics, like the triangle family. Extension beyond the C
    reference (SURVEY.md §2.3 family).
    """
    from pagerank_spark.operators.triangles import (
        _simple_degrees,
        _simple_undirected,
    )

    simple = _simple_undirected(edges).localCheckpoint()
    deg = _simple_degrees(simple).localCheckpoint()
    sym = simple.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        simple.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    per_vertex = (
        sym.join(deg.select(F.col("id").alias("v"), F.col("deg").alias("_dn")), "v")
        .groupBy("u")
        .agg(F.sum("_dn").alias("_s"))
    )
    return (
        per_vertex.join(
            deg.select(F.col("id").alias("u"), F.col("deg").alias("degree")),
            "u",
        )
        .groupBy("degree")
        .agg(
            F.sum("_s").alias("_ss"),
            F.count(F.lit(1)).alias("n_vertices"),
        )
        .select(
            "degree",
            (
                F.col("_ss").cast("double")
                / (F.col("degree") * F.col("n_vertices"))
            ).alias("knn"),
            "n_vertices",
        )
    )


def s_metric(edges: DataFrame, normalized: bool = False) -> DataFrame:
    """One-row ``DataFrame[s_metric: long]`` (or ``double`` normalized)
    — s(G) = Σ over simple undirected edges of deg(u)·deg(v) (Li,
    Alderson, Doyle & Willinger, "Towards a Theory of Scale-Free
    Graphs", Internet Math. 2005). The scalar complement of the
    rich-club curve: among graphs with the SAME degree sequence, s is
    maximal exactly when hubs interlink, so s separates "scale-free"
    hub-core topologies from random ones the degree histogram alone
    cannot tell apart. ``normalized`` divides by Σ deg³/2, an upper
    bound on s over ALL graphs with the degree sequence (each edge at
    a vertex of degree d contributes at most d·d_max-neighbor ≤ the
    cube-sum bound), giving a [0, 1]-comparable value.

    One degree pass, two O(V)-vs-O(E) joins, one exact integer scalar
    agg; the normalization adds one histogram-sized agg. Both scalar
    sums are widened to ``decimal(38,0)`` BEFORE summing (the
    ``wl.py`` precedent): ``deg³`` alone exceeds int64 at deg ≈ 2.1M
    and Σ deg_u·deg_v can exceed it on hub-dense web graphs, where a
    long sum would wrap silently under non-ANSI Spark. The
    un-normalized output column stays ``long`` — exact while
    s(G) < 2⁶³ (any overflow surfaces as NULL at the final decimal→
    long cast, never as a silently wrapped value); the normalized
    ratio is computed from the exact decimal sums in double.
    """
    from pagerank_spark.operators.triangles import (
        _simple_degrees,
        _simple_undirected,
    )

    simple = _simple_undirected(edges).localCheckpoint()
    deg = _simple_degrees(simple).localCheckpoint()
    s = (
        simple.join(
            deg.select(F.col("id").alias("a"), F.col("deg").alias("_da")),
            "a",
        )
        .join(
            deg.select(F.col("id").alias("b"), F.col("deg").alias("_db")),
            "b",
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.col("_da").cast("decimal(19,0)")
                    * F.col("_db").cast("decimal(19,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_s")
        )
    )
    if not normalized:
        return s.select(F.col("_s").cast("long").alias("s_metric"))
    # deg as decimal(13,0) keeps the cube product inside decimal(38,0)
    # for dmax up to ~10^12 while Σ deg³ ≤ dmax²·2E stays exact
    d13 = F.col("deg").cast("decimal(13,0)")
    smax = deg.agg(
        (F.sum(d13 * d13 * d13).cast("double") / 2.0).alias("_m")
    )
    return s.crossJoin(smax).select(
        F.when(
            F.col("_m") > 0, F.col("_s").cast("double") / F.col("_m")
        )
        .otherwise(F.lit(0.0))
        .alias("s_metric")
    )


def attribute_assortativity(
    edges: DataFrame,
    labels: DataFrame,
    label_col: str | None = None,
) -> DataFrame:
    """Nominal attribute assortativity (Newman, "Mixing patterns in
    networks", PRE 2003, eq. 2) over DIRECTED edge instances — one
    row ``DataFrame[n_edges, r]``:

        r = (Σ_i e_ii − Σ_i a_i b_i) / (1 − Σ_i a_i b_i)

    with ``e_ij`` the fraction of edges from category i to category j,
    ``a_i = Σ_j e_ij`` (out-margin), ``b_i = Σ_j e_ji`` (in-margin).
    r = 1 means edges stay within categories (perfect homophily —
    e.g. links staying inside a language/domain community), 0 the
    random-mixing baseline, negative disassortative; NULL when every
    edge is intra-category by construction (denominator 0). Edges with
    an unlabeled endpoint are dropped (and excluded from ``n_edges``).

    The categorical twin of :func:`degree_assortativity`, and the
    quantitative form of the per-community edge fractions
    ``contract_graph`` exposes. Shape: two label joins against the
    O(V) side (broadcast under the usual threshold), one mixing-matrix
    aggregation bounded by (#categories)², two margin folds — the
    matrix frame, never the graph, carries all downstream arithmetic.
    """
    # label/component columns both accepted, like modularity/conductance
    lc = label_col or (
        "label" if "label" in labels.columns else "component"
    )
    lab = labels.select("id", F.col(lc).alias("_c"))
    m = (
        edges.select("src", "dst")
        .join(lab.select(F.col("id").alias("src"), F.col("_c").alias("_ci")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("_c").alias("_cj")), "dst")
        .groupBy("_ci", "_cj")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = m.agg(F.sum("n").alias("t"))
    am = m.groupBy("_ci").agg(F.sum("n").alias("na"))
    bm = m.groupBy("_cj").agg(F.sum("n").alias("nb"))
    trace = m.where(F.col("_ci") == F.col("_cj")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("tr")
    )
    ab = (
        am.join(bm, am["_ci"] == bm["_cj"])
        .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("sab"))
    )
    return (
        tot.crossJoin(trace)
        .crossJoin(ab)
        .select(
            F.col("t").cast("long").alias("n_edges"),
            F.when(
                (F.col("t") > 0)
                & (F.col("t") * F.col("t") != F.col("sab")),
                (
                    F.col("tr").cast("double") / F.col("t")
                    - F.col("sab").cast("double") / (F.col("t") * F.col("t"))
                )
                / (
                    F.lit(1.0)
                    - F.col("sab").cast("double")
                    / (F.col("t") * F.col("t"))
                ),
            ).alias("r"),
        )
    )
