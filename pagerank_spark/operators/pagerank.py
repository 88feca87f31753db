"""Damped power-iteration PageRank — the reference's one true kernel.

Semantics replicated from the serial C reference (all citations into
``/root/reference``, see SURVEY.md §1.3-1.4):

- damping d = 0.85 (``Page_Rank_SERIAL.c:17``), eps = 1e-4 on the
  GLOBAL L1 residual sum_i |new_i - old_i| (``:18,252-259,279``)
- init rank = 1/n (``:158-159``); teleport (1-d)/n added every
  iteration to every vertex (``:150,244``)
- edge weight d / out_degree(src), computed ONCE before the loop
  (``:168-180``) — loop-invariant code motion, mirrored here
- duplicate edges each contribute mass (``:131-143``); self-loops are
  ordinary edges; vertices with no in-edges still get the teleport
  term (``:228-244`` — empty adjacency => sum 0)
- do-while: at least one iteration always runs; stop when
  residual <= eps (``:206,279``)
- dangling vertices (out-degree 0): the reference LEAKS their mass
  (``:244`` has no redistribution term — sum(ranks) drifts < 1).
  ``dangling="leak"`` is bit-compatible with that; the engine default
  ``dangling="redistribute"`` adds d*dangling_mass/n per vertex so
  sum(ranks) == 1 (the production behavior mandated by
  BASELINE.json.north_star).

Two physical strategies (chosen by ``mode``):

- **broadcast** (default when n fits a driver/executor vector): the
  rank vector lives as a NumPy fp64 array broadcast per iteration —
  the Spark analogue of the reference's replicated
  ``complete_page_ranks[n]`` (``Page_Rank_Basic.c:170,353-355``), but
  with O(1) driver messages per iteration instead of O(P*n) floats.
  Edges are hash-partitioned by ``dst`` and sorted within partitions
  once, then CACHED; each iteration is ONE zero-shuffle job: a
  vectorized ``mapInArrow`` kernel computes per-destination partial
  sums with ``np.add.reduceat`` over contiguous dst runs (zero
  per-row Python), and the driver collects O(n) partials, applies
  teleport + dangling mass, and computes the L1 residual in NumPy.
  This is the "salted, hash-partitioned CSR-style block partitions"
  design of the north_star: the sort-within-partition makes each
  Arrow batch a CSC run-length block, and partition skew is measured
  and bounded by hash-partitioning on dst (plus AQE).

- **join** (co-partitioned fallback when n is too big to broadcast):
  ranks stay a distributed DataFrame; each iteration is
  ``edges ⋈ ranks on src → groupBy(dst) → right-outer vertex
  completion`` — one bounded shuffle per iteration, lineage truncated
  with ``localCheckpoint`` so plans don't grow with iteration count.

Every iteration appends to a resumable checkpoint manifest (rank
vector parquet + partition lineage + per-iteration metrics: edges
scanned, residual, seconds, skew ratio), per north_rule.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
EPSILON = 1e-4

# Above this vertex count the fp64 rank vector (8B/vertex) stops being
# a sane per-iteration broadcast (2**26 = ~537MB) and the engine flips
# to the co-partitioned join strategy.
BROADCAST_MAX_N = 1 << 26


@dataclass
class PageRankResult:
    ranks: DataFrame
    iterations: int
    converged: bool
    residual: float
    metrics: list[dict] = field(default_factory=list)
    partition_lineage: dict = field(default_factory=dict)


def _infer_n(edges: DataFrame) -> int:
    row = edges.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("mx")
    ).collect()[0]
    return int(row["mx"]) + 1 if row["mx"] is not None else 0


def pagerank(
    edges: DataFrame,
    n: int | None = None,
    d: float = DAMPING,
    eps: float = EPSILON,
    dangling: str = "redistribute",
    max_iter: int | None = None,
    mode: str = "auto",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PageRankResult:
    """Compute PageRank over ``DataFrame[src: long, dst: long]``.

    Ids must be dense ``0..n-1`` (use ``densify_ids`` first for
    arbitrary id spaces). ``n`` defaults to ``1 + max(id)`` — pass it
    explicitly when the header/catalog declares more vertices than the
    edges touch (``Page_Rank_SERIAL.c:155-159``: rank slots exist for
    every id < n).
    """
    if dangling not in ("redistribute", "leak"):
        raise ValueError("dangling must be 'redistribute' or 'leak'")
    if n is None:
        n = _infer_n(edges)
    if n <= 0:
        raise ValueError("empty graph")
    if mode == "auto":
        mode = "broadcast" if n <= BROADCAST_MAX_N else "join"
    if mode == "broadcast":
        return _pagerank_broadcast(
            edges, n, d, eps, dangling, max_iter, num_partitions,
            checkpoint_dir, resume,
        )
    if mode == "join":
        return _pagerank_join(
            edges, n, d, eps, dangling, max_iter, num_partitions,
            checkpoint_dir, resume,
        )
    raise ValueError(f"unknown mode {mode!r}")


# --------------------------------------------------------------------------
# broadcast-rank strategy
# --------------------------------------------------------------------------

def _spmv_kernel(rank_bcast, weight_bcast):
    """Per-partition SpMV: new_partial[dst] = sum over dst-run of
    w[src] * rank[src].

    The input is sorted by dst within the partition, so each Arrow
    batch is a sequence of contiguous dst runs; ``np.add.reduceat``
    sums each run in one vectorized pass (the NumPy analogue of the
    reference's per-adjacency-list accumulate,
    ``Page_Rank_SERIAL.c:228-240``). A run split across batch
    boundaries yields two partials for the same dst; the driver's
    ``np.add.at`` recombines them exactly.
    """

    def kernel(batches):
        w = weight_bcast.value
        r = rank_bcast.value
        for batch in batches:
            m = batch.num_rows
            if m == 0:
                continue
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            contrib = w[src] * r[src]
            starts = np.flatnonzero(np.diff(dst)) + 1
            starts = np.concatenate(([0], starts))
            sums = np.add.reduceat(contrib, starts)
            yield pa.RecordBatch.from_arrays(
                [pa.array(dst[starts]), pa.array(sums)], ["dst", "s"]
            )

    return kernel


def _pagerank_broadcast(
    edges, n, d, eps, dangling, max_iter, num_partitions, checkpoint_dir, resume
):
    spark = edges.sparkSession
    sc = spark.sparkContext
    P = num_partitions or sc.defaultParallelism

    # Out-degree vector (duplicates counted). One shuffle, n-bounded.
    deg_pdf = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("c")).toPandas()
    )
    out_deg = np.zeros(n, dtype=np.float64)
    out_deg[deg_pdf["src"].to_numpy()] = deg_pdf["c"].to_numpy()
    dangling_mask = out_deg == 0.0
    weights = np.zeros(n, dtype=np.float64)
    nz = ~dangling_mask
    weights[nz] = d / out_deg[nz]  # w = d/out_deg, once, before the loop
    weight_bcast = sc.broadcast(weights)

    # ONE shuffle total: hash-partition by dst + sort within partitions.
    # Cached — every subsequent iteration is a zero-shuffle scan of this.
    prepared = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .repartition(P, "dst")
        .sortWithinPartitions("dst")
        .persist()
    )
    edge_count = prepared.count()  # materialize the cache

    # Partition lineage + skew metric, measured once on the real layout.
    part_sizes = {
        int(r["pid"]): int(r["cnt"])
        for r in prepared.groupBy(
            F.spark_partition_id().alias("pid")
        ).count().withColumnRenamed("count", "cnt").collect()
    }
    sizes = np.array(list(part_sizes.values()) or [0], dtype=np.float64)
    skew_ratio = float(sizes.max() / sizes.mean()) if sizes.sum() else 1.0
    lineage = {
        "num_partitions": P,
        "partition_edge_counts": part_sizes,
        "skew_ratio": skew_ratio,
        "edge_count": edge_count,
    }

    rank = np.full(n, 1.0 / n, dtype=np.float64)
    start_iter = 0
    metrics: list[dict] = []
    if resume and checkpoint_dir:
        state = _load_checkpoint(checkpoint_dir)
        if state is not None:
            rank, start_iter, metrics = state

    teleport = (1.0 - d) / n
    out_schema = "dst long, s double"
    it = start_iter
    residual = float("inf")
    converged = False
    while True:
        t0 = time.monotonic()
        rank_bcast = sc.broadcast(rank)
        parts = prepared.mapInArrow(
            _spmv_kernel(rank_bcast, weight_bcast), out_schema
        ).toPandas()
        dm = float(rank[dangling_mask].sum()) if dangling == "redistribute" else 0.0
        new = np.full(n, teleport + d * dm / n, dtype=np.float64)
        if len(parts):
            np.add.at(
                new, parts["dst"].to_numpy(), parts["s"].to_numpy()
            )
        residual = float(np.abs(new - rank).sum())  # global L1
        rank = new
        rank_bcast.unpersist()
        it += 1
        metrics.append(
            {
                "iteration": it,
                "residual": residual,
                "seconds": time.monotonic() - t0,
                "edges_scanned": edge_count,
                "shuffle_rows": 0,
                "skew_ratio": skew_ratio,
            }
        )
        if checkpoint_dir:
            _save_checkpoint(checkpoint_dir, rank, it, metrics, lineage)
        if residual <= eps:  # do-while: >=1 iteration always ran
            converged = True
            break
        if max_iter is not None and it - start_iter >= max_iter:
            break

    prepared.unpersist()
    weight_bcast.unpersist()
    ranks_df = spark.createDataFrame(
        pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "rank": pa.array(rank)})
    )
    return PageRankResult(ranks_df, it, converged, residual, metrics, lineage)


# --------------------------------------------------------------------------
# co-partitioned join strategy (n too large to broadcast)
# --------------------------------------------------------------------------

def _pagerank_join(
    edges, n, d, eps, dangling, max_iter, num_partitions, checkpoint_dir, resume
):
    spark = edges.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    teleport = (1.0 - d) / n

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # Weight the edge table once (loop-invariant, Page_Rank_SERIAL.c:168-180)
    # and pre-partition it by src so the per-iteration ranks join shuffles
    # only the (small) rank side. AQE may broadcast out_deg if it fits.
    edges_w = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(d) / F.col("out_deg")).alias("w"))
        .repartition(P, "src")
        .persist()
    )
    edge_count = edges_w.count()

    vertices = spark.range(n).select(F.col("id").cast("long"))
    dangling_ids = vertices.join(
        out_deg.select(F.col("src").alias("id")), "id", "left_anti"
    ).persist()

    ranks = vertices.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    it, residual, converged = 0, float("inf"), False
    metrics: list[dict] = []
    lineage = {"num_partitions": P, "edge_count": edge_count, "mode": "join"}
    while True:
        t0 = time.monotonic()
        if dangling == "redistribute":
            dm_row = ranks.join(dangling_ids, "id", "left_semi").agg(
                F.sum("rank").alias("dm")
            ).collect()[0]
            dm = float(dm_row["dm"] or 0.0)
        else:
            dm = 0.0
        base = teleport + d * dm / n
        contrib = (
            edges_w.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("rank")).alias("s"))
        )
        # Right-outer completion: vertices with no in-edges get base only
        # (Page_Rank_SERIAL.c:228-244; SURVEY.md §1.3.4).
        new_ranks = (
            vertices.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(base)).alias("rank"),
            )
            .localCheckpoint()  # truncate lineage: plan stays O(1) per iter
        )
        residual = float(
            new_ranks.withColumnRenamed("rank", "nr")
            .join(ranks, "id")
            .agg(F.sum(F.abs(F.col("nr") - F.col("rank"))).alias("res"))
            .collect()[0]["res"]
        )
        ranks = new_ranks
        it += 1
        metrics.append(
            {
                "iteration": it,
                "residual": residual,
                "seconds": time.monotonic() - t0,
                "edges_scanned": edge_count,
                "shuffle_rows": n,
                "skew_ratio": None,
            }
        )
        if checkpoint_dir:
            _save_checkpoint_df(checkpoint_dir, ranks, it, metrics, lineage)
        if residual <= eps:
            converged = True
            break
        if max_iter is not None and it >= max_iter:
            break
    edges_w.unpersist()
    dangling_ids.unpersist()
    return PageRankResult(ranks, it, converged, residual, metrics, lineage)


# --------------------------------------------------------------------------
# resumable checkpoints (rank vector + partition lineage + metrics)
# --------------------------------------------------------------------------

def _save_checkpoint(ckpt_dir, rank, iteration, metrics, lineage):
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = os.path.join(ckpt_dir, "_rank.tmp.parquet")
    final = os.path.join(ckpt_dir, "rank.parquet")
    pq.write_table(
        pa.table({"id": pa.array(np.arange(len(rank), dtype=np.int64)),
                  "rank": pa.array(rank)}),
        tmp,
    )
    os.replace(tmp, final)
    _write_manifest(ckpt_dir, iteration, metrics, lineage, final)


def _save_checkpoint_df(ckpt_dir, ranks_df, iteration, metrics, lineage):
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"rank_iter_{iteration:05d}.parquet")
    ranks_df.write.mode("overwrite").parquet(path)
    _write_manifest(ckpt_dir, iteration, metrics, lineage, path)


def _write_manifest(ckpt_dir, iteration, metrics, lineage, rank_path):
    # Manifest written AFTER the rank vector lands, via atomic rename —
    # a reader never observes a manifest pointing at a half-written file.
    manifest = {
        "iteration": iteration,
        "rank_path": rank_path,
        "partition_lineage": lineage,
        "metrics": metrics,
    }
    tmp = os.path.join(ckpt_dir, "_manifest.tmp.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.json"))


def _load_checkpoint(ckpt_dir):
    mpath = os.path.join(ckpt_dir, "manifest.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        manifest = json.load(f)
    tbl = pq.read_table(manifest["rank_path"])
    order = np.argsort(tbl.column("id").to_numpy())
    rank = tbl.column("rank").to_numpy()[order].astype(np.float64)
    return rank, manifest["iteration"], manifest.get("metrics", [])
