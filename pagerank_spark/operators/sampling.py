"""Deterministic hash-based graph sampling.

A 100 TB training pipeline samples by CONTENT HASH, not by ``rand()``:
the decision for an edge/vertex is a pure function of (key, seed), so
the same sample falls out on every rerun, on any partitioning, across
engines — reproducible experiment subsets, stable A/B splits, and
re-joinable lineage (re-running the pipeline at a later date selects
the same rows). ``fraction`` is enforced in expectation via a
fixed-point threshold on the hash; both the Bernoulli edge sample and
the vertex-induced subgraph sample are one whole-stage-codegen'd
filter — no shuffle, no state.

``hash_fn="md5"`` (functions.text.hash64) makes the selection
reproducible by an ANSI oracle; xxhash64 is the production default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions.text import hash64

# hash bucket space: md5-mode hashes are 60-bit non-negative, so
# mod 2^20 buckets stay uniform and ANSI-portable (no sign games)
_BUCKETS = 1 << 20


def _keep(key: Column, fraction: float, seed: int, hash_fn: str) -> Column:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(round(fraction * _BUCKETS))
    h = hash64(F.concat_ws(":", key, F.lit(str(seed))), hash_fn)
    return F.pmod(h, F.lit(_BUCKETS)) < threshold


def sample_edges(
    edges: DataFrame,
    fraction: float,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bernoulli edge sample keyed on (src, dst, seed) — every
    occurrence of a duplicate edge is kept or dropped together."""
    key = F.concat_ws(":", F.col("src"), F.col("dst"))
    return edges.where(_keep(key, fraction, seed, hash_fn))


def sample_vertices_induced(
    edges: DataFrame,
    fraction: float,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Vertex-induced subgraph: keep an edge iff BOTH endpoints hash
    into the sample — the standard subgraph sample for graph-ML
    training (expected edge retention ≈ fraction², per-vertex
    neighborhoods stay internally consistent)."""
    src_in = _keep(F.col("src").cast("string"), fraction, seed, hash_fn)
    dst_in = _keep(F.col("dst").cast("string"), fraction, seed, hash_fn)
    return edges.where(src_in & dst_in)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds ``split_col``.

    The label is a pure function of (key, seed) — re-running the
    pipeline months later, or on a different partitioning or engine,
    assigns every row to the SAME split (no leakage of yesterday's
    training keys into today's eval set). Weights must sum to 1; the
    hash space is carved into consecutive ranges in the dict's
    insertion order."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    h = hash64(
        F.concat_ws(
            ":", F.col(key_col).cast("string"), F.lit(str(seed))
        ),
        hash_fn,
    )
    bucket = F.pmod(h, F.lit(_BUCKETS))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * _BUCKETS))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn(split_col, expr)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float] | float,
    key_col: str,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Stratified deterministic sampling: per-group keep fractions
    (e.g. downsample the dominant language, keep all of a rare one).
    ``fractions`` maps group value → fraction; groups not listed get
    the ``"*"`` entry if present, else 0.0. A plain float applies one
    fraction to every group (equivalent to ``sample_edges`` on rows).
    Selection is keyed on (key, seed) only — group membership decides
    the THRESHOLD, not the hash — so a row keeps the same fate if its
    group label is recomputed."""
    if isinstance(fractions, (int, float)):
        fractions = {"*": float(fractions)}
    default = fractions.get("*", 0.0)
    h = hash64(
        F.concat_ws(
            ":", F.col(key_col).cast("string"), F.lit(str(seed))
        ),
        hash_fn,
    )
    bucket = F.pmod(h, F.lit(_BUCKETS))
    thr = F.lit(int(round(default * _BUCKETS)))
    for g, frac in fractions.items():
        if g == "*":
            continue
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1]")
        thr = F.when(
            F.col(group_col) == g, F.lit(int(round(frac * _BUCKETS)))
        ).otherwise(thr)
    return df.where(bucket < thr)


def quota_per_group(
    df: DataFrame,
    group_col: str,
    quota: int | dict[str, int],
    key_col: str,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """At most ``quota`` rows per group, chosen deterministically: rows
    rank within their group by (hash(key,seed), key) and the first
    ``quota`` survive. The per-domain document cap every web-scale
    corpus applies (e.g. "at most N pages per registered domain",
    C4/Gopher-style) — hash order makes the cap a uniform sample of
    the group rather than "whatever the crawler saw first".

    ``quota`` may be a dict group-value → cap; missing groups get the
    ``"*"`` entry if present, else are kept whole (cap = 2^63-1).

    Scale shape: ONE hash-partitioned window (rank within group);
    partial ``row_number`` needs no global sort — each group sorts
    independently. A pathologically hot group serializes into one
    task's sort; cap that by pre-filtering with ``sample_per_group``
    at a few× the implied fraction before the exact rank when a group
    is known to dwarf the quota (two-phase top-K), which keeps the
    exact same survivors because both phases order by the same hash.
    """
    from pyspark.sql.window import Window

    h = hash64(
        F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed))),
        hash_fn,
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    if isinstance(quota, int):
        cap = F.lit(quota)
    else:
        default = int(quota.get("*", (1 << 63) - 1))
        cap = F.lit(default)
        for g, q in quota.items():
            if g == "*":
                continue
            cap = F.when(F.col(group_col) == g, F.lit(int(q))).otherwise(cap)
    return (
        df.withColumn("_qrn", F.row_number().over(w))
        .where(F.col("_qrn") <= cap)
        .drop("_qrn")
    )


def rebalance_mixture(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    key_col: str,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Down-sample groups to the LARGEST corpus achieving the target
    mixture without upsampling (the domain-reweighting step of
    data-mixture tuning, cf. DoReMi / The Pile's per-set weights):
    with target proportions ``targets`` (summing to ~1) and observed
    counts c_g, the achievable total is T = min_g(c_g / w_g); every
    listed group keeps exactly ``floor(w_g * T)`` rows (deterministic
    hash order via ``quota_per_group``), groups not listed are
    dropped.

    The per-group counts are a tiny driver-side aggregate (one row per
    group, not per document); selection itself never leaves the
    cluster. Raises if a target group is absent (a silent empty
    mixture is a pipeline bug).
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target weights must sum to 1 (got {total})")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1))).collect()
    }
    missing = [g for g, w in targets.items() if w > 0 and g not in counts]
    if missing:
        raise ValueError(f"target groups absent from corpus: {missing}")
    t_total = min(counts[g] / w for g, w in targets.items() if w > 0)
    quotas = {g: int(w * t_total) for g, w in targets.items() if w > 0}
    kept = df.where(F.col(group_col).isin(list(quotas)))
    return quota_per_group(kept, group_col, quotas, key_col, seed, hash_fn)
