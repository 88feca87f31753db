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
