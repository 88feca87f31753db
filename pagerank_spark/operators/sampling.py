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
