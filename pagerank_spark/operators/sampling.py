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


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023):
    ``(doc_id, n_grams, log_weight)`` — per raw document the
    log-likelihood ratio of a hashed-n-gram bag-of-features model fit
    on ``target`` vs one fit on ``raw`` itself. Documents that "look
    like" the target distribution (e.g. a curated high-quality subset)
    get high weights; selecting by weight steers a web-scale corpus
    toward the target domain without training a classifier.

    Features are unigrams + bigrams of lowercase whitespace tokens,
    hashed into ``buckets`` with the seeded engine hash; both feature
    distributions are add-1 smoothed over the bucket space, so

        log_weight(i) = Σ_f c_{i,f} · [ln(tc_f + 1) − ln(T + B)
                                      − ln(rc_f + 1) + ln(R + B)]

    with c the doc's bucket counts, tc/rc the target/raw bucket
    totals, T/R the gram totals and B the bucket count. Zero-token
    documents have no defined score and are absent (the perplexity
    convention).

    Scale shape: documents reduce to skinny ``(doc, bucket, count)``
    rows (text never shuffles past the explode); the two corpus
    distributions are ≤ B-row tables broadcast into one join; the
    per-doc fold is a map-side-combinable sum. ``hash_fn="md5"`` makes
    every hash — and therefore the whole score surface — replayable by
    the ANSI oracle (log arithmetic is IEEE-identical cross-engine up
    to per-doc summation order, absorbed by the gate's rounding).
    """
    if buckets <= 0:
        raise ValueError("buckets must be positive")

    def _feats(df: DataFrame) -> DataFrame:
        toks = F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda w: w != "",
        )
        bi = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return (
            df.select(
                F.col(id_col).alias("doc_id"),
                F.explode(F.concat(toks, bi)).alias("g"),
            )
            .select(
                "doc_id",
                F.pmod(
                    hash64(
                        F.concat_ws(":", F.col("g"), F.lit(str(seed))),
                        hash_fn,
                    ),
                    F.lit(buckets),
                ).alias("b"),
            )
            .groupBy("doc_id", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    raw_f = _feats(raw)
    tgt_f = _feats(target)
    rc = raw_f.groupBy("b").agg(F.sum("c").alias("rc"))
    tc = tgt_f.groupBy("b").agg(F.sum("c").alias("tc"))
    dist = (
        rc.join(tc, "b", "left")
        .crossJoin(
            F.broadcast(
                rc.agg(F.sum("rc").alias("_R")).crossJoin(
                    tc.agg(F.sum("tc").alias("_T"))
                )
            )
        )
        .select(
            "b",
            (
                F.log(F.coalesce("tc", F.lit(0)) + F.lit(1))
                - F.log(F.col("_T") + F.lit(buckets))
                - F.log(F.col("rc") + F.lit(1))
                + F.log(F.col("_R") + F.lit(buckets))
            ).alias("lr"),
        )
    )
    return (
        raw_f.join(F.broadcast(dist), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("lr")).alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """DSIR selection: the ``k`` raw documents sampled toward the
    target distribution — ``(doc_id, log_weight, key)``, highest key
    first. Gumbel top-k turns importance RESAMPLING without
    replacement into a deterministic order statistic: with
    ``g_i = −ln(−ln(u_i))`` and u_i a (0,1) uniform derived from the
    seeded doc-id hash, taking the top k of ``log_weight + g`` draws
    exactly the softmax sample the DSIR paper specifies — but as a
    pure function of (doc_id, seed), so the same k documents fall out
    on every rerun, partitioning, and engine.

    Scale shape: scoring is :func:`dsir_weights`; selection is ONE
    ``TakeOrderedAndProject`` heap over the O(docs) score rows — no
    global sort, nothing but (id, double) pairs move.
    """
    w = dsir_weights(raw, target, id_col, text_col, buckets, seed, hash_fn)
    u = (
        F.pmod(
            hash64(
                F.concat_ws(
                    ":", F.col("doc_id").cast("string"), F.lit("g"),
                    F.lit(str(seed)),
                ),
                hash_fn,
            ),
            F.lit(1 << 53),
        )
        + F.lit(0.5)
    ) / F.lit(float(1 << 53))
    return (
        w.select(
            "doc_id",
            "log_weight",
            (F.col("log_weight") - F.log(-F.log(u))).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(k)
    )
