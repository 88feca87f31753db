"""R-MAT synthetic graph generation.

Chakrabarti, Zhan & Faloutsos, "R-MAT: A Recursive Model for Graph
Mining" (SDM 2004): each edge picks one of four quadrants of the
adjacency matrix with probabilities (a, b, c, d) at every one of
``scale`` recursion levels, yielding a power-law graph with community
structure — the generator behind the Graph500 benchmark. A distributed
deterministic generator is the natural companion to this engine: it
synthesizes arbitrarily large test/benchmark graphs (2^scale vertices,
any edge count) with ZERO input data and ZERO shuffles.

Determinism: instead of an RNG stream (order-dependent, partition-
dependent), every (edge, level) decision is a pure hash of
``"{eid}-{level}-{seed}"`` reduced mod 2^20 and compared against
INTEGER thresholds round(a*2^20), round((a+b)*2^20),
round((a+b+c)*2^20). All-integer arithmetic end to end, so the same
(n_edges, scale, seed) produces the identical edge list on any
partition layout, executor count, or engine — the md5 hash mode
replays bit-exact in ANSI SQL (see ``functions/text.py:hash64``).

Scale shape: one ``spark.range(n_edges)`` scan and per-row codegen
expressions (scale × hash + compare) — no shuffle, no state, perfectly
parallel; generating 10^9 edges is embarrassingly parallel across any
cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_spark.functions.text import hash64

_M = 1 << 20  # per-level hash resolution


def rmat_edges(
    spark: SparkSession,
    n_edges: int,
    scale: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_edges`` R-MAT edges over 2^scale vertices.

    Quadrant probabilities are (a, b, c, d = 1-a-b-c); the defaults are
    the Graph500/Kronecker standard (0.57, 0.19, 0.19, 0.05). Returns
    ``(eid, src, dst)`` with ``eid`` in [0, n_edges) and vertex ids in
    [0, 2^scale). Self-loops and parallel edges occur, as the model
    specifies; isolated vertex ids simply never appear.
    """
    if not 1 <= scale <= 62:
        raise ValueError("rmat_edges: scale must be in [1, 62]")
    d = 1.0 - a - b - c
    if min(a, b, c, d) < 0:
        raise ValueError("rmat_edges: probabilities must be >= 0")
    t1 = round(a * _M)
    t2 = round((a + b) * _M)
    t3 = round((a + b + c) * _M)

    df = spark.range(0, n_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    df = df.select(F.col("id").alias("eid"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        h = hash64(
            F.concat_ws(
                "-",
                F.col("eid").cast("string"),
                F.lit(str(lvl)),
                F.lit(str(seed)),
            ),
            hash_fn,
        )
        u = F.pmod(h, F.lit(_M))
        # quadrants: [0,t1)->(0,0)  [t1,t2)->(0,1)  [t2,t3)->(1,0)  [t3,M)->(1,1)
        sbit = F.when(u < t2, F.lit(0)).otherwise(F.lit(1))
        dbit = (
            F.when(u < t1, F.lit(0))
            .when(u < t2, F.lit(1))
            .when(u < t3, F.lit(0))
            .otherwise(F.lit(1))
        )
        src = src * 2 + sbit
        dst = dst * 2 + dbit
    return df.select("eid", src.alias("src"), dst.alias("dst"))
