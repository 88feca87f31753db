"""10M-edge incremental-CC smoke.

Labels a deterministic 9M-edge / 2M-vertex base graph once, then folds
in a 1M-edge delta two ways — full recompute on the union vs
:func:`incremental_components` on (labels, delta) — and prints both
wall times plus a bit-equality check. The incremental path's CC runs
on the |Δ|-sized label-contracted graph, so its cost should track the
DELTA, not the union (the daily crawl-delta economics at 100 TB).

Usage: PYTHONPATH=/root/repo python scripts/smoke_incremental_cc.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pagerank_spark.session import get_spark  # noqa: E402

N_V = 2_000_000
N_E = 10_000_000
DELTA_MOD = 10  # 1/10 of edges form the delta


def main() -> None:
    spark = get_spark(
        app_name="smoke-incremental-cc",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    from pagerank_spark.operators.components import (
        connected_components,
        incremental_components,
    )
    from pagerank_spark.testing import synth_edges

    e = synth_edges(spark, n=N_V, e=N_E, seed=42).withColumn(
        "_r", F.pmod(F.xxhash64("src", "dst"), F.lit(DELTA_MOD))
    )
    base = e.where(F.col("_r") != 0).select("src", "dst").localCheckpoint()
    delta = e.where(F.col("_r") == 0).select("src", "dst").localCheckpoint()
    print(f"base edges: {base.count():,}  delta edges: {delta.count():,}")

    t0 = time.monotonic()
    labels = connected_components(base, mode="stars").localCheckpoint()
    t_base = time.monotonic() - t0
    print(f"base CC: {t_base:.1f}s  ({labels.count():,} vertices)")

    t0 = time.monotonic()
    inc = incremental_components(labels, delta).localCheckpoint()
    t_inc = time.monotonic() - t0
    print(f"incremental fold-in: {t_inc:.1f}s")

    t0 = time.monotonic()
    full = connected_components(
        base.unionByName(delta), mode="stars"
    ).localCheckpoint()
    t_full = time.monotonic() - t0
    print(f"full recompute on union: {t_full:.1f}s")

    diff = (
        inc.withColumnRenamed("component", "ci")
        .join(full.withColumnRenamed("component", "cf"), "id", "full_outer")
        .where(
            F.col("ci").isNull()
            | F.col("cf").isNull()
            | (F.col("ci") != F.col("cf"))
        )
        .count()
    )
    print(f"label mismatches vs full recompute: {diff}")
    print(
        f"speedup of fold-in vs full recompute: {t_full / max(t_inc, 1e-9):.2f}x"
    )
    assert diff == 0
    spark.stop()


if __name__ == "__main__":
    main()
