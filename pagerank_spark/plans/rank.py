"""JVM-side global row numbering (the dense-rank primitive).

``RDD.zipWithIndex`` is the canonical distributed numbering idiom, but
in PySpark it drags every row across the JVM→Python pickle bridge
twice (one pass to build Python ``Row`` objects, one to re-create a
DataFrame) — at 10⁹ rows that serialization IS the job. This module
provides the same assignment entirely JVM-side:

1. materialize the frame (``localCheckpoint``) so partition contents
   and order are pinned;
2. tag rows with ``monotonically_increasing_id()`` — deterministic on
   a materialized RDD: ``pid·2³³ + position-within-partition``;
3. aggregate per-partition row counts (O(#partitions) rows), fold them
   into cumulative offsets with a window over that tiny frame;
4. broadcast-join the offsets back and add the within-partition
   position.

Zero Python in the row path; the only driver-sized object is the
#partitions-row offset table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_POS_MASK = (1 << 33) - 1  # monotonically_increasing_id layout


def zip_with_index(df: DataFrame, out: str = "rn", start: int = 0) -> DataFrame:
    """Append ``out``: the global row index (``start``-based) of each
    row in the frame's CURRENT order (sort first for a total order).

    The input is materialized via ``localCheckpoint`` — the index is
    assigned against those pinned partitions, so repeated actions on
    the result see identical numbering.
    """
    base = df.localCheckpoint(eager=True)
    with_mid = base.withColumn("_mid", F.monotonically_increasing_id())
    counts = with_mid.groupBy(
        F.shiftrightunsigned("_mid", 33).alias("_pid")
    ).agg(F.count(F.lit(1)).alias("_c"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        "_pid",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
    )
    return (
        with_mid.withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .join(F.broadcast(offs), "_pid")
        .withColumn(
            out,
            (
                F.col("_off")
                + F.col("_mid").bitwiseAND(F.lit(_POS_MASK))
                + F.lit(int(start))
            ).cast("long"),
        )
        .drop("_pid", "_mid", "_off")
    )
