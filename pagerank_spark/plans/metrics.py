"""Measured shuffle metrics via Spark's monitoring REST API.

The reference instruments its kernel with PAPI hardware counters and
wall-clock timers (``Page_Rank_MPI_2.c:70-87,403-412``); the Spark
analogue for "how much data moved" is the per-stage shuffle read/write
byte counters exposed by the public monitoring API
(``/api/v1/applications/<id>/stages``). ``pagerank`` snapshots these
around every iteration so the checkpoint manifest records MEASURED
shuffle bytes per iteration (north_rule "per-partition lineage +
metrics") instead of a static estimate.

Requires the UI server (``spark.ui.enabled=true`` — Spark's stock
default, and the engine session's default). When the UI is disabled
the helpers return ``None`` and callers degrade gracefully.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession


def shuffle_totals(spark: SparkSession) -> dict | None:
    """Cumulative shuffle bytes over all stages of this application.

    Returns ``{"shuffle_read_bytes": int, "shuffle_write_bytes": int}``
    or ``None`` when the UI/REST endpoint is unavailable.
    """
    sc = spark.sparkContext
    url = sc.uiWebUrl
    if not url:
        return None
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{sc.applicationId}/stages", timeout=5
        ) as r:
            stages = json.load(r)
    except Exception:
        return None
    return {
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    }


def shuffle_delta(before: dict | None, after: dict | None) -> dict:
    """Per-step measured shuffle bytes (``None`` fields when unmeasured).

    Note: totals are summed over *completed* stages, so a delta
    attributes a stage to the step in which it completed.
    """
    if before is None or after is None:
        return {"shuffle_read_bytes": None, "shuffle_write_bytes": None}
    return {
        "shuffle_read_bytes": after["shuffle_read_bytes"]
        - before["shuffle_read_bytes"],
        "shuffle_write_bytes": after["shuffle_write_bytes"]
        - before["shuffle_write_bytes"],
    }
