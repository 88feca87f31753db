"""Ingest-time document quality filtering.

The Gopher/MassiveText rule set (``operators.textstats.gopher_filter``)
is a pure per-row projection — no aggregation, no state — so it runs
unchanged on a Structured Streaming frame: score and tag documents AS
THEY ARRIVE, append-mode, zero state-store footprint. This is the
shape a 100 TB ingest pipeline wants: quality gating before anything
is persisted, with the exact same signals/thresholds as the batch
backfill path (one implementation, two execution modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pagerank_spark.operators.textstats import gopher_filter


def streaming_quality_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher quality signals + keep flag on a stream.

    Stateless (append-mode): the output schema and every value equal
    the batch ``gopher_filter`` on the same rows, which is exactly
    what the ``gopher_stream`` driver gate checks.
    """
    if not docs.isStreaming:
        raise ValueError(
            "streaming_quality_filter expects a streaming DataFrame; "
            "use operators.textstats.gopher_filter for batch input"
        )
    return gopher_filter(docs, id_col=id_col, text_col=text_col)
