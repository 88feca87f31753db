"""SNAP-style edge-list text source.

Reads the reference's input format (see SURVEY.md §1.2):
``#``-prefixed header lines, the last one matching ``Nodes: <n>
Edges: <e>``; then one whitespace-separated ``src dst`` integer pair
per line. A ``first_node`` flag (0 or 1) declares the id base; 1-based
ids are shifted down at load, mirroring the reference's CLI flag
(``Page_Rank_SERIAL.c:51-58,120-123``).

Unlike the reference's ``while(!feof)`` loop — which silently
duplicates the final edge when the file ends with a newline
(``Page_Rank_SERIAL.c:114-118``, a parse bug, not a semantic; see
SURVEY.md §1.3.6) — this loader parses exactly the listed edges.

Duplicate edges are KEPT (each contributes mass), self-loops are
ordinary edges: both invariants pinned by ``Page_Rank_SERIAL.c:131-143``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HEADER_RE = re.compile(r"Nodes:\s*(\d+)\s+Edges:\s*(\d+)")


def read_snap_edges(
    spark: SparkSession, path: str, first_node: int = 0
) -> tuple[DataFrame, int, int]:
    """Load a SNAP-format edge list.

    Returns ``(edges, n, e)`` where ``edges`` is a
    ``DataFrame[src: long, dst: long]`` (0-based), ``n`` the declared
    vertex count and ``e`` the declared edge count. The vertex set is
    ``0..n-1`` from the header, not the ids seen in edges
    (``Page_Rank_SERIAL.c:155-159``): callers must honor ``n``.
    """
    lines = spark.read.text(path)
    # Header lines are a handful at the top of the file; filtering is a
    # metadata-light scan and the collect is O(#header lines).
    headers = [
        r[0] for r in lines.filter(F.col("value").startswith("#")).collect()
    ]
    n = e = None
    for h in headers:
        m = _HEADER_RE.search(h)
        if m:  # the reference keeps the LAST matching header line
            n, e = int(m.group(1)), int(m.group(2))
    if n is None:
        raise ValueError(f"no '# Nodes: N Edges: E' header found in {path}")

    parts = F.split(F.trim(F.col("value")), r"\s+")
    edges = (
        lines.filter(~F.col("value").startswith("#"))
        # only well-formed "int<ws>int" data lines: a truncated trailing
        # line would otherwise yield a NULL/ANSI-error phantom edge.
        # Callers can detect drops by comparing count() with the header e.
        .filter(F.trim(F.col("value")).rlike(r"^\d+\s+\d+"))
        .select(
            (parts.getItem(0).cast("long") - first_node).alias("src"),
            (parts.getItem(1).cast("long") - first_node).alias("dst"),
        )
    )
    return edges, n, e


def write_snap_edges(
    edges: DataFrame, path: str, first_node: int = 0, n: int | None = None
) -> tuple[int, int]:
    """Write an edge DataFrame back to the reference's SNAP text format
    (round-trips through ``read_snap_edges``); returns ``(n, e)``.

    ``n`` defaults to ``1 + max(id)`` (the dense-vertex convention the
    reference assumes); ``first_node`` shifts ids up on write, the
    inverse of the loader's shift. The header goes in its own zero-split
    text file alongside coalesced data parts — at 100 TB the edge body
    writes in parallel (one text part per partition) and only the
    two-line header is driver-side.
    """
    ne = edges.agg(
        F.count(F.lit(1)).alias("e"),
        F.greatest(F.max("src"), F.max("dst")).alias("m"),
        F.least(F.min("src"), F.min("dst")).alias("lo"),
    ).collect()[0]
    e = int(ne["e"])
    if e and int(ne["lo"]) + first_node < 0:
        # the SNAP format is non-negative-int lines; read_snap_edges's
        # malformed-line filter would silently DROP negative ids on
        # re-read, so refuse instead of writing an unreadable file
        raise ValueError(
            f"write_snap_edges: min id {ne['lo']} with first_node="
            f"{first_node} would write negative ids, which the SNAP "
            "format (and read_snap_edges) cannot represent; densify "
            "ids first (operators.densify)"
        )
    if n is None:
        n = int(ne["m"]) + 1 if ne["m"] is not None else 0
    body = edges.select(
        F.concat_ws(
            "\t",
            (F.col("src") + first_node).cast("string"),
            (F.col("dst") + first_node).cast("string"),
        ).alias("value")
    )
    header = edges.sparkSession.createDataFrame(
        [("# Directed graph (engine export)",), (f"# Nodes: {n} Edges: {e}",)],
        "value string",
    ).coalesce(1)
    # header first: Spark text reads parts in name order and the loader
    # takes the LAST matching header anywhere, so ordering is forgiving,
    # but keeping the header in part-00000 matches the reference layout
    header.unionByName(body.coalesce(1) if e < 10_000_000 else body)\
        .write.mode("overwrite").text(path)
    return n, e
