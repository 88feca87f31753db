"""Co-occurrence graph derivation (bipartite projection).

The second graph-derivation path next to the corpus parser
(``derive.py``): project any ``(key, item)`` relation onto a weighted
item-item graph — parts co-ordered in the same order, files co-changed
in the same commit, tokens co-occurring in the same document. The
output plugs straight into the rest of the engine (PageRank,
communities, link prediction).

Shape: dedup to distinct (key, item), drop keys with more than
``max_items_per_key`` items, one self-join on the key with ``a < b``,
one map-side-combinable count. The cap is the scale guard — one
degenerate key with 10^5 items would alone emit 5·10^9 pairs, and
co-occurrence with such hub keys is signal-free (every item matches
every other); dropping them is the standard market-basket practice,
and the cap bounds the join at |keys|·cap² output rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_graph(
    df: DataFrame,
    key_col: str,
    item_col: str,
    min_count: int = 1,
    max_items_per_key: int = 1000,
) -> DataFrame:
    """``DataFrame[src, dst, weight]`` with src < dst — weight = number
    of distinct keys containing both items (per-key duplicates count
    once). Items keep ``item_col``'s type; self-pairs never appear."""
    d = df.select(
        F.col(key_col).alias("_k"), F.col(item_col).alias("_i")
    ).distinct()
    ok = (
        d.groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= max_items_per_key)
        .select("_k")
    )
    d = d.join(ok, "_k", "left_semi").localCheckpoint()
    pairs = (
        d.select("_k", F.col("_i").alias("src"))
        .join(d.select("_k", F.col("_i").alias("dst")), "_k")
        .where(F.col("src") < F.col("dst"))
    )
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .where(F.col("weight") >= min_count)
    )
