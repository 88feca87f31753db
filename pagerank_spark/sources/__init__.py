from pagerank_spark.sources.snap import read_snap_edges
from pagerank_spark.sources.tables import read_table, read_corpus

__all__ = ["read_snap_edges", "read_table", "read_corpus"]
