"""Table sources: parquet warehouse with an Iceberg seam.

The production design point is an Iceberg catalog of source-code
repositories at 10^12-file scale (BASELINE.json input_hint: columns
``repo, path, commit, lang, content``). This sandbox has no Iceberg
runtime jar, so the same schema is served from parquet; ``read_table``
is the single seam — when the ``iceberg-spark-runtime`` jar is on the
classpath, pass ``fmt="iceberg"`` and a catalog table name and
everything downstream is unchanged (Catalyst still gets column
pruning, predicate pushdown and partition pruning either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def read_table(spark: SparkSession, location: str, fmt: str = "parquet") -> DataFrame:
    """Read a table by location (parquet path) or catalog name (iceberg)."""
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    raise ValueError(f"unsupported table format: {fmt}")


def read_corpus(spark: SparkSession, location: str, fmt: str = "parquet") -> DataFrame:
    """Read the source-code corpus table, pruning to the engine's columns.

    Selecting explicitly keeps the scan to exactly the columns the
    derive stage touches — Catalyst pushes this into the file scan
    (ReadSchema), which at 10^12 files is the difference between
    reading ~5 columns and the whole table.
    """
    df = read_table(spark, location, fmt)
    return df.select("repo", "path", "commit", "lang", "content")
