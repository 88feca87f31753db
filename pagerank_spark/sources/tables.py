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


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    keys: list[str] | str = "src",
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist a table BUCKETED by join key — the co-located-join
    primitive for repeated big joins (adjacency self-joins, per-round
    rank gathers): two tables bucketed by the same keys into the same
    bucket count join WITHOUT shuffling either side, because rows with
    equal keys are already in matching files. At 100 TB this converts
    every per-iteration O(E) shuffle into a local merge — pay the
    partitioning once at write time, reuse it every query.

    ``sort=True`` additionally sorts within buckets by the keys, which
    lets the sort-merge join skip its sort step too. Bucketed writes
    go through the session catalog (``saveAsTable``): Spark's bucket
    metadata lives in table properties, not the parquet files.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``read.parquet`` of the files would DROP the bucketing metadata and
    reintroduce the join shuffle)."""
    return spark.table(table)
