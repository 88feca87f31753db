"""Derive the repo-reference edge graph from a source-code corpus.

Input: the Iceberg-shaped corpus table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint). Output: a weighted repo-level
edge table — ``import``/``#include``/``require`` statements in
``content`` resolved to target repos (SURVEY.md §2.3 "edge derivation
from code corpus").

Everything stays JVM-side: extraction is ``regexp_extract_all`` +
``explode`` (whole-stage codegen, no Python in the hot path — stricter
even than the input_hint's "vectorized UDFs only" bar), resolution is
a broadcast join against the (small) repo→module dimension, and the
final dedup/weighting is a map-side-combinable groupBy. At 10^12 files
the scan reads exactly (repo, lang, content) via column pruning.

Per-row invariant (input_hint): ``sha256(content)`` equality against
the digest recorded at synthesis time — ``verify_sha`` returns the
violation count (must be 0) so tests can assert the derive stage never
mangles a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One extraction regex per language. Group 1 captures the referenced
# top-level module / first path component, which resolves to a repo.
LANG_PATTERNS = {
    "python": r"(?m)^\s*(?:from|import)\s+([A-Za-z_][A-Za-z0-9_]*)",
    "c": r"(?m)^\s*#include\s+\"([A-Za-z_][A-Za-z0-9_]*)/",
    "java": r"(?m)^\s*import\s+([A-Za-z_][A-Za-z0-9_]*)\.",
    "js": r"require\(['\"]([A-Za-z_][A-Za-z0-9_]*)['\"]\)",
}


def repo_module_name(repo_col):
    """Canonical module name for a repo: ``org/name-3`` → ``org_name_3``."""
    return F.regexp_replace(repo_col, r"[/\-.]", "_")


def verify_sha(corpus: DataFrame, digest_col: str = "content_sha256") -> int:
    """Count rows whose content no longer matches its recorded sha256."""
    return corpus.where(
        F.sha2(F.col("content"), 256) != F.col(digest_col)
    ).count()


def extract_references(corpus: DataFrame) -> DataFrame:
    """``DataFrame[src_repo, module]`` — one row per reference occurrence.

    Multiplicity is KEPT (a file importing a repo twice yields two
    rows) so downstream weights reflect reference counts, mirroring
    the reference's duplicate-edge semantics
    (``Page_Rank_SERIAL.c:131-143``).
    """
    pattern = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in LANG_PATTERNS.items() for x in kv]
        ),
        F.col("lang"),
    )
    return (
        corpus.select(
            F.col("repo").alias("src_repo"),
            F.explode(
                F.regexp_extract_all(F.col("content"), pattern, F.lit(1))
            ).alias("module"),
        )
    )


def derive_edges(
    corpus: DataFrame,
    keep_self: bool = False,
    granularity: str = "repo",
) -> DataFrame:
    """``DataFrame[src: string, dst: string, weight: long]`` reference graph.

    ``granularity="repo"``: src is the referencing repo (repo→repo
    graph, the default production shape). ``granularity="file"``: src is
    ``repo:path`` (file→repo bipartite graph — finer-grained ranking,
    ~10^6x more source vertices at the design point; the dst side stays
    repo-level because import statements name packages, not paths).

    The repo dimension (distinct repos + canonical module name) is
    broadcast — it is orders of magnitude smaller than the file table
    (10^6 repos vs 10^12 files at the design point), so resolution
    never shuffles the fat side.
    """
    if granularity not in ("repo", "file"):
        raise ValueError("granularity must be 'repo' or 'file'")
    repos = corpus.select("repo").distinct().select(
        F.col("repo").alias("dst"), repo_module_name(F.col("repo")).alias("module")
    )
    src_corpus = (
        corpus.withColumn("repo", F.concat_ws(":", "repo", "path"))
        if granularity == "file"
        else corpus
    )
    edges = extract_references(src_corpus).join(F.broadcast(repos), "module").select(
        F.col("src_repo").alias("src"), "dst"
    )
    if not keep_self:
        src_repo_part = (
            F.split(F.col("src"), ":").getItem(0)
            if granularity == "file"
            else F.col("src")
        )
        edges = edges.where(src_repo_part != F.col("dst"))
    return edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))
