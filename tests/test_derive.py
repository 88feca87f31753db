"""Corpus -> edge derivation tests, incl. the sha256 row invariant."""

from pyspark.sql import functions as F

from pagerank_spark import densify_ids, pagerank
from pagerank_spark.operators.derive import derive_edges, extract_references, verify_sha
from pagerank_spark.testing import synth_corpus


def test_sha_invariant_roundtrip(spark, tmp_path):
    corpus = synth_corpus(spark, n_repos=10, files_per_repo=4)
    # invariant holds on the synthesized frame...
    assert verify_sha(corpus) == 0
    # ...and across a full write/read cycle (the real read path)
    p = str(tmp_path / "corpus.parquet")
    corpus.write.parquet(p)
    assert verify_sha(spark.read.parquet(p)) == 0


def test_extract_references_all_langs(spark):
    corpus = synth_corpus(spark, n_repos=12, files_per_repo=6)
    refs = extract_references(corpus)
    langs_with_refs = (
        corpus.join(
            refs.groupBy("src_repo").count(),
            corpus["repo"] == F.col("src_repo"),
        )
        .select("lang")
        .distinct()
        .collect()
    )
    assert {r["lang"] for r in langs_with_refs} == {"python", "c", "java", "js"}
    # every file synthesizes >=1 reference
    assert refs.count() >= corpus.count()


def test_derive_file_granularity(spark):
    corpus = synth_corpus(spark, n_repos=10, files_per_repo=3)
    repo_edges = derive_edges(corpus, granularity="repo")
    file_edges = derive_edges(corpus, granularity="file")
    # file srcs are repo:path; weights aggregate to the same repo totals
    assert file_edges.where(~F.col("src").contains(":")).count() == 0
    repo_total = repo_edges.agg(F.sum("weight")).collect()[0][0]
    file_total = (
        file_edges.select(
            F.split("src", ":").getItem(0).alias("r"), "dst", "weight"
        )
        .where(F.col("r") != F.col("dst"))
        .agg(F.sum("weight"))
        .collect()[0][0]
    )
    assert file_total == repo_total


def test_derive_edges_weighted_and_ranked(spark):
    corpus = synth_corpus(spark, n_repos=20, files_per_repo=5)
    edges = derive_edges(corpus)
    assert set(edges.columns) == {"src", "dst", "weight"}
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    assert edges.where(F.col("weight") < 1).count() == 0
    # end-to-end: corpus -> edges -> densify -> pagerank
    dense, mapping = densify_ids(edges)
    n = mapping.count()
    res = pagerank(dense, n=n, dangling="redistribute")
    assert res.converged
    total = res.ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9
