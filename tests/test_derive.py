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


def test_synth_corpus_arith_matches_closed_form(spark):
    """derive_edges over the arithmetic corpus == the closed-form edge
    set (the same arithmetic the DuckDB gate oracle replays)."""
    from collections import Counter

    from pagerank_spark.operators.derive import derive_edges
    from pagerank_spark.testing import synth_corpus_arith

    R, FPR = 20, 5
    corpus = synth_corpus_arith(spark, R, FPR)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in derive_edges(corpus).collect()
    }
    expect = Counter()
    for i in range(R):
        for f in range(FPR):
            for j in ((i * 7 + f * 3 + 1) % R, (i * 13 + f * 5 + 2) % R):
                if j != i:
                    expect[(f"org/name-{i}", f"org/name-{j}")] += 1
    assert got == dict(expect)


def test_synth_corpus_arith_covers_all_repos_and_langs(spark):
    from pagerank_spark.testing import synth_corpus_arith

    corpus = synth_corpus_arith(spark, 12, 4).cache()
    assert corpus.select("repo").distinct().count() == 12
    assert {r["lang"] for r in corpus.select("lang").distinct().collect()} == {
        "python", "c", "java", "js"
    }
    # sha256 invariant holds at synthesis
    from pagerank_spark.operators.derive import verify_sha

    assert verify_sha(corpus) == 0
