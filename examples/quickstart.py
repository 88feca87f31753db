"""Quickstart: the full engine surface in one runnable script.

    PYTHONPATH=. python examples/quickstart.py [sf_dir]

Covers: SNAP ingest -> PageRank (golden graph), corpus -> derived repo
graph -> LinkGraph algorithms, and the training-data pipeline ops over
the synthetic documents/embeddings tables.
"""

import sys

from pyspark.sql import functions as F

from pagerank_spark import (
    LinkGraph,
    cosine_topk,
    dedup_near,
    get_spark,
    language_id,
    minhash_lsh_pairs,
    pagerank,
    quality_scores,
    read_snap_edges,
)
from pagerank_spark.testing import synth_corpus

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)

    # 1. the reference's own validation graph, golden semantics
    edges, n, e = read_snap_edges(spark, "/root/reference/DEMO.txt")
    res = pagerank(edges, n=n, dangling="leak")
    print(f"DEMO PageRank ({res.iterations} iters):")
    res.ranks.orderBy("id").show()

    # 2. source-code corpus -> repo reference graph -> all algorithms
    g = LinkGraph.from_corpus(synth_corpus(spark, n_repos=25, files_per_repo=5))
    top = g.with_original_ids(g.pagerank().ranks).orderBy(F.desc("rank"))
    print("Top referenced repos:")
    top.select("orig_id", F.round("rank", 5).alias("rank")).show(5)
    print("components:", g.connected_components().select("component").distinct().count())
    print("triangles:", g.triangle_count().collect()[0]["triangles"])
    print("graph profile:")
    g.summary().show(truncate=False)
    print("strongly connected components:",
          g.strongly_connected_components().select("component").distinct().count())
    print("hubs/authorities:")
    g.hits(max_iter=8).orderBy(F.desc("authority")).show(3)
    print("2-core size:", g.k_core(2).count())
    print("link predictions (top Adamic-Adar):")
    g.link_prediction().orderBy(F.desc("adamic_adar")).show(3)
    print("random-walk sample:")
    g.random_walks(length=3, walks_per_vertex=1).orderBy("walk_id", "step").show(8)

    # 2b. centrality family + community pipeline
    print("eigenvector centrality (top 3):")
    g.eigenvector_centrality(max_iter=8).orderBy(F.desc("eigenvector")).show(3)
    print("betweenness (pivot-sampled, top 3):")
    pivots = [r["src"] for r in g.edges.select("src").distinct().limit(5).collect()]
    g.betweenness_centrality(pivots).orderBy(F.desc("betweenness")).show(3)
    print("assortativity:")
    g.degree_assortativity().show()
    lab = g.greedy_modularity_moves(max_iter=4)
    coarse = g.contract(lab)
    print("communities:", lab.select("label").distinct().count(),
          "-> coarse graph edges:", coarse.edges.count())
    print("4-truss edges:", g.k_truss(4).count())
    print("WL structural roles:", g.wl_colors(rounds=3).select("color").distinct().count())
    print("MIS size:", g.maximal_independent_set().count(),
          "| colors used:", g.greedy_coloring().select("color").distinct().count())
    print("effective diameter:")
    g.effective_diameter(q=0.9).show()

    # round-4 surface: tie strength, matching/cover, spanning forest,
    # hub structure
    print("maximal matching:", g.maximal_matching().count(),
          "edges | vertex cover:", g.vertex_cover().count())
    print("spanning forest edges:", g.minimum_spanning_forest().count())
    print("local bridges (embeddedness 0):",
          g.edge_embeddedness().where(F.col("common") == 0).count())
    g.rich_club().orderBy(F.desc("k")).show(3)
    g.salsa().orderBy(F.desc("authority")).show(3)

    # 3. training-data pipeline over the documents/embeddings tables
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    print("docs:", docs.count(), "-> after near-dedup:", dedup_near(docs, 0.8).count())
    print("near-dup pairs:", minhash_lsh_pairs(docs, verify_threshold=0.8).count())
    quality_scores(docs).orderBy(F.desc("quality_score")).show(3)
    language_id(docs).groupBy("pred_lang").count().show()
    from pagerank_spark import contamination, gopher_filter
    from pyspark.sql import functions as _F
    gf = gopher_filter(docs)
    print("gopher filter keep rate:")
    gf.groupBy("keep").count().show()
    ev = docs.where(_F.col("doc_id") % 2 == 1)
    tr = docs.where(_F.col("doc_id") % 2 == 0)
    print("contaminated eval docs (8-gram overlap):",
          contamination(ev, tr, shingle_k=8).count())
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    print("nearest neighbours of vec 0:")
    cosine_topk(emb, list(q), k=5).show()

    # 4. round-5 surface: local push queries, temporal analytics,
    # synthetic generation, corpus drift
    from pagerank_spark import (
        corpus_divergence,
        hitting_time,
        leaderrank,
        local_community,
        ppr_push,
        rmat_edges,
        temporal_reachability,
    )

    print("LeaderRank (parameter-free, top 3):")
    leaderrank(g.edges, eps=0.0, max_iter=10).orderBy(F.desc("score")).show(3)

    seed = pivots[0]
    push = ppr_push(g.edges, seed=seed, eps_push=1e-5)
    sp = push.estimates.agg(F.sum("p")).first()[0]
    print(f"push PPR from {seed}: touched {push.estimates.count()} "
          f"vertices, certified max error {1 - sp:.1e}")
    comm = local_community(g.edges, seed=seed, eps_push=1e-5)
    print(f"local community around {seed}: {comm.count()} members, "
          f"phi={comm.first()['conductance']:.4f}")
    print("truncated hitting time to the seed (closest 3):")
    hitting_time(g.edges, targets=[seed], horizon=8).where(
        F.col("hitting") > 0).orderBy("hitting").show(3)

    te = g.edges.withColumn("t", (F.col("src") * 7 + F.col("dst")) % 20)
    print("temporally reachable from the seed:",
          temporal_reachability(te, sources=[seed]).count())

    gen = rmat_edges(spark, 5000, 8, seed=1)
    print("R-MAT synthetic graph: 5000 edges, max degree",
          gen.groupBy("src").count().agg(F.max("count")).first()[0])

    div = corpus_divergence(tr, ev).first()
    print(f"train/eval corpus divergence: JS={div['js_divergence']:.4f} "
          f"TV={div['total_variation']:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
