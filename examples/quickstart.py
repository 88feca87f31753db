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
    spark.stop()


if __name__ == "__main__":
    main()
