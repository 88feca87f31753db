"""pagerank_spark — a from-scratch, PySpark-native link-graph analytics engine.

Re-creates the capabilities of the reference MPI PageRank project
(GregorioDalia/PageRank, surveyed in SURVEY.md) as an idiomatic Spark
DataFrame engine, and extends it with connected components
(small-star/large-star), label propagation, triangle counting, a
source-code-corpus edge-derivation stage, and large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Public API (stable surface):

    from pagerank_spark import (
        get_spark, read_snap_edges, densify_ids,
        out_degrees, in_degrees, degrees,
        pagerank, connected_components, label_propagation, triangle_count,
        derive_edges,
    )
"""

from pagerank_spark.session import get_spark
from pagerank_spark.sources.snap import read_snap_edges, write_snap_edges
from pagerank_spark.sources.tables import read_corpus, read_table
from pagerank_spark.operators.densify import densify_ids
from pagerank_spark.operators.degrees import (
    degree_assortativity,
    degree_histogram,
    degrees,
    in_degrees,
    out_degrees,
    reciprocity,
)
from pagerank_spark.operators.cores import densest_subgraph, k_core, k_truss
from pagerank_spark.operators.hits import hits
from pagerank_spark.operators.linkpred import link_prediction
from pagerank_spark.operators.labelprop import (
    greedy_modularity_moves,
    louvain,
    modularity,
)
from pagerank_spark.operators.sampling import (
    hash_split,
    sample_edges,
    sample_per_group,
    sample_vertices_induced,
)
from pagerank_spark.operators.cooccur import (
    contract_graph,
    cooccurrence_graph,
)
from pagerank_spark.operators.scc import strongly_connected_components
from pagerank_spark.operators.wl import wl_colors, wl_fingerprint
from pagerank_spark.operators.anf import hyper_anf
from pagerank_spark.operators.mis import greedy_coloring, maximal_independent_set
from pagerank_spark.operators.walks import (
    node2vec_walks,
    random_walks,
    skipgram_pairs,
)
from pagerank_spark.operators.pagerank import pagerank, pagerank_two_phase
from pagerank_spark.operators.components import connected_components
from pagerank_spark.operators.labelprop import label_propagation
from pagerank_spark.operators.triangles import (
    clustering_coefficient,
    triangle_count,
)
from pagerank_spark.operators.paths import (
    closeness_centrality,
    effective_diameter,
    neighborhood_function,
    topological_levels,
    double_sweep,
    harmonic_centrality,
    multi_source_bfs,
    shortest_paths,
)
from pagerank_spark.operators.centrality import (
    betweenness_centrality,
    edge_betweenness,
    eigenvector_centrality,
    katz_centrality,
    leaderrank,
    personalized_pagerank_keyed,
)
from pagerank_spark.operators.summary import graph_summary
from pagerank_spark.operators.derive import derive_edges
from pagerank_spark.operators.features import refex_features
from pagerank_spark.operators.nullmodel import (
    configuration_rewire,
    triangle_null_samples,
)
from pagerank_spark.operators.temporal import (
    snapshot_pagerank,
    temporal_reachability,
    temporal_reachability_keyed,
)
from pagerank_spark.operators.absorbing import (
    absorption_probability,
    hitting_time,
)
from pagerank_spark.operators.push import (
    local_community,
    ppr_contributions,
    ppr_push,
    ppr_push_keyed,
)
from pagerank_spark.sources.rmat import rmat_edges
from pagerank_spark.operators.dedup import (
    contamination,
    dedup_exact,
    dedup_near,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from pagerank_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_duplicates,
    ivf_topk,
)
from pagerank_spark.graph import LinkGraph
from pagerank_spark.operators.textstats import (
    corpus_divergence,
    fingerprints,
    gopher_filter,
    hashed_divergence,
    hashed_token_histogram,
    repetition_scores,
    tfidf_top_terms,
    language_id,
    quality_scores,
    token_counts,
    unigram_perplexity,
)

__all__ = [
    "LinkGraph",
    "get_spark",
    "read_snap_edges",
    "write_snap_edges",
    "read_table",
    "read_corpus",
    "densify_ids",
    "degrees",
    "degree_histogram",
    "in_degrees",
    "out_degrees",
    "reciprocity",
    "pagerank",
    "pagerank_two_phase",
    "connected_components",
    "strongly_connected_components",
    "label_propagation",
    "triangle_count",
    "clustering_coefficient",
    "k_core",
    "k_truss",
    "densest_subgraph",
    "hits",
    "link_prediction",
    "modularity",
    "greedy_modularity_moves",
    "louvain",
    "contract_graph",
    "degree_assortativity",
    "tfidf_top_terms",
    "repetition_scores",
    "gopher_filter",
    "node2vec_walks",
    "random_walks",
    "skipgram_pairs",
    "sample_edges",
    "sample_per_group",
    "sample_vertices_induced",
    "hash_split",
    "shortest_paths",
    "multi_source_bfs",
    "harmonic_centrality",
    "closeness_centrality",
    "katz_centrality",
    "eigenvector_centrality",
    "leaderrank",
    "refex_features",
    "configuration_rewire",
    "triangle_null_samples",
    "temporal_reachability",
    "hitting_time",
    "absorption_probability",
    "temporal_reachability_keyed",
    "snapshot_pagerank",
    "ppr_push",
    "ppr_push_keyed",
    "ppr_contributions",
    "local_community",
    "corpus_divergence",
    "hashed_token_histogram",
    "hashed_divergence",
    "rmat_edges",
    "betweenness_centrality",
    "edge_betweenness",
    "personalized_pagerank_keyed",
    "double_sweep",
    "neighborhood_function",
    "hyper_anf",
    "effective_diameter",
    "maximal_independent_set",
    "greedy_coloring",
    "topological_levels",
    "wl_colors",
    "wl_fingerprint",
    "graph_summary",
    "derive_edges",
    "cooccurrence_graph",
    "dedup_exact",
    "contamination",
    "dedup_near",
    "exact_duplicates",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "cosine_topk",
    "cosine_topk_lsh",
    "embedding_near_duplicates",
    "ivf_topk",
    "fingerprints",
    "language_id",
    "quality_scores",
    "unigram_perplexity",
    "token_counts",
]

__version__ = "0.1.0"
