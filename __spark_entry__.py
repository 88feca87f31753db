"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine (``pagerank_spark``) over the driver's synthetic
tables. ``queries()`` returns one callable per implemented operator
from SURVEY.md §2 (+ §2.3 extensions and the training-data pipeline
ops); ``oracle_sql()`` returns the DuckDB-equivalent SQL for every
query whose semantics are ANSI-SQL-expressible. Iterative/LSH-seeded
ops (converged PageRank, LPA beyond fixed rounds, MinHash/SimHash/
xxhash fingerprints) have no oracle entry → driver records the
weaker rows-only check; fixed-iteration PageRank and CC are oracled
via unrolled CTE chains so the graph kernels ARE value-checked.

Canonical test graph: edges derived from lineitem with pure integer
arithmetic (portable to SQL verbatim):
    src = l_partkey % 500
    dst = (l_partkey * 7 + l_suppkey) % 500
Duplicates kept (multiplicity = mass, Page_Rank_SERIAL.c:131-143);
self-loops possible and legal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_spark import (
    connected_components,
    in_degrees,
    label_propagation,
    out_degrees,
    pagerank,
    triangle_count,
)
from pagerank_spark.operators.degrees import degrees as degrees_op
from pagerank_spark.operators.dedup import (
    exact_duplicates,
    minhash_bands,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from pagerank_spark.operators.similarity import cosine_topk
from pagerank_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

N_MOD = 500
PR_FIXED_ITERS = 10
CC_SQL_ROUNDS = 10
LPA_ROUNDS = 4


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_partkey") % N_MOD).alias("src"),
        ((F.col("l_partkey") * 7 + F.col("l_suppkey")) % N_MOD).alias("dst"),
    )

_EDGES_SQL = (
    f"SELECT l_partkey % {N_MOD} AS src, "
    f"(l_partkey * 7 + l_suppkey) % {N_MOD} AS dst FROM lineitem"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select("doc_id", "text")


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------

def q_out_degree(spark, sf_dir):
    return out_degrees(_edges(spark, sf_dir)).orderBy("id")


def q_in_degree(spark, sf_dir):
    return in_degrees(_edges(spark, sf_dir)).orderBy("id")


def q_degrees(spark, sf_dir):
    return degrees_op(_edges(spark, sf_dir)).orderBy("id")


def q_edge_weights(spark, sf_dir):
    e = _edges(spark, sf_dir)
    od = out_degrees(e)
    return (
        e.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .join(od.withColumnRenamed("id", "src"), "src")
        .select(
            "src",
            "dst",
            "multiplicity",
            (F.lit(0.85) / F.col("out_deg")).alias("w"),
        )
        .orderBy("src", "dst")
    )


def _graph_n(e: DataFrame) -> int:
    return int(e.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]) + 1


def q_pagerank_fixed(spark, sf_dir):
    """Exactly PR_FIXED_ITERS iterations, leak mode — value-checked vs
    the unrolled DuckDB CTE chain (same semantics as the C reference)."""
    e = _edges(spark, sf_dir)
    res = pagerank(
        e, n=_graph_n(e), dangling="leak", eps=0.0, max_iter=PR_FIXED_ITERS,
    )
    return res.ranks.select("id", F.round("rank", 7).alias("rank")).orderBy("id")


def q_pagerank_converged(spark, sf_dir):
    """Flagship: converged (eps=1e-4) redistribute-mode PageRank."""
    e = _edges(spark, sf_dir)
    res = pagerank(e, n=_graph_n(e), dangling="redistribute")
    return res.ranks.select("id", F.round("rank", 7).alias("rank")).orderBy("id")


def q_pagerank_topk(spark, sf_dir):
    e = _edges(spark, sf_dir)
    res = pagerank(e, n=_graph_n(e), dangling="redistribute")
    return (
        res.ranks.select("id", F.round("rank", 7).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
    )


def q_connected_components(spark, sf_dir):
    return connected_components(_edges(spark, sf_dir)).orderBy("id")


def q_label_propagation(spark, sf_dir):
    return label_propagation(_edges(spark, sf_dir), max_iter=LPA_ROUNDS).orderBy("id")


def q_triangle_count(spark, sf_dir):
    return triangle_count(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# training-data pipeline queries
# ---------------------------------------------------------------------------

def q_dedup_exact_groups(spark, sf_dir):
    return exact_duplicates(_docs(spark, sf_dir)).orderBy("content_hash")


def q_token_counts(spark, sf_dir):
    return token_counts(_docs(spark, sf_dir)).orderBy("doc_id")


def q_quality_scores(spark, sf_dir):
    return quality_scores(_docs(spark, sf_dir)).orderBy("doc_id")


def q_language_id(spark, sf_dir):
    return language_id(_docs(spark, sf_dir)).orderBy("doc_id")


def q_doc_fingerprints(spark, sf_dir):
    return fingerprints(_docs(spark, sf_dir)).orderBy("doc_id")


def q_minhash_bands(spark, sf_dir):
    return minhash_bands(_docs(spark, sf_dir), num_perm=64, bands=16).orderBy(
        "doc_id", "band"
    )


def q_minhash_dup_pairs(spark, sf_dir):
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), num_perm=64, bands=16, verify_threshold=0.6
    ).select("a", "b", F.round("jaccard", 6).alias("jaccard")).orderBy("a", "b")


def q_simhash(spark, sf_dir):
    return simhash_fingerprints(_docs(spark, sf_dir)).orderBy("doc_id")


def q_ngram_jaccard(spark, sf_dir):
    return (
        ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("a", "b")
    )


def q_ann_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = cosine_topk(emb, [float(x) for x in qv], k=10)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_ivf_cosine_topk(spark, sf_dir):
    """IVF index probed exhaustively (nprobe = n_centroids) — must equal
    the exact scan, so it shares the brute-force SQL oracle."""
    from pagerank_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = ivf_topk(
        emb, [float(x) for x in qv], k=10, n_centroids=8, nprobe=8
    )
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_dedup_near_docs(spark, sf_dir):
    """Near-dup removal: MinHash-LSH pair graph -> connected components
    -> keep each cluster's min doc id (composition of the engine's own
    dedup + graph operators)."""
    from pagerank_spark.operators.dedup import dedup_near

    return dedup_near(_docs(spark, sf_dir), threshold=0.8).select(
        "doc_id"
    ).orderBy("doc_id")


def q_simhash_near_pairs(spark, sf_dir):
    from pagerank_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3).orderBy(
        "a", "b"
    )


# ---------------------------------------------------------------------------
# relational delegation demos (generic SQL is Spark SQL itself)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(20,2)")  # exact, order-independent sums
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(20,2)"))
            .cast("double")
            .alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("hour", "event_type")
    )


def q_user_top_events(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


def q_pricing_rollup(spark, sf_dir):
    """Grouping-set/rollup delegation demo (subtotals + grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_urgent_not_big_spenders(spark, sf_dir):
    """Set-operator demo: INTERSECT-free EXCEPT with distinct semantics."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = o.where(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        urgent.subtract(big)  # set EXCEPT (distinct semantics)
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    )


def q_customers_without_orders(spark, sf_dir):
    """Anti-join demo: customers who never placed an URGENT order."""
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # graph operators (SURVEY.md §2.1 + §2.3)
        "out_degree": q_out_degree,
        "in_degree": q_in_degree,
        "degrees": q_degrees,
        "edge_weights": q_edge_weights,
        "pagerank_fixed10": q_pagerank_fixed,
        "pagerank_converged": q_pagerank_converged,
        "pagerank_topk": q_pagerank_topk,
        "connected_components": q_connected_components,
        "label_propagation": q_label_propagation,
        "triangle_count": q_triangle_count,
        # training-data pipeline
        "dedup_exact_groups": q_dedup_exact_groups,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "language_id": q_language_id,
        "doc_fingerprints": q_doc_fingerprints,
        "minhash_bands": q_minhash_bands,
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ivf_cosine_topk": q_ivf_cosine_topk,
        "simhash_near_pairs": q_simhash_near_pairs,
        "dedup_near_docs": q_dedup_near_docs,
        # relational delegation demos
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "events_hourly": q_events_hourly,
        "user_top_events": q_user_top_events,
        "pricing_rollup": q_pricing_rollup,
        "urgent_not_big_spenders": q_urgent_not_big_spenders,
        "customers_without_orders": q_customers_without_orders,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _pagerank_fixed_sql() -> str:
    """Unrolled power iteration: r0..r{K} as a chained CTE (leak mode)."""
    parts = [
        f"WITH eg AS ({_EDGES_SQL}),",
        "nn AS (SELECT CAST(1 + max(greatest(src, dst)) AS DOUBLE) AS n FROM eg),",
        "od AS (SELECT src, CAST(count(*) AS DOUBLE) AS odeg FROM eg GROUP BY src),",
        "w AS (SELECT e.src, e.dst, 0.85 / od.odeg AS w FROM eg e JOIN od ON e.src = od.src),",
        "v AS (SELECT CAST(unnest(range(0, (SELECT CAST(n AS BIGINT) FROM nn))) AS BIGINT) AS id),",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v),",
    ]
    for k in range(1, PR_FIXED_ITERS + 1):
        parts.append(
            f"r{k} AS (SELECT v.id, 0.15 / (SELECT n FROM nn) + coalesce(s.s, 0) AS rank "
            f"FROM v LEFT JOIN (SELECT w.dst AS id, sum(w.w * r.rank) AS s "
            f"FROM w JOIN r{k-1} r ON w.src = r.id GROUP BY w.dst) s USING (id)),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT id, round(rank, 7) AS rank FROM r{PR_FIXED_ITERS} ORDER BY id"
    )
    return "\n".join(parts)


def _cc_sql() -> str:
    """Unrolled min-label propagation over the symmetrized simple graph."""
    parts = [
        f"WITH eg AS ({_EDGES_SQL}),",
        "vs AS (SELECT DISTINCT id FROM (SELECT src AS id FROM eg UNION ALL SELECT dst FROM eg)),",
        "sym AS (SELECT DISTINCT a, b FROM (SELECT src AS a, dst AS b FROM eg WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM eg WHERE src <> dst)),",
        "l0 AS (SELECT id, id AS component FROM vs),",
    ]
    for k in range(1, CC_SQL_ROUNDS + 1):
        parts.append(
            f"l{k} AS (SELECT l.id, least(l.component, coalesce(m.ml, l.component)) AS component "
            f"FROM l{k-1} l LEFT JOIN (SELECT s.a AS id, min(x.component) AS ml "
            f"FROM sym s JOIN l{k-1} x ON s.b = x.id GROUP BY s.a) m USING (id)),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, component FROM l{CC_SQL_ROUNDS} ORDER BY id")
    return "\n".join(parts)


def _lpa_sql() -> str:
    """Unrolled synchronous LPA with (count desc, label asc) argmax."""
    parts = [
        f"WITH eg AS ({_EDGES_SQL}),",
        "vs AS (SELECT DISTINCT id FROM (SELECT src AS id FROM eg UNION ALL SELECT dst FROM eg)),",
        "sym AS (SELECT src AS a, dst AS b FROM eg WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM eg WHERE src <> dst),",
        "l0 AS (SELECT id, id AS label FROM vs),",
    ]
    for k in range(1, LPA_ROUNDS + 1):
        parts.append(
            f"l{k} AS (SELECT v.id, coalesce(p.label, prev.label) AS label FROM vs v "
            f"JOIN l{k-1} prev USING (id) "
            f"LEFT JOIN (SELECT id, label FROM ("
            f"SELECT g.id, g.label, row_number() OVER (PARTITION BY g.id "
            f"ORDER BY g.c DESC, g.label ASC) AS rn FROM ("
            f"SELECT s.a AS id, x.label AS label, count(*) AS c "
            f"FROM sym s JOIN l{k-1} x ON s.b = x.id GROUP BY s.a, x.label) g) "
            f"WHERE rn = 1) p USING (id)),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, label FROM l{LPA_ROUNDS} ORDER BY id")
    return "\n".join(parts)


def _word_count_sql(w: str) -> str:
    """Exact whole-word count, mirroring functions.text.word_occurrences
    (lambda filter over whitespace tokens — identical in both dialects)."""
    return (
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), "
        f"x -> x = '{w}')) AS BIGINT)"
    )


_WS_TOKENS_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


def _textstats_common() -> dict[str, str]:
    stop = ["the", "a", "of", "and", "to", "in", "is"]
    hits = " + ".join(_word_count_sql(w) for w in stop)
    return {"stop_hits": hits}


def oracle_sql() -> dict[str, str]:
    eg = _EDGES_SQL
    bpe = r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"
    lang_markers = {
        "de": ["der", "und", "die"],
        "en": ["the", "and", "of"],
        "es": ["el", "los", "que"],
        "fr": ["le", "la", "et"],
        "zh": ["de", "shi", "le"],
    }

    word_count = _word_count_sql

    lang_hits = {
        lang: " + ".join(word_count(w) for w in ws)
        for lang, ws in lang_markers.items()
    }
    # argmax with ties -> smallest code: compare in sorted code order
    langs_sorted = sorted(lang_hits)
    best_expr = "CASE"
    for lang in langs_sorted:
        conds = [
            f"h_{lang} >= h_{other}" for other in langs_sorted if other != lang
        ]
        # strictly-greater against earlier codes handled by order: first
        # matching branch wins, so '>=' + code order == min-code tie-break
        best_expr += f" WHEN {' AND '.join(conds)} THEN '{lang}'"
    best_expr += " END"
    best_hits = "CASE"
    for lang in langs_sorted:
        conds = [
            f"h_{lang} >= h_{other}" for other in langs_sorted if other != lang
        ]
        best_hits += f" WHEN {' AND '.join(conds)} THEN h_{lang}"
    best_hits += " END"
    stop_hits = _textstats_common()["stop_hits"]

    return {
        "out_degree": (
            f"SELECT src AS id, count(*) AS out_deg FROM ({eg}) GROUP BY src ORDER BY id"
        ),
        "in_degree": (
            f"SELECT dst AS id, count(*) AS in_deg FROM ({eg}) GROUP BY dst ORDER BY id"
        ),
        "degrees": (
            f"WITH eg AS ({eg}), o AS (SELECT src AS id, count(*) AS out_deg FROM eg GROUP BY src), "
            f"i AS (SELECT dst AS id, count(*) AS in_deg FROM eg GROUP BY dst) "
            f"SELECT coalesce(o.id, i.id) AS id, coalesce(out_deg, 0) AS out_deg, "
            f"coalesce(in_deg, 0) AS in_deg FROM o FULL OUTER JOIN i ON o.id = i.id ORDER BY id"
        ),
        "edge_weights": (
            f"WITH eg AS ({eg}), od AS (SELECT src, count(*) AS out_deg FROM eg GROUP BY src), "
            f"m AS (SELECT src, dst, count(*) AS multiplicity FROM eg GROUP BY src, dst) "
            f"SELECT m.src, m.dst, m.multiplicity, 0.85 / od.out_deg AS w "
            f"FROM m JOIN od ON m.src = od.src ORDER BY m.src, m.dst"
        ),
        "pagerank_fixed10": _pagerank_fixed_sql(),
        "connected_components": _cc_sql(),
        "label_propagation": _lpa_sql(),
        "triangle_count": (
            f"WITH eg AS ({eg}), "
            "simple AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
            "FROM eg WHERE src <> dst), "
            "deg AS (SELECT id, count(*) AS d FROM (SELECT a AS id FROM simple "
            "UNION ALL SELECT b FROM simple) GROUP BY id), "
            "o AS (SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND s.a < s.b) THEN s.a ELSE s.b END AS u, "
            "CASE WHEN (da.d < db.d) OR (da.d = db.d AND s.a < s.b) THEN s.b ELSE s.a END AS v "
            "FROM simple s JOIN deg da ON s.a = da.id JOIN deg db ON s.b = db.id) "
            "SELECT count(*) AS triangles FROM o e1 JOIN o e2 ON e1.v = e2.u "
            "JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v"
        ),
        "dedup_exact_groups": (
            "SELECT md5(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS keep_id "
            "FROM documents GROUP BY md5(text) ORDER BY content_hash"
        ),
        "token_counts": (
            f"SELECT doc_id, CAST({_WS_TOKENS_SQL} AS BIGINT) AS ws_tokens, "
            f"CAST(len(regexp_extract_all(text, '{bpe}')) AS BIGINT) AS bpe_tokens, "
            "CAST(length(text) AS BIGINT) AS n_chars FROM documents ORDER BY doc_id"
        ),
        "quality_scores": (
            "WITH t AS (SELECT doc_id, text, "
            "CAST(length(text) AS DOUBLE) AS n_chars, "
            f"CAST({_WS_TOKENS_SQL} AS DOUBLE) AS n_tokens, "
            f"CAST({stop_hits} AS DOUBLE) AS stop_hits, "
            "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct "
            "FROM documents) "
            "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "round(n_chars / greatest(n_tokens, 1.0), 6) AS mean_token_len, "
            "round(stop_hits / greatest(n_tokens, 1.0), 6) AS stopword_ratio, "
            "round(punct / greatest(n_chars, 1.0), 6) AS punct_ratio, "
            "round(least(greatest(least(stop_hits / greatest(n_tokens, 1.0) * 4, 1.0) "
            "- punct / greatest(n_chars, 1.0) * 2, 0.0), 1.0), 6) AS quality_score "
            "FROM t ORDER BY doc_id"
        ),
        "language_id": (
            "WITH h AS (SELECT doc_id, "
            + ", ".join(f"{lang_hits[lang]} AS h_{lang}" for lang in langs_sorted)
            + " FROM documents) "
            f"SELECT doc_id, {best_expr} AS pred_lang, CAST({best_hits} AS BIGINT) AS marker_hits "
            "FROM h ORDER BY doc_id"
        ),
        "ngram_jaccard": (
            "WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents), "
            "sh AS (SELECT doc_id, list_distinct([array_to_string(l[i:i+2], ' ') "
            "FOR i IN range(1, greatest(len(l) - 2, 1) + 1)]) AS s FROM toks) "
            "SELECT x.doc_id AS a, y.doc_id AS b, "
            "round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / "
            "CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE), 6) AS jaccard "
            "FROM sh x JOIN sh y ON x.doc_id < y.doc_id "
            "WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / "
            "CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE) >= 0.8 "
            "ORDER BY a, b"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0), "
            "s AS (SELECT vec_id, "
            "list_dot_product(CAST(embedding AS DOUBLE[]), q.qv) / "
            "(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(q.qv, q.qv))) AS cos FROM embeddings, q) "
            "SELECT vec_id, round(cos, 6) AS cosine FROM s "
            "ORDER BY cos DESC, vec_id LIMIT 10"
        ),
        "ivf_cosine_topk": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0), "
            "s AS (SELECT vec_id, "
            "list_dot_product(CAST(embedding AS DOUBLE[]), q.qv) / "
            "(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(q.qv, q.qv))) AS cos FROM embeddings, q) "
            "SELECT vec_id, round(cos, 6) AS cosine FROM s "
            "ORDER BY cos DESC, vec_id LIMIT 10"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty, "
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price, "
            "count(*) AS count_order FROM lineitem "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
        "top_customers": (
            "SELECT c_custkey, c_name, "
            "CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS total_spent, "
            "count(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_custkey, c_name ORDER BY total_spent DESC, c_custkey LIMIT 10"
        ),
        "events_hourly": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, "
            "event_type, count(*) AS n_events, "
            "CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value "
            "FROM events GROUP BY 1, 2 ORDER BY hour, event_type"
        ),
        "user_top_events": (
            "SELECT user_id, event_id, event_type, value FROM ("
            "SELECT user_id, event_id, event_type, value, "
            "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn "
            "FROM events) WHERE rn = 1 ORDER BY user_id"
        ),
        "pricing_rollup": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n, "
            "CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "urgent_not_big_spenders": (
            "SELECT custkey FROM ("
            "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT' "
            "EXCEPT "
            "SELECT o_custkey FROM orders WHERE o_totalprice > 400000) "
            "ORDER BY custkey"
        ),
        "customers_without_orders": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') "
            "ORDER BY c_custkey"
        ),
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pagerank_topk(spark, "/root/testdata/sf0.001")
