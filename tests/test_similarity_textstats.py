"""Similarity search + text analysis tests vs NumPy/python oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_duplicates,
    lsh_cosine_buckets,
)
from pagerank_spark.operators.textstats import (
    BPE_REGEX,
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    return pdf["vec_id"].to_numpy(), np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    q = mat[0]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:10]
    want = list(ids[order])
    got = [r["vec_id"] for r in cosine_topk(emb, list(q), k=10).collect()]
    assert got == want
    top = cosine_topk(emb, list(q), k=1).collect()[0]
    assert top["vec_id"] == 0 and top["cosine"] == pytest.approx(1.0)


def test_lsh_topk_subset_of_bucket(spark, emb, emb_np):
    ids, mat = emb_np
    q = list(mat[3])
    approx = cosine_topk_lsh(emb, q, k=5, nbits=4)
    rows = approx.collect()
    assert rows[0]["vec_id"] == 3  # query vector itself always in its bucket
    assert len(rows) <= 5
    # every returned id is genuinely in the query's bucket
    buckets = {r["vec_id"]: r["bucket"] for r in lsh_cosine_buckets(emb, dim=64, nbits=4).collect()}
    qb = buckets[3]
    assert all(buckets[r["vec_id"]] == qb for r in rows)


def test_ivf_topk_recall_and_determinism(spark, emb, emb_np):
    from pagerank_spark.operators.similarity import cosine_topk, ivf_topk

    ids, mat = emb_np
    q = list(mat[7])
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx1 = [r["vec_id"] for r in ivf_topk(emb, q, k=10, n_centroids=8, nprobe=4).collect()]
    approx2 = [r["vec_id"] for r in ivf_topk(emb, q, k=10, n_centroids=8, nprobe=4).collect()]
    assert approx1 == approx2  # deterministic index + probe
    assert approx1[0] == 7  # the query vector itself survives probing
    recall = len(set(exact) & set(approx1)) / 10
    assert recall >= 0.3  # nprobe=4 of 8 centroids: at least half the space
    # full probe == exact
    full = [
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, n_centroids=8, nprobe=8).collect()
    ]
    assert full == exact


def test_simhash_near_pairs_hamming(spark, docs):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.dedup import simhash_near_pairs

    base = docs.select("doc_id", "text")
    dup = base.limit(4).select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    both = base.union(dup)
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs(both, max_hamming=3).collect()
    }
    for r in base.limit(4).collect():
        assert pairs[(r["doc_id"], r["doc_id"] + 5000)] == 0
    assert all(h <= 3 for h in pairs.values())


def test_embedding_near_duplicates(spark, emb):
    # duplicate three vectors with new ids -> cosine 1.0 pairs must surface
    dup = emb.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label"
    )
    both = emb.union(dup)
    pairs = {(r["a"], r["b"]) for r in embedding_near_duplicates(both, threshold=0.999).collect()}
    for i in range(3):
        assert (i, i + 9000) in pairs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_counts_oracle(spark, docs):
    import re

    got = {r["doc_id"]: r for r in token_counts(docs).collect()}
    for row in docs.limit(30).collect():
        toks = row["text"].strip().split()
        bpe = re.findall(BPE_REGEX, row["text"])
        g = got[row["doc_id"]]
        assert g["ws_tokens"] == len(toks)
        assert g["bpe_tokens"] == len(bpe)
        assert g["n_chars"] == len(row["text"])


def test_quality_scores_bounds(spark, docs):
    q = quality_scores(docs)
    bad = q.where(
        (F.col("quality_score") < 0)
        | (F.col("quality_score") > 1)
        | (F.col("stopword_ratio") < 0)
        | (F.col("mean_token_len") <= 0)
    ).count()
    assert bad == 0
    # oracle check one row
    row = docs.first()
    text = row["text"]
    toks = text.strip().split()
    from pagerank_spark.operators.textstats import STOPWORDS

    toks_all = text.split()
    hits = sum(toks_all.count(w) for w in STOPWORDS)
    g = q.where(F.col("doc_id") == row["doc_id"]).collect()[0]
    assert g["stopword_ratio"] == pytest.approx(hits / max(len(toks), 1), abs=1e-6)


def test_language_id_deterministic_and_total(spark, docs):
    p = language_id(docs)
    assert p.count() == docs.count()
    assert p.where(F.col("pred_lang").isNull()).count() == 0
    # determinism across runs
    a = sorted(map(tuple, p.collect()))
    b = sorted(map(tuple, language_id(docs).collect()))
    assert a == b


def test_fingerprints_stable_and_dup_sensitive(spark, docs):
    fp = fingerprints(docs)
    assert fp.count() == docs.count()
    # identical text -> identical fingerprint
    base = docs.select("doc_id", "text")
    dup = docs.limit(3).select((F.col("doc_id") + 7000).alias("doc_id"), "text")
    both = fingerprints(base.union(dup))
    vals = {r["doc_id"]: r["fingerprint"] for r in both.collect()}
    for r in docs.limit(3).collect():
        assert vals[r["doc_id"]] == vals[r["doc_id"] + 7000]


def test_zero_norm_vectors_never_rank(spark, emb, emb_np):
    """A zero embedding must get cosine 0.0, not NaN (NaN sorts above
    every double in Spark and would top every descending top-k)."""
    ids, mat = emb_np
    dim = mat.shape[1]
    withzero = emb.select("vec_id", "embedding").union(
        spark.createDataFrame(
            [(999999, [0.0] * dim)], "vec_id long, embedding array<float>"
        )
    )
    top = cosine_topk(withzero, [float(x) for x in mat[0]], k=5).collect()
    assert all(r["vec_id"] != 999999 for r in top)
    assert all(not np.isnan(r["cosine"]) for r in top)


def test_ivf_index_probe_prunes_partitions(spark, emb, emb_np, tmp_path):
    """A parquet-backed IVF index probe must be a partition-pruned scan:
    no Python kernel in the plan, and a centroid partition filter."""
    from pagerank_spark.operators.similarity import ivf_index, ivf_topk
    from pagerank_spark.plans.inspect import explain_summary

    ids, mat = emb_np
    q = [float(x) for x in mat[0]]
    idx = ivf_index(emb, n_centroids=8, path=str(tmp_path / "ivf"))
    probe = ivf_topk(emb, q, k=10, nprobe=2, index=idx)
    plan = explain_summary(probe, mode="simple")
    assert "MapInArrow" not in plan  # assignment is NOT recomputed
    assert "PartitionFilters: [centroid" in plan  # probe prunes
    # exhaustive probe over the stored index == exact scan
    full = ivf_topk(emb, q, k=10, nprobe=8, index=idx)
    exact = cosine_topk(emb, q, k=10)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]


def test_ivf_index_reuse_two_queries(spark, emb, emb_np):
    from pagerank_spark.operators.similarity import ivf_index, ivf_topk

    ids, mat = emb_np
    idx = ivf_index(emb, n_centroids=8)
    for qi in (0, 7):
        got = ivf_topk(
            emb, [float(x) for x in mat[qi]], k=5, nprobe=8, index=idx
        ).collect()
        exact = cosine_topk(emb, [float(x) for x in mat[qi]], k=5).collect()
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    # transient index blocks are ContextCleaner-managed — no unpersist needed


def test_md5_planes_kernel_and_expr_paths_agree(spark, emb):
    """The Arrow BLAS kernel (production) and the codegen'd fold (the
    portable oracle path) must assign identical buckets — FP summation
    order differs, so this pins that no projection sits at sign-flip
    noise on the test corpus, for both plane families."""
    from pagerank_spark.operators.similarity import md5_planes

    for planes in (md5_planes(8, 64), "md5"):
        a = lsh_cosine_buckets(emb, 64, nbits=8, planes=planes, method="kernel")
        b = lsh_cosine_buckets(emb, 64, nbits=8, planes=planes, method="expr")
        diff = (
            a.withColumnRenamed("bucket", "ka")
            .join(b.withColumnRenamed("bucket", "kb"), "vec_id")
            .where(F.col("ka") != F.col("kb"))
            .count()
        )
        assert diff == 0


def test_md5_planes_deterministic_and_signed(spark):
    from pagerank_spark.operators.similarity import md5_planes

    m1 = md5_planes(4, 16, seed=42)
    m2 = md5_planes(4, 16, seed=42)
    assert (m1 == m2).all()
    assert set(np.unique(m1)) <= {-1.0, 1.0}
    # a different seed gives different planes
    assert (md5_planes(4, 16, seed=7) != m1).any()


def test_lsh_md5_topk_matches_bucket_rerank(spark, emb, emb_np):
    """cosine_topk_lsh(planes='md5') == brute-force rerank restricted to
    the query's bucket, computed independently in NumPy."""
    from pagerank_spark.operators.similarity import md5_planes

    ids, mat = emb_np
    q = mat[0]
    planes = md5_planes(4, 64)
    # sequential fold to mirror the engine's expr path exactly
    def bucket(v):
        b = 0
        for p in range(4):
            acc = 0.0
            for x, s in zip(v, planes[p]):
                acc += float(x) * float(s)
            if acc > 0:
                b |= 1 << p
        return b

    buckets = np.array([bucket(v) for v in mat])
    qb = bucket(q)
    in_b = buckets == qb
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    sims = np.where(in_b, sims, -np.inf)
    order = np.lexsort((ids, -sims))[:10]
    want = [int(i) for i in ids[order] if np.isfinite(sims[list(ids).index(i)])]
    got = [
        r["vec_id"]
        for r in cosine_topk_lsh(
            emb, [float(x) for x in q], k=10, nbits=4, planes="md5"
        ).collect()
    ]
    assert got == want[: len(got)]


def test_repetition_scores_and_gopher_filter(spark):
    from pagerank_spark.operators.textstats import (
        gopher_filter,
        repetition_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),        # all 2-grams identical
            (2, "one two three four five"),          # all distinct
            (3, "x"),                                # shorter than n
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["dup_2gram_frac"], r["dup_3gram_frac"])
        for r in repetition_scores(docs).collect()
    }
    assert got[1][0] == 0.75  # 4 bigram occurrences, 1 distinct
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)

    long_good = " ".join(
        f"the word{i} and item{i} of part{i}" for i in range(12)
    )
    filt = spark.createDataFrame(
        [(1, long_good), (2, "spam " * 100), (3, "tiny")],
        "doc_id long, text string",
    )
    keep = {r["doc_id"]: r["keep"] for r in gopher_filter(filt).collect()}
    assert keep[1] is True
    assert keep[2] is False  # pure repetition
    assert keep[3] is False  # below the token floor


def test_gopher_filter_single_scan_plan(spark):
    """The composite filter must stay ONE codegen projection — no
    Exchange (shuffle) anywhere in its plan."""
    from pagerank_spark.operators.textstats import gopher_filter
    from pagerank_spark.plans.inspect import explain_summary

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    assert "Exchange" not in explain_summary(gopher_filter(docs))


def test_unigram_perplexity_matches_hand_model(spark):
    """Hand-computed add-0.5 unigram model: corpus 'a a b' / 'a c' ->
    counts a:3 b:1 c:1, C=5, V=3, denom = 5 + 0.5*(3+1) = 7."""
    import math

    from pyspark.sql import functions as F

    from pagerank_spark.operators.textstats import unigram_perplexity

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "   ")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"], r["perplexity"])
        for r in unigram_perplexity(docs).collect()
    }
    # empty doc absent
    assert set(got) == {1, 2}
    pa_, pb = 3.5 / 7.0, 1.5 / 7.0
    b1 = -(math.log2(pa_) * 2 + math.log2(pb)) / 3
    b2 = -(math.log2(pa_) + math.log2(pb)) / 2
    assert got[1][0] == 3 and abs(got[1][1] - b1) < 1e-12
    assert got[2][0] == 2 and abs(got[2][1] - b2) < 1e-12
    assert abs(got[1][2] - 2.0 ** b1) < 1e-9
    # scoring against a separate model corpus: OOV token gets the
    # reserved alpha mass p = 0.5/7
    ev = spark.createDataFrame([(10, "z")], "doc_id long, text string")
    r = unigram_perplexity(ev, model_docs=docs).collect()[0]
    assert abs(r["bits_per_token"] - (-math.log2(0.5 / 7.0))) < 1e-12
    # higher-perplexity docs are the unusual ones (CCNet tail)
    mixed = spark.createDataFrame(
        [(1, "a a a a"), (2, "weird tokens qqq zzz")],
        "doc_id long, text string",
    )
    m = {r["doc_id"]: r["perplexity"] for r in unigram_perplexity(mixed).collect()}
    assert m[2] > m[1]


def test_semdedup_keeps_min_id_per_duplicate_group(spark):
    """Planted duplicate groups (identical vectors) collapse to their
    min id in BOTH cluster modes; distinct directions all survive."""
    import math

    from pagerank_spark.operators.similarity import semdedup

    def unit(i, d=8):
        v = [0.0] * d
        v[i % d] = 1.0
        return v

    rows = []
    # three identical copies of direction 0 (ids 0,1,2), two of
    # direction 1 (ids 10,11), singletons elsewhere
    for i in (0, 1, 2):
        rows.append((i, unit(0)))
    for i in (10, 11):
        rows.append((i, unit(1)))
    rows += [(20, unit(2)), (21, unit(3)), (22, unit(4))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    expected = {0, 10, 20, 21, 22}
    for method in ("kmeans", "lsh"):
        keep = {
            r["vec_id"]
            for r in semdedup(
                emb, threshold=0.99, method=method, n_centroids=4, nbits=4
            ).collect()
        }
        assert keep == expected, method


def test_c4_clean_line_and_page_rules(spark):
    """C4 rules: lines need >=5 words + terminal punct + no
    'javascript'; pages need >=3 kept lines, no 'lorem ipsum', no
    brace."""
    from pagerank_spark.operators.textstats import c4_clean

    docs = spark.createDataFrame(
        [
            (1, "this line ends with a period.\nshort.\n"
                "enable javascript on this page now.\n"
                "another good long line here!\n"
                "a third fine sentence stands here."),
            (2, "no terminal punctuation at all\nalso not here"),
            (3, "good line one two three four.\n"
                "good line five six seven eight.\n"
                "good line nine ten eleven twelve.\n"
                "but lorem ipsum poisons the page"),
            (4, "braces are code { so drop.\nline two is long enough too.\n"
                "line three is long enough also."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert out[1]["keep"] and out[1]["n_kept"] == 3
    assert out[1]["text"].count("\n") == 2  # the 3 surviving lines
    assert "javascript" not in out[1]["text"]
    assert not out[2]["keep"] and out[2]["text"] == ""
    assert not out[3]["keep"] and out[3]["n_kept"] == 3  # lorem ipsum
    assert not out[4]["keep"]                            # brace


def test_scrub_pii_replaces_and_counts(spark):
    """Emails, SSNs, phones, IPv4s become typed placeholders; counts
    reflect the sequential replace order (no double counting)."""
    from pagerank_spark.operators.textstats import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob@x.org or alice.b+c@sub.example.co.uk "
                "call (555) 123-4567 or 555.123.9999"),
            (2, "ssn 123-45-6789 from 10.0.3.250 and 192.168.001.1"),
            (3, "nothing private here 1234"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 2
    assert "@" not in out[1]["text"] and "<PHONE>" in out[1]["text"]
    assert out[2]["n_ssn"] == 1 and out[2]["n_ipv4"] == 2
    assert out[2]["text"] == "ssn <SSN> from <IP> and <IP>"
    assert out[3]["text"] == "nothing private here 1234"
    assert all(out[3][c] == 0 for c in ("n_email", "n_ssn", "n_phone", "n_ipv4"))


def test_value_percentiles_exact_and_approx(spark):
    """operators/percentiles: the exact form matches NumPy's linear
    interpolation per group; the approx (Greenwald-Khanna) twin obeys
    its documented rank-error bound n/accuracy and degenerates to an
    exact order statistic when the sketch holds everything."""
    import numpy as np

    from pagerank_spark.operators.percentiles import value_percentiles

    rng = np.random.RandomState(11)
    rows = [("a", float(v)) for v in rng.lognormal(0, 2, size=4000)] + [
        ("b", float(v)) for v in rng.normal(100, 5, size=1000)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    probs = (0.5, 0.9, 0.99)
    exact = {
        r["grp"]: r
        for r in value_percentiles(
            df, "value", ["grp"], probabilities=probs
        ).collect()
    }
    by_grp = {"a": sorted(v for g, v in rows if g == "a"),
              "b": sorted(v for g, v in rows if g == "b")}
    for g, vals in by_grp.items():
        assert exact[g]["n"] == len(vals)
        for p in probs:
            want = float(np.percentile(vals, p * 100, method="linear"))
            got = exact[g][f"p{p * 100:g}".replace(".", "_")]
            assert abs(got - want) < 1e-9, (g, p)
    # approx: returned value's RANK within n/accuracy of target rank
    ACC = 100
    approx = {
        r["grp"]: r
        for r in value_percentiles(
            df, "value", ["grp"], probabilities=probs,
            approx=True, accuracy=ACC,
        ).collect()
    }
    for g, vals in by_grp.items():
        n = len(vals)
        assert approx[g]["n"] == n
        for p in probs:
            got = approx[g][f"p{p * 100:g}".replace(".", "_")]
            rank = np.searchsorted(vals, got, side="left")
            assert abs(rank - p * n) <= n / ACC + 1, (g, p, rank)
    # accuracy >= n: GK is exact (an order statistic, nearest-rank)
    tight = value_percentiles(
        df.where("grp = 'b'"), "value", [], probabilities=(0.5,),
        approx=True, accuracy=10_000,
    ).collect()[0]
    assert tight["p50"] in by_grp["b"]
    assert abs(np.searchsorted(by_grp["b"], tight["p50"]) - 500) <= 1
    # global (no group) exact row
    glob = value_percentiles(df, "value", [], probabilities=(0.5,))
    row = glob.collect()[0]
    assert row["n"] == 5000 and "p50" in glob.columns


def test_zipf_fit_known_distribution(spark):
    """Slope/intercept/r² of the rank-frequency fit match a NumPy
    least-squares replay, and a perfect power law fits with r² = 1."""
    import numpy as np

    from pagerank_spark.operators.textstats import zipf_fit

    # corpus engineered so term t_r appears round(1000 / r) times —
    # an exact-ish Zipf exponent 1 head
    words = []
    for r in range(1, 41):
        words += [f"t{r:02d}"] * round(1000 / r)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_fit(docs).collect()[0]
    assert row["n_tokens"] == len(words)
    assert row["vocab_size"] == 40 and row["ranks_used"] == 40
    freqs = sorted((round(1000 / r) for r in range(1, 41)), reverse=True)
    x = np.log(np.arange(1, 41, dtype=float))
    y = np.log(np.array(freqs, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row["zipf_exponent"] - (-slope)) < 1e-9
    assert abs(row["log_c"] - intercept) < 1e-9
    assert 0.99 < row["r_squared"] <= 1.0
    # max_rank caps the fit depth
    capped = zipf_fit(docs, max_rank=10).collect()[0]
    assert capped["ranks_used"] == 10 and capped["vocab_size"] == 40


def test_embedding_covariance_and_pca_vs_numpy(spark):
    """The distributed covariance equals np.cov(bias=True) to float
    tolerance, and PCA scores equal the NumPy eigh replay under the
    same sign convention, joined by id."""
    import numpy as np

    from pagerank_spark.operators.similarity import (
        embedding_covariance,
        embedding_pca,
    )

    rng = np.random.RandomState(17)
    d, n = 8, 400
    base = rng.normal(0, 1, size=(n, 3)) @ rng.normal(0, 1, size=(3, d))
    X = base + 0.05 * rng.normal(0, 1, size=(n, d))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the array<float> column quantizes to float32 before the engine
    # ever sees a value — replay that cast
    Xf = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    C = np.cov(Xf.T, bias=True)
    got = {(r["i"], r["j"]): r["cov"]
           for r in embedding_covariance(df).collect()}
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert abs(got[(i, j)] - C[i, j]) < 1e-9, (i, j)
    k = 3
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    want = (Xf - Xf.mean(0)) @ comps.T
    pc = {r["vec_id"]: r["pc"] for r in embedding_pca(df, k=k).collect()}
    for i in range(n):
        assert np.abs(np.array(pc[i]) - want[i]).max() < 1e-9, i
    # the 3-factor structure shows: top-3 variance dominates
    assert vals[order].sum() / vals.sum() > 0.95


def test_bigram_perplexity_matches_hand_model(spark):
    """Hand-computed add-0.5 bigram model on corpus 'a b a' / 'b a':
    bigrams (a,b) (b,a) (b,a) -> c2[(a,b)]=1 c2[(b,a)]=2,
    contexts c1[a]=1 c1[b]=2, V = |{a,b}| = 2, denom_v = c1[v] + 0.5*3."""
    import math

    from pagerank_spark.operators.textstats import bigram_perplexity

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_bigram"])
        for r in bigram_perplexity(docs).collect()
    }
    # docs with < 2 tokens have no bigram and are absent — note "solo"
    # contributes a token but no bigram, so V counts bigram positions only
    assert set(got) == {1, 2}
    p_ab = (1 + 0.5) / (1 + 0.5 * (2 + 1))  # c2/c1 for context a
    p_ba = (2 + 0.5) / (2 + 0.5 * (2 + 1))  # context b
    b1 = -(math.log2(p_ab) + math.log2(p_ba)) / 2
    b2 = -math.log2(p_ba)
    assert got[1][0] == 2 and abs(got[1][1] - b1) < 1e-12
    assert got[2][0] == 1 and abs(got[2][1] - b2) < 1e-12
    # word order sensitivity: shuffled text keeps its unigram profile
    # but scores strictly worse under the bigram model fit on the
    # ordered corpus
    model = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(5)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(100, "the quick brown fox jumps"), (101, "fox the jumps quick brown")],
        "doc_id long, text string",
    )
    m = {
        r["doc_id"]: r["perplexity"]
        for r in bigram_perplexity(probe, model_docs=model).collect()
    }
    assert m[101] > m[100]
