"""Dedup operator tests on the driver's documents table + crafted fixtures."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_bands,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_duplicate_pairs,
    simhash_fingerprints,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # inject known duplicates/near-duplicates deterministically
    dup = base.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = base.where((F.col("doc_id") >= 5) & (F.col("doc_id") < 8)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail token")).alias("text"),
    )
    return base.union(dup).union(near).cache()


def test_exact_duplicates(spark, docs):
    groups = exact_duplicates(docs)
    dups = groups.where(F.col("n_dups") > 1).collect()
    assert len(dups) == 5
    assert all(r["keep_id"] < 5 for r in dups)
    kept = dedup_exact(docs)
    assert kept.count() == docs.count() - 5
    # survivors are the min ids
    assert kept.where(F.col("doc_id") >= 100000).count() == 3  # only near-dups remain


def test_minhash_bands_shape(spark, docs):
    b = minhash_bands(docs, num_perm=32, bands=8)
    assert b.columns == ["doc_id", "band", "band_hash"]
    per_doc = b.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [8]


def test_minhash_finds_exact_and_near_dups(spark, docs):
    pairs = minhash_lsh_pairs(
        docs, num_perm=64, bands=32, verify_threshold=0.5
    ).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    # all 5 exact dup pairs must collide (jaccard 1.0)
    for i in range(5):
        assert (i, i + 100000) in got
    # near-dups (one appended token) should be caught at >=0.5 jaccard
    for i in range(5, 8):
        assert (i, i + 200000) in got
    jac = {(r["a"], r["b"]): r["jaccard"] for r in pairs}
    for i in range(5):
        assert jac[(i, i + 100000)] == pytest.approx(1.0)


def test_dedup_near_transitive_clusters(spark, docs):
    from pagerank_spark.operators.dedup import dedup_near

    out = dedup_near(docs, threshold=0.7)
    # exact dups (jaccard 1.0) are removed, min id survives
    assert out.where(F.col("doc_id").isin([100000 + i for i in range(5)])).count() == 0
    assert out.where(F.col("doc_id").isin(list(range(5)))).count() == 5
    # near-dups (appended token) removed at 0.7
    assert out.where(F.col("doc_id").isin([200005, 200006, 200007])).count() == 0
    # exact survivor set: union-find over the same verified pair graph
    # (the base corpus itself contains organic near-dup pairs)
    pairs = [
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(docs, verify_threshold=0.7).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    dropped = {x for x in parent if find(x) != x}
    want_survivors = all_ids - dropped
    got_survivors = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert got_survivors == want_survivors


def test_minhash_deterministic(spark, docs):
    p1 = sorted(map(tuple, minhash_lsh_pairs(docs, verify_threshold=None).collect()))
    p2 = sorted(map(tuple, minhash_lsh_pairs(docs, verify_threshold=None).collect()))
    assert p1 == p2


def test_simhash_exact_dups_collide(spark, docs):
    fp = simhash_fingerprints(docs)
    assert fp.count() == docs.count()
    pairs = {(r["a"], r["b"]) for r in simhash_duplicate_pairs(docs).collect()}
    for i in range(5):
        assert (i, i + 100000) in pairs


def test_ngram_jaccard_bruteforce(spark, docs):
    small = docs.where((F.col("doc_id") < 10) | (F.col("doc_id") >= 100000))
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(small, threshold=0.4).collect()
    }
    for i in range(5):
        assert pairs[(i, i + 100000)] == pytest.approx(1.0)
    for i in range(5, 8):
        assert 0.4 <= pairs[(i, i + 200000)] <= 1.0


def test_md5_hash_mode_matches_python_oracle(spark, docs):
    """functions.text.hash64 md5 mode == top-60-bits of hashlib md5 —
    the contract the DuckDB oracles rely on."""
    import hashlib

    from pagerank_spark.functions.text import hash64

    sample = docs.limit(5).select(
        "doc_id", hash64(F.col("text"), "md5").alias("h"), "text"
    ).collect()
    for r in sample:
        expect = int(hashlib.md5(r["text"].encode()).hexdigest()[:15], 16)
        assert r["h"] == expect


def test_minhash_md5_pairs_match_xxhash_pairs(spark, docs):
    """Same docs, same bands: the portable-hash variant must find the
    same duplicate PAIR SET (hash family differs, but exact-duplicate
    collisions and the verified exact-Jaccard values are hash-free)."""
    kw = dict(num_perm=16, bands=16, verify_threshold=0.99)
    px = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, **kw).collect()}
    pm = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(docs, hash_fn="md5", **kw).collect()
    }
    # exact duplicates (jaccard 1.0) must be found by both
    assert {(a, b) for a, b in px if a < 5} == {(a, b) for a, b in pm if a < 5}


def test_simhash_md5_top_bits_zero(spark, docs):
    fp = simhash_fingerprints(docs, hash_fn="md5").limit(50).collect()
    for r in fp:
        assert 0 <= r["simhash"] < (1 << 60)


def test_ngram_bruteforce_guard(spark, docs):
    with pytest.raises(ValueError, match="block_bits"):
        ngram_jaccard_pairs(docs, max_bruteforce_rows=10).count()
    # blocked path is exempt from the ceiling
    ngram_jaccard_pairs(docs.limit(20), block_bits=2, max_bruteforce_rows=10)


def test_simhash_dedup_near_degenerate_bucket_is_linear(spark):
    """10k identical (empty-ish) docs — the 100 TB norm for boilerplate —
    must dedup through ONE graph vertex, never a quadratic pair
    expansion: the candidate join runs on DISTINCT fingerprints."""
    import time

    from pagerank_spark.operators.dedup import simhash_dedup_near

    n = 10_000
    degenerate = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("  ").alias("text")
    )
    distinct = spark.createDataFrame(
        [(n + i, f"unique document number {i} with words {i * 7}") for i in range(20)],
        "doc_id long, text string",
    )
    docs = degenerate.union(distinct)
    t0 = time.monotonic()
    survivors = simhash_dedup_near(docs, max_hamming=3).select("doc_id").collect()
    elapsed = time.monotonic() - t0
    ids = {r["doc_id"] for r in survivors}
    # exactly one survivor (min id) of the 10k-doc identical cluster
    assert 0 in ids
    assert not any(0 < i < n for i in ids)
    # distinct docs survive unless they near-collide with each other
    assert sum(1 for i in ids if i >= n) >= 1
    # linearity proxy: finishes in seconds, not the minutes a 5*10^7-row
    # pair expansion (plus distinct) would take
    assert elapsed < 60


def test_simhash_near_pairs_split_paths_match_bruteforce(spark):
    """The restructured pairs operator (equal-fp fast path + distinct-fp
    banded join) must still equal the brute-force Hamming<=k pair set."""
    from pagerank_spark.operators.dedup import simhash_near_pairs

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).limit(80)
    # clone a handful of docs so equal-fp pairs exist
    docs = base.union(
        base.where(F.col("doc_id") < 6).select(
            (F.col("doc_id") + 500).alias("doc_id"), "text"
        )
    )
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs).collect()
    }
    want = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                want.add((a, b, h))
    assert got == want


def test_contamination_detects_planted_overlap(spark):
    from pagerank_spark.operators.dedup import contamination

    shared = "the quick brown fox jumps over the lazy dog again and again today"
    train = spark.createDataFrame(
        [
            (1, "completely unrelated training text about graphs and spark"),
            (2, f"prefix words here {shared} suffix words there"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, f"an eval question containing {shared} verbatim"),
            (11, "clean eval text with no overlap whatsoever in any window"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["n_shingles"])
        for r in contamination(ev, train, shingle_k=13).collect()
    }
    assert 10 in got and 11 not in got
    n_matches, n_shingles = got[10]
    assert 1 <= n_matches <= n_shingles
    # raising min_matches above the hit count filters the doc out
    high = contamination(ev, train, shingle_k=13, min_matches=n_matches + 1)
    assert high.count() == 0


def test_minhash_dedup_near_degenerate_bucket_is_linear(spark):
    """10k byte-identical docs — the 100 TB boilerplate-flood norm —
    must dedup through ONE LSH participant, never a quadratic
    within-bucket candidate join: the band self-join runs at
    distinct-content (rep) granularity (VERDICT r03 item #1)."""
    import time

    from pagerank_spark.operators.dedup import dedup_near

    n = 10_000
    degenerate = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("this exact boilerplate footer text repeats on every page here").alias(
            "text"
        ),
    )
    distinct = spark.createDataFrame(
        [
            (n + i, f"unique document number {i} with some words {i * 7} {i * 13}")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    docs = degenerate.union(distinct)
    t0 = time.monotonic()
    survivors = dedup_near(docs, threshold=0.8).select("doc_id").collect()
    elapsed = time.monotonic() - t0
    ids = {r["doc_id"] for r in survivors}
    # exactly one survivor (min id) of the 10k-doc identical cluster
    assert 0 in ids
    assert not any(0 < i < n for i in ids)
    assert sum(1 for i in ids if i >= n) >= 1
    # linearity proxy: finishes in seconds, not the minutes a 5*10^7-row
    # candidate expansion (plus distinct + verify join) would take
    assert elapsed < 60


def test_minhash_pairs_collapse_matches_uncollapsed(spark, docs):
    """collapse_identical=True (rep-granularity band join + expansion)
    must be bit-identical to the direct doc-granularity join — verified
    and candidate-only paths, including empty-shingle docs (short texts
    below shingle_k verify at NULL jaccard and never pair)."""
    short = spark.createDataFrame(
        [(900001, "tiny"), (900002, "tiny"), (900003, "tiny")],
        "doc_id long, text string",
    )
    d = docs.union(short)
    kw = dict(num_perm=32, bands=16)
    for vt in (0.7, None):
        a = sorted(
            map(tuple, minhash_lsh_pairs(d, verify_threshold=vt, **kw).collect())
        )
        b = sorted(
            map(
                tuple,
                minhash_lsh_pairs(
                    d, verify_threshold=vt, collapse_identical=False, **kw
                ).collect(),
            )
        )
        assert a == b


def test_line_dedup_removes_cross_doc_lines(spark):
    """Lines shared across docs (normalized identity) are removed from
    EVERY doc; blank lines are structural and always survive; order is
    preserved; an all-duplicate doc keeps an empty text."""
    from pagerank_spark.operators.dedup import duplicated_lines, line_dedup

    docs = spark.createDataFrame(
        [
            (1, "keep me\nBoiler Plate\n\nalso keep"),
            (2, "  boiler plate \nother"),
            (3, "boiler plate"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert out[1]["text"] == "keep me\n\nalso keep"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (4, 1)
    assert out[2]["text"] == "other"
    assert out[3]["text"] == "" and out[3]["n_removed"] == 1
    dup = duplicated_lines(docs).collect()
    assert len(dup) == 1 and dup[0]["n_docs"] == 3


def test_line_dedup_threshold_and_within_doc(spark):
    """max_docs raises the removal threshold, and a line repeated only
    WITHIN one doc is never removed (distinct-doc counting)."""
    from pagerank_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "twice\ntwice\nshared"), (2, "shared\nx"), (3, "shared")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, max_docs=2).collect()}
    # 'shared' is in 3 docs > max_docs=2 -> removed; 'twice' x2 in one doc kept
    assert out[1]["text"] == "twice\ntwice"
    out1 = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert out1[1]["text"] == "twice\ntwice"


def test_duplicate_spans_flags_shared_and_repeated(spark):
    """A span shared across docs or repeated within one doc counts as
    duplicated; a unique doc scores 0."""
    from pagerank_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # shares 'a b c' start with doc 2
            (2, "a b c x y z"),
            (3, "p q r p q r p q r"), # within-doc repetition
            (4, "unique words only here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, shingle_k=3).collect()}
    assert out[1]["n_spans"] == 4 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] > 0          # 'p q r' recurs within doc 3
    assert out[4]["n_dup_spans"] == 0 and out[4]["dup_span_frac"] == 0.0


def test_remove_duplicate_spans_cuts_covered_tokens(spark):
    """The removal form cuts exactly the tokens covered by a duplicated
    k-span (cross-doc or within-doc) and reassembles survivors in order."""
    from pagerank_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # shares 'a b c' with doc 2
            (2, "a b c x y z"),
            (3, "p q r p q r p q r"),  # every 3-span duplicated in-doc
            (4, "unique words only here"),
            (5, "tiny"),               # shorter than k: one padded span
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, shingle_k=3).collect()
    }
    assert out[1]["text"] == "d e f"
    assert out[1]["n_tokens"] == 6 and out[1]["n_removed"] == 3
    assert out[2]["text"] == "x y z" and out[2]["n_removed"] == 3
    assert out[3]["text"] == "" and out[3]["n_removed"] == 9
    assert out[4]["text"] == "unique words only here"
    assert out[4]["n_removed"] == 0
    assert out[5]["text"] == "tiny" and out[5]["n_removed"] == 0
