"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything is built from JVM-side expressions (split / regexp /
length-replace arithmetic) so the hot path is whole-stage codegen —
and deliberately PORTABLE: every function here has an exact ANSI-SQL
equivalent (used as the DuckDB oracle in ``__spark_entry__.py``), so
correctness is machine-checked, not eyeballed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.functions.text import shingles as _shingles
from pagerank_spark.functions.text import token_count as _token_count
from pagerank_spark.functions.text import word_occurrences as _word_occurrences

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Counting ' word ' occurrences via length-replace arithmetic is exact
# and portable across Spark and DuckDB.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
    "de": ["der", "und", "die"],
    "zh": ["de", "shi", "le"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# BPE-ish subword unit: runs of word chars up to 4 long, or a single
# non-space symbol — a deterministic stand-in for a tokenizer's merges.
BPE_REGEX = r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, ws_tokens, bpe_tokens, n_chars)``.

    ``ws_tokens`` — whitespace tokenization; ``bpe_tokens`` — count of
    BPE-ish subword units (``BPE_REGEX``), the "how many tokens will
    this cost" estimator.
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _token_count(t).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_REGEX), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def _quality_exprs(text_col: str):
    """The shared per-row quality expressions (used by both
    quality_scores and gopher_filter so the corpus is scanned once)."""
    t = F.col(text_col)
    n_tokens = _token_count(t).cast("double")
    n_chars = F.length(t).cast("double")
    stop_hits = None
    for w in STOPWORDS:
        c = _word_occurrences(t, w).cast("double")
        stop_hits = c if stop_hits is None else stop_hits + c
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": n_chars / F.greatest(n_tokens, F.lit(1.0)),
        "stopword_ratio": stop_hits / F.greatest(n_tokens, F.lit(1.0)),
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1.0)),
    }


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality signals: ``(doc_id, n_chars, n_tokens,
    mean_token_len, stopword_ratio, punct_ratio, quality_score)``.

    quality_score in [0,1]: stopword presence (natural-language-ness)
    minus punctuation-noise penalty, clamped. Deterministic, portable.
    """
    q = _quality_exprs(text_col)
    score = F.least(
        F.greatest(
            F.least(q["stopword_ratio"] * 4, F.lit(1.0))
            - q["punct_ratio"] * 2,
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        q["n_chars"].cast("long").alias("n_chars"),
        q["n_tokens"].cast("long").alias("n_tokens"),
        F.round(q["mean_token_len"], 6).alias("mean_token_len"),
        F.round(q["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(q["punct_ratio"], 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, pred_lang, marker_hits)`` — argmax of marker-word
    counts, ties broken by language code order (deterministic).

    An honest heuristic, not a model: accuracy depends on the corpus
    actually containing the marker words.
    """
    t = F.col(text_col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        s = None
        for w in LANG_MARKERS[lang]:
            c = _word_occurrences(t, w)
            s = c if s is None else s + c
        scores.append(F.struct(s.alias("hits"), F.lit(lang).alias("lang")))
    # max of (hits, lang-desc) -> most hits, ties -> smallest code.
    # struct max compares hits first, then lang lexicographically; to
    # break ties toward the SMALLEST code we invert via a sort_array.
    arr = F.sort_array(F.array(*scores), asc=False)
    best = F.element_at(
        F.filter(arr, lambda x: x["hits"] == arr[0]["hits"]), -1
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: int = 8, hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing-style document fingerprint: ``(doc_id, fingerprint)``.

    Min hash over sliding ``window``-token shingles — a rolling-hash
    content signature stable under reordering-free edits outside the
    minimal window. JVM-side (transform + hash + array_min).
    ``hash_fn="md5"`` (functions.text.hash64) makes the fingerprint
    ANSI-portable for cross-engine value checks; xxhash64 is the
    production default.
    """
    from pagerank_spark.functions.text import hash64

    hashed = F.transform(
        _shingles(F.col(text_col), window), lambda s: hash64(s, hash_fn)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_min(hashed).alias("fingerprint"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``(doc_id, pos, term, tf, df, tfidf)`` with ``pos`` 1..k ranked by
    (tfidf desc, term asc — deterministic on exact ties, which are the
    only ties possible since equal (tf, df) pairs produce bit-identical
    scores).

    Tokenizer: lowercase, split on non-alphanumeric runs (portable —
    the oracle's ``string_split_regex`` is identical). Smoothed
    sklearn-style idf ``ln((N+1)/(df+1)) + 1`` keeps unseen-term
    weights positive; N counts distinct documents via an in-plan
    broadcast scalar (no driver action).

    Scale shape: explode → (doc, term) count → term df — all
    map-side-combinable aggregations on skinny rows; the df side is a
    vocabulary-sized table Catalyst/AQE can broadcast; the final
    row_number window partitions by doc_id, so per-partition state is
    one document's vocabulary.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = docs.agg(F.count_distinct(F.col(id_col)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log(
                    (F.col("_n").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("doc_id", "pos", "term", "tf", "df", "tfidf")
    )


def repetition_scores(
    docs: DataFrame,
    ns: tuple[int, ...] = (2, 3),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText rules,
    Rae et al. 2021 §A1.1): for each n in ``ns``, the fraction of
    n-gram OCCURRENCES that are repeats of an already-seen n-gram —
    ``(doc_id, dup_{n}gram_frac...)``, 0.0 for documents with fewer
    than n tokens. High values mark boilerplate/keyword-stuffing.

    Whole-stage-codegen expressions only (shingle array → distinct
    count vs length); one pass, no shuffle beyond the scan.
    """
    from pagerank_spark.functions.text import shingles

    cols = [F.col(id_col).alias("doc_id")]
    for n in ns:
        sh = shingles(F.col(text_col), n)
        frac = F.when(
            F.size(sh) > 0,
            1.0
            - F.size(F.array_distinct(sh)).cast("double") / F.size(sh),
        ).otherwise(F.lit(0.0))
        cols.append(frac.alias(f"dup_{n}gram_frac"))
    return docs.select(*cols)


# Gopher-style composite filter bounds (Rae et al. 2021, Table A1 —
# simplified to the signals this engine computes portably)
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_TOKEN_LEN = 3.0
GOPHER_MAX_MEAN_TOKEN_LEN = 10.0
GOPHER_MAX_PUNCT_RATIO = 0.2
GOPHER_MIN_STOPWORD_RATIO = 0.01
GOPHER_MAX_DUP_2GRAM = 0.4


def gopher_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Composite document-quality filter in the Gopher/MassiveText
    style: ``(doc_id, <signals>, keep)`` where ``keep`` ands the
    published-rule-shaped bounds over the engine's portable signals
    (token-count window, mean token length window, punctuation-noise
    cap, stopword floor, 2-gram repetition cap). The signals stay in
    the output so pipelines can tune per-rule instead of re-deriving.
    """
    # ONE projection computes every signal — no second corpus scan, no
    # join (quality_scores + repetition_scores share pure per-row
    # expressions via _quality_exprs / shingles)
    from pagerank_spark.functions.text import shingles

    q = _quality_exprs(text_col)
    sh = shingles(F.col(text_col), 2)
    dup2 = F.when(
        F.size(sh) > 0,
        1.0 - F.size(F.array_distinct(sh)).cast("double") / F.size(sh),
    ).otherwise(F.lit(0.0))
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        q["n_tokens"].cast("long").alias("n_tokens"),
        F.round(q["mean_token_len"], 6).alias("mean_token_len"),
        F.round(q["punct_ratio"], 6).alias("punct_ratio"),
        F.round(q["stopword_ratio"], 6).alias("stopword_ratio"),
        dup2.alias("dup_2gram_frac"),
    )
    keep = (
        (F.col("n_tokens") >= GOPHER_MIN_TOKENS)
        & (F.col("n_tokens") <= GOPHER_MAX_TOKENS)
        & (F.col("mean_token_len") >= GOPHER_MIN_MEAN_TOKEN_LEN)
        & (F.col("mean_token_len") <= GOPHER_MAX_MEAN_TOKEN_LEN)
        & (F.col("punct_ratio") <= GOPHER_MAX_PUNCT_RATIO)
        & (F.col("stopword_ratio") >= GOPHER_MIN_STOPWORD_RATIO)
        & (F.col("dup_2gram_frac") <= GOPHER_MAX_DUP_2GRAM)
    )
    return sig.select(
        "doc_id", "n_tokens", "mean_token_len", "punct_ratio",
        "stopword_ratio", "dup_2gram_frac", keep.alias("keep"),
    )


def unigram_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score (Wenzek et al. 2020
    rank documents by KenLM perplexity; this is the model-free unigram
    analogue): ``(doc_id, n_tokens, bits_per_token, perplexity)`` —
    per-document bits/token under an add-``alpha``-smoothed unigram
    model fit on ``model_docs`` (default: the scored corpus itself).

        p(w) = (c_w + alpha) / (C + alpha * (V + 1))
        bits_per_token = -(Σ_i log2 p(w_i)) / n      (token multiplicity)
        perplexity     = 2^bits_per_token

    The ``V + 1`` reserves smoothed mass for out-of-vocabulary tokens
    (c_w = 0), so scoring against a reference model corpus is
    well-defined. High perplexity flags unusual token distributions —
    gibberish, boilerplate tables, wrong-language text — the CCNet
    head/middle/tail partition knob. Documents with zero tokens are
    absent from the output (no defined score).

    Scale shape: one explode scan per corpus (whitespace lowercase
    tokens, whole-stage codegen), a vocabulary-sized count table
    (broadcast below Spark's auto threshold), one join + one
    map-side-combinable per-doc aggregate. All arithmetic is
    ANSI-replayable (the gate's DuckDB oracle recomputes it exactly,
    up to per-doc double-sum ordering absorbed by rounding).
    """
    tok = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    doc_toks = tok(docs)
    model_toks = tok(model_docs if model_docs is not None else docs)
    counts = model_toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("_C"), F.count(F.lit(1)).alias("_V")
    )
    scored = (
        doc_toks.join(counts, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.log2(
                (F.coalesce("c", F.lit(0)) + F.lit(alpha))
                / (F.col("_C") + F.lit(alpha) * (F.col("_V") + F.lit(1)))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum("lp") / F.count(F.lit(1))).alias("bits_per_token"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "bits_per_token",
        F.pow(F.lit(2.0), F.col("bits_per_token")).alias("perplexity"),
    )


def bigram_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram LM quality score — the order-2 sibling of
    :func:`unigram_perplexity` (same CCNet-style ranking role, Wenzek
    et al. 2020; add-``alpha`` conditional smoothing):

        p(w | v) = (c(v, w) + alpha) / (c(v, ·) + alpha * (V + 1))
        bits_per_bigram = -(Σ log2 p(w_i | w_{i-1})) / (n - 1)

    ``c(v, ·)`` counts v as a *context* (number of bigrams starting
    with v), so the conditional distribution normalizes over the
    observed follower multiset plus the reserved OOV mass. Documents
    with fewer than two tokens have no bigram and are absent. The
    smoothing vocabulary ``V`` is the BIGRAM-PARTICIPATING vocabulary
    (distinct tokens appearing in at least one model bigram) — tokens
    occurring solely in single-token documents are excluded, a
    self-consistent but narrower set than the full corpus vocabulary.

    Bigram captures local word order that the unigram score is blind
    to: shuffled or template-stitched text keeps its unigram profile
    but lights up here. Scale shape: one tokenize scan with a
    per-document ``lag`` window (partitioned by doc — no global sort),
    a bigram count table, one join + one map-side-combinable per-doc
    aggregate. All arithmetic ANSI-replayable.
    """
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    tok = lambda df: (  # noqa: E731
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("pos", "w"),
        )
        .where(F.col("w") != "")
        .select("doc_id", "pos", "w", F.lag("w").over(w_doc).alias("v"))
        .where(F.col("v").isNotNull())
    )
    doc_bi = tok(docs)
    model_bi = tok(model_docs if model_docs is not None else docs)
    c2 = model_bi.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c2"))
    c1 = model_bi.groupBy("v").agg(F.count(F.lit(1)).alias("c1"))
    vocab = model_bi.select(F.col("w").alias("t")).union(
        model_bi.select(F.col("v").alias("t"))
    )
    totals = vocab.agg(F.count_distinct("t").alias("_V"))
    scored = (
        doc_bi.join(c2, ["v", "w"], "left")
        .join(c1, "v", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.log2(
                (F.coalesce("c2", F.lit(0)) + F.lit(alpha))
                / (
                    F.coalesce("c1", F.lit(0))
                    + F.lit(alpha) * (F.col("_V") + F.lit(1))
                )
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("lp") / F.count(F.lit(1))).alias("bits_per_bigram"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "bits_per_bigram",
        F.pow(F.lit(2.0), F.col("bits_per_bigram")).alias("perplexity"),
    )


# C4 cleaning bounds (Raffel et al. 2020 §2.2 — the portable subset of
# the published rules; the bad-word list is out of scope)
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
) -> DataFrame:
    """C4-style line + page cleaning (Raffel et al. 2020 §2.2): a LINE
    survives iff its trimmed form ends in terminal punctuation
    (``. ! ? "``), has at least ``min_line_words`` whitespace tokens,
    and does not mention ``javascript``; the PAGE is kept iff it
    retains at least ``min_kept_lines`` lines and contains neither
    ``lorem ipsum`` nor a curly brace. Returns
    ``(doc_id, text, n_lines, n_kept, keep)`` with ``text`` the
    surviving trimmed lines rejoined by newline (empty string when
    nothing survives), so pipelines can either filter on ``keep`` or
    take the cleaned text directly.

    Scale shape: ONE whole-stage-codegen projection per document
    (split → higher-order filter → array_join) — no shuffle, no UDF,
    no second scan; the rules run inside the parquet scan itself.
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep_line(x):
        t = F.trim(x)
        return (
            (F.size(F.split(t, r"\s+")) >= min_line_words)
            & t.rlike('[.!?"]$')
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(lines, _keep_line)
    keep = (
        (F.size(kept) >= min_kept_lines)
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(F.transform(kept, F.trim), "\n").alias(text_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        keep.alias("keep"),
    )


# PII scrub patterns — deliberately restricted to the regex dialect
# shared by Java (Spark) and RE2 (DuckDB oracle): no lookaround, no
# backrefs. Applied IN ORDER, each on the output of the previous
# replacement, so counts are well-defined even when patterns could
# overlap (an IP inside an already-scrubbed email is never re-counted).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub personally identifiable information from text: emails,
    US SSNs, phone numbers, and IPv4 addresses are replaced by typed
    placeholders (``<EMAIL>`` …), with per-kind match counts —
    ``(doc_id, text, n_email, n_ssn, n_phone, n_ipv4)``. The standard
    pre-training redaction stage next to the quality filters.

    Scale shape: the whole scrub is ONE codegen projection of nested
    ``regexp_count`` / ``regexp_replace`` expressions over the scan —
    no shuffle, no UDF, no second pass.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, tok in PII_PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, tok)
    return docs.select(
        F.col(id_col).alias("doc_id"), cur.alias(text_col), *counts
    )


def corpus_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distribution distance between two corpus slices — the
    domain-shift / mixture-drift diagnostic (Kullback-Leibler 1951;
    Lin 1991 for the Jensen-Shannon form). A training-data pipeline
    reads this to answer "did this month's crawl drift from last
    month's", "how far is the held-out slice from the train mixture",
    or "which source bucket is the outlier" — the corpus-level
    companion of the per-document perplexity score.

    Both unigram distributions are add-``alpha`` smoothed over the
    UNION vocabulary (same support → every quantity finite and each
    distribution sums to exactly 1):

        p_X(w) = (c_X(w) + alpha) / (C_X + alpha·|V∪|)

    Returns ONE row: ``(tokens_a, tokens_b, vocab_union, kl_ab,
    kl_ba, js_divergence, total_variation)`` — KL in bits (log2), JS
    the symmetric ½KL(A‖M)+½KL(B‖M) against the midpoint (bounded by
    1 bit), TV = ½Σ|p_a − p_b| ∈ [0, 1].

    Scale shape: one tokenize-explode scan per corpus into a
    vocabulary-sized count table (map-side combinable), ONE full-outer
    join of the two skinny count tables on the term, and a single
    combinable scalar fold — document text never rides a shuffle; all
    arithmetic ANSI-replayable.
    """
    tok = lambda df: df.select(  # noqa: E731
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).where(F.col("w") != "")
    ca = tok(docs_a).groupBy("w").agg(F.count(F.lit(1)).alias("ca"))
    cb = tok(docs_b).groupBy("w").agg(F.count(F.lit(1)).alias("cb"))
    j = (
        ca.join(cb, "w", "full")
        .select(
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    totals = j.agg(
        F.sum("ca").alias("_Ca"),
        F.sum("cb").alias("_Cb"),
        F.count(F.lit(1)).alias("_V"),
    )
    pa = (F.col("ca") + F.lit(alpha)) / (
        F.col("_Ca") + F.lit(alpha) * F.col("_V")
    )
    pb = (F.col("cb") + F.lit(alpha)) / (
        F.col("_Cb") + F.lit(alpha) * F.col("_V")
    )
    m = (pa + pb) / 2
    return (
        j.crossJoin(F.broadcast(totals))
        .select(
            F.col("_Ca").alias("tokens_a"),
            F.col("_Cb").alias("tokens_b"),
            F.col("_V").alias("vocab_union"),
            (pa * F.log2(pa / pb)).alias("_kab"),
            (pb * F.log2(pb / pa)).alias("_kba"),
            (0.5 * (pa * F.log2(pa / m) + pb * F.log2(pb / m))).alias(
                "_js"
            ),
            (0.5 * F.abs(pa - pb)).alias("_tv"),
        )
        .groupBy("tokens_a", "tokens_b", "vocab_union")
        .agg(
            F.sum("_kab").alias("kl_ab"),
            F.sum("_kba").alias("kl_ba"),
            F.sum("_js").alias("js_divergence"),
            F.sum("_tv").alias("total_variation"),
        )
    )


def hashed_token_histogram(
    docs: DataFrame,
    n_buckets: int = 1024,
    hash_fn: str = "xxhash64",
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width hashed token histogram — the BOUNDED-STATE corpus
    fingerprint (feature hashing, Weinberger et al. 2009): every token
    maps to ``hash(token) mod n_buckets``, so the histogram is exactly
    ``n_buckets`` counters regardless of vocabulary size. This is what
    makes a drift monitor deployable on an unbounded stream: per-window
    state is B counters, never a vocabulary. ``hash_fn="md5"`` uses the
    portable hash so the histogram replays bit-exact in ANSI SQL.

    Returns ``(*group_cols, bucket, c)`` — one row per non-empty
    bucket (join against ``spark.range(n_buckets)`` for dense form).
    One tokenize scan + one map-side-combinable count; text never
    rides a shuffle.
    """
    from pagerank_spark.functions.text import hash64

    gcols = list(group_cols or [])
    tok = docs.select(
        *gcols,
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).where(F.col("w") != "")
    return (
        tok.withColumn(
            "bucket", F.pmod(hash64(F.col("w"), hash_fn), F.lit(n_buckets))
        )
        .groupBy(*gcols, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hashed_divergence(
    hist_a: DataFrame,
    hist_b: DataFrame,
    n_buckets: int,
    alpha: float = 0.5,
) -> DataFrame:
    """KL/JS/TV between two hashed histograms over the FIXED
    ``n_buckets`` support (add-``alpha`` smoothing on every bucket, so
    both distributions sum to exactly 1 and all quantities are
    finite). The hashed divergences lower-bound the exact
    vocabulary-level ones (hashing merges terms; a data-processing
    inequality) — the standard operating statistic for drift alarms.

    Inputs are ``(bucket, c)`` frames (e.g. two windows of
    :func:`hashed_token_histogram`). Returns ONE row ``(tokens_a,
    tokens_b, kl_ab, kl_ba, js_divergence, total_variation)``.
    Scale shape: one ``range(n_buckets)`` frame + two B-row joins +
    one combinable scalar fold — B-bounded everywhere.
    """
    spark = hist_a.sparkSession
    base = spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    j = (
        base.join(hist_a.select("bucket", F.col("c").alias("ca")), "bucket", "left")
        .join(hist_b.select("bucket", F.col("c").alias("cb")), "bucket", "left")
        .select(
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    totals = j.agg(
        F.sum("ca").alias("_Ca"), F.sum("cb").alias("_Cb")
    )
    pa = (F.col("ca") + F.lit(alpha)) / (
        F.col("_Ca") + F.lit(alpha) * F.lit(n_buckets)
    )
    pb = (F.col("cb") + F.lit(alpha)) / (
        F.col("_Cb") + F.lit(alpha) * F.lit(n_buckets)
    )
    m = (pa + pb) / 2
    return (
        j.crossJoin(F.broadcast(totals))
        .select(
            F.col("_Ca").alias("tokens_a"),
            F.col("_Cb").alias("tokens_b"),
            (pa * F.log2(pa / pb)).alias("_kab"),
            (pb * F.log2(pb / pa)).alias("_kba"),
            (0.5 * (pa * F.log2(pa / m) + pb * F.log2(pb / m))).alias("_js"),
            (0.5 * F.abs(pa - pb)).alias("_tv"),
        )
        .groupBy("tokens_a", "tokens_b")
        .agg(
            F.sum("_kab").alias("kl_ab"),
            F.sum("_kba").alias("kl_ba"),
            F.sum("_js").alias("js_divergence"),
            F.sum("_tv").alias("total_variation"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_rank: int = 10_000,
) -> DataFrame:
    """Zipf's-law fit of the corpus term-frequency distribution — one
    row: ``DataFrame[n_tokens, vocab_size, ranks_used, zipf_exponent,
    log_c, r_squared]``.

    Least squares of ``ln f_r = log_c − s·ln r`` over the top
    ``max_rank`` terms (rank = ``row_number`` under the deterministic
    (freq DESC, term ASC) order); ``zipf_exponent`` = s (≈1 for
    natural language, Zipf 1949), ``r_squared`` the fit quality —
    the standard sanity probe that a crawled corpus looks like
    language rather than boilerplate/logs (which bend the curve), and
    the pair of the Gopher/perplexity per-document signals: this one
    is corpus-level. Tokenization matches :func:`unigram_perplexity`
    (lowercased whitespace tokens).

    Scale shape: one explode scan → vocabulary-sized count table →
    ``TakeOrderedAndProject`` top-``max_rank`` heap (the cap is what
    keeps rank assignment off the full vocabulary — fitting the head
    is also the statistically standard practice, since the rank tail
    always bends away from the power law); the windowed rank then
    touches ≤ max_rank rows, and the fit is one scalar fold.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w")
    ).where(F.col("w") != "")
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("vocab_size")
    )
    top = counts.orderBy(F.desc("c"), F.asc("w")).limit(int(max_rank))
    ranked = top.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("w")))
            .cast("double")
        ).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    fit = ranked.agg(
        F.count(F.lit(1)).alias("ranks_used"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).alias("_syy"),
        F.sum(F.col("x") * F.col("y")).alias("_sxy"),
    )
    n = F.col("ranks_used").cast("double")
    cov = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n
    varx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n
    vary = F.col("_syy") - F.col("_sy") * F.col("_sy") / n
    slope = F.when(varx > 0, cov / varx).otherwise(F.lit(0.0))
    return fit.crossJoin(F.broadcast(totals)).select(
        "n_tokens",
        "vocab_size",
        "ranks_used",
        (-slope).alias("zipf_exponent"),
        ((F.col("_sy") - slope * F.col("_sx")) / n).alias("log_c"),
        F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary))
        .otherwise(F.lit(0.0))
        .alias("r_squared"),
    )
