"""Text-analysis operators over the `documents` table.

Training-data-pipeline primitives, each a single declarative plan (explode →
aggregate, or pure per-row expressions) so they run unchanged at 100 TB:

- **langid**: n-gram/stopword-profile scorer — per-language marker-token
  counts, argmax with deterministic tie-break. (The test corpus is synthetic
  single-vocabulary text, so accuracy against the `lang` column is not the
  point — the oracle verifies the scoring pipeline.)
- **quality**: per-document heuristics (length, mean word length, stopword
  ratio, type-token ratio) + a composite keep/drop flag. Ratios are
  int/int → double, so cross-engine exact.
- **tokens**: whitespace token count, distinct count, and a BPE-ish subword
  estimate (Σ ceil(len(word)/4)) — all per-row expressions.
- **fingerprint**: Karp-Rabin rolling hash over word hashes (sequential fold,
  modulus 1e9+7 keeps every intermediate < 2^35 so no overflow divergence)
  plus the document's min shingle hash (winnowing anchor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.operators._xengine import (
    REPARTITION_WIDTH as _RP,
    hash_int,
    shingles,
    words,
)
from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "los", "que"],
    "fr": ["le", "la", "les", "des", "et"],
    "zh": ["de", "shi", "le", "zai", "wo"],
}
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def _register(name: str, spark_sql: str, duck_sql: str) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql


def _in_list(vals: list[str]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


# ---------------------------------------------------------------------------
# language ID by stopword-profile scoring
# ---------------------------------------------------------------------------
def _langid_sql(spark: bool) -> str:
    if spark:
        tok = ("SELECT doc_id, lang, token FROM documents "
               "LATERAL VIEW explode(split(text, ' ')) t AS token")
    else:
        tok = ("SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token "
               "FROM documents")
    scores = ", ".join(
        f"SUM(CASE WHEN token IN {_in_list(toks)} THEN 1 ELSE 0 END) AS score_{lang}"
        for lang, toks in PROFILES.items()
    )
    unpivot = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, lang, '{lang2}' AS cand, score_{lang2} AS score FROM scores"
        for lang2 in PROFILES
    )
    return f"""
    WITH tok AS ({tok}),
    scores AS (SELECT doc_id, lang, {scores} FROM tok GROUP BY doc_id, lang),
    unp AS (
{unpivot}
    ),
    best AS (
      SELECT doc_id, lang, cand, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand) AS rk
      FROM unp
    )
    SELECT doc_id, cand AS pred_lang, lang AS true_lang,
           CASE WHEN cand = lang THEN 1 ELSE 0 END AS is_correct
    FROM best WHERE rk = 1
    ORDER BY doc_id
    """


_register("text_langid", _langid_sql(True), _langid_sql(False))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------
def _quality_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    size = "size" if spark else "len"
    distinct = "array_distinct" if spark else "list_distinct"
    if spark:
        stop_cnt = f"size(filter(w, t -> t IN {_in_list(EN_STOPWORDS)}))"
        word_chars = "aggregate(w, 0, (acc, t) -> acc + length(t))"
    else:
        stop_cnt = f"len(list_filter(w, t -> t IN {_in_list(EN_STOPWORDS)}))"
        word_chars = "list_sum(list_transform(w, t -> length(t)))"
    return f"""
    WITH d AS (SELECT doc_id, n_chars, {w} AS w FROM documents)
    SELECT doc_id,
           CAST({size}(w) AS BIGINT) AS n_words,
           CAST({word_chars} AS DOUBLE) / {size}(w) AS mean_word_len,
           CAST({stop_cnt} AS DOUBLE) / {size}(w) AS stopword_ratio,
           CAST({size}({distinct}(w)) AS DOUBLE) / {size}(w) AS type_token_ratio,
           CASE WHEN {size}(w) >= 10
                 AND CAST({size}({distinct}(w)) AS DOUBLE) / {size}(w) >= 0.3
                 AND CAST({stop_cnt} AS DOUBLE) / {size}(w) <= 0.5
                THEN 1 ELSE 0 END AS keep_flag
    FROM d
    ORDER BY doc_id
    """


_register("text_quality", _quality_sql(True), _quality_sql(False))


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish subword estimate)
# ---------------------------------------------------------------------------
def _tokens_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    size = "size" if spark else "len"
    distinct = "array_distinct" if spark else "list_distinct"
    if spark:
        subword = "aggregate(w, 0, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS INT))"
    else:
        subword = "CAST(list_sum(list_transform(w, t -> CAST(ceil(length(t) / 4.0) AS INT))) AS INT)"
    return f"""
    WITH d AS (SELECT doc_id, {w} AS w FROM documents)
    SELECT doc_id,
           CAST({size}(w) AS BIGINT) AS n_tokens,
           CAST({size}({distinct}(w)) AS BIGINT) AS n_distinct_tokens,
           {subword} AS n_subword_est
    FROM d
    ORDER BY doc_id
    """


_register("text_tokens", _tokens_sql(True), _tokens_sql(False))


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash + min shingle hash)
# ---------------------------------------------------------------------------
def _fingerprint_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    sh = shingles("w", 3, spark=spark)
    h = hash_int("t", spark=spark, salt="fp")
    hs = hash_int("s", spark=spark, salt="wn")
    if spark:
        rolling = (
            f"aggregate(w, CAST(0 AS BIGINT), "
            f"(acc, t) -> (acc * 31 + {h}) % 1000000007)"
        )
        min_sh = f"array_min(transform({sh}, s -> {hs}))"
    else:
        rolling = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(w, t -> {h})), "
            f"(acc, hv) -> (acc * 31 + hv) % 1000000007)"
        )
        min_sh = f"list_min(list_transform({sh}, s -> {hs}))"
    hint = f"/*+ REPARTITION({_RP}) */ " if spark else ""
    return f"""
    SELECT doc_id, {rolling} AS rolling_fp, {min_sh} AS min_shingle_hash
    FROM (SELECT {hint}doc_id, {w} AS w FROM documents)
    ORDER BY doc_id
    """


_register("text_fingerprint", _fingerprint_sql(True), _fingerprint_sql(False))


# ---------------------------------------------------------------------------
# PII detection + redaction (emails / phone numbers / IPv4)
# ---------------------------------------------------------------------------
def _rx(pat: str, spark: bool) -> str:
    """Regex literal per engine: Spark treats backslash as an escape inside
    string literals (escapedStringLiterals off), DuckDB/pg does not."""
    return pat.replace("\\", "\\\\") if spark else pat


def _pii_sql(spark: bool) -> str:
    """Detect and redact PII. The synthetic corpus contains none, so each doc
    is first augmented with deterministic fake PII derived from its key —
    making the regex pipeline's true-positive path observable to the oracle.
    Per-row expressions only: no shuffle, runs at any scale."""
    email = _rx(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", spark)
    ip = _rx(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", spark)
    phone = _rx(r"\b\d{3}-\d{4}\b", spark)
    extract = "regexp_extract_all"
    size = "size" if spark else "len"
    aug = (
        "concat(text, ' contact user', CAST(doc_id AS STRING), '@mail-', lang, "
        "'.example.com or admin@test.org call 555-', "
        "lpad(CAST(doc_id AS STRING), 4, '0'), "
        "' from 10.0.', CAST(doc_id % 256 AS STRING), '.', "
        "CAST((doc_id * 7) % 256 AS STRING))"
    )
    if not spark:
        aug = aug.replace("AS STRING", "AS VARCHAR")
    # Spark regexp_replace is replace-all; DuckDB needs the pg 'g' flag.
    redact = "aug"
    for pat, tag in ((email, "<EMAIL>"), (ip, "<IP>"), (phone, "<PHONE>")):
        redact = (f"regexp_replace({redact}, '{pat}', '{tag}')" if spark
                  else f"regexp_replace({redact}, '{pat}', '{tag}', 'g')")
    return f"""
    WITH d AS (SELECT doc_id, {aug} AS aug FROM documents)
    SELECT doc_id,
           CAST({size}({extract}(aug, '{email}', 0)) AS BIGINT) AS n_emails,
           CAST({size}({extract}(aug, '{phone}', 0)) AS BIGINT) AS n_phones,
           CAST({size}({extract}(aug, '{ip}', 0)) AS BIGINT) AS n_ips,
           md5({redact}) AS redacted_hash
    FROM d
    ORDER BY doc_id
    """


_register("text_pii_redact", _pii_sql(True), _pii_sql(False))


# ---------------------------------------------------------------------------
# TF-IDF: most distinctive term per document
# ---------------------------------------------------------------------------
def _tfidf_sql(spark: bool) -> str:
    """Classic TF-IDF over whitespace tokens; winner per doc ranked by the
    integer keys (tf DESC, df ASC, term) so the result is deterministic even
    where the float score ties; the reported score is ROUND(tf·ln(N/df), 10)
    (both engines' ln agree well past 10 decimals — rounding removes any
    last-ulp libm divergence). Shape at scale: explode → two
    map-side-combinable counts (one shuffle each) → broadcast of the scalar N
    → per-doc window on the tf table, partitioned by doc_id.
    """
    if spark:
        tok = ("SELECT doc_id, token FROM documents "
               "LATERAL VIEW explode(split(text, ' ')) t AS token")
    else:
        tok = "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
    return f"""
    WITH tok AS ({tok}),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY token
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROUND(tf.tf * ln(n.n_docs / df.df), 10) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rk
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token AS top_term, tf, df, tfidf
    FROM scored WHERE rk = 1
    ORDER BY doc_id
    """


_register("text_tfidf_top_term", _tfidf_sql(True), _tfidf_sql(False))


# ---------------------------------------------------------------------------
# readability proxy: word/char structure ratios (Flesch-style inputs)
# ---------------------------------------------------------------------------
def _readability_sql(spark: bool) -> str:
    """Structural readability signals per doc: mean word length and long-word
    ratio — the integer-exact inputs a Flesch-style readability filter needs
    (true syllable counts need a dictionary; mean word length is the standard
    corpus-scale proxy). Per-row array math, no shuffle; every ratio is one
    INT/INT division so both engines agree bit-for-bit."""
    w = words("text", spark=spark)
    size = "size" if spark else "len"
    if spark:
        charsum = "aggregate(transform(w, x -> length(x)), 0, (a, b) -> a + b)"
        longs = "size(filter(w, x -> length(x) >= 7))"
    else:
        charsum = "list_sum(list_transform(w, x -> length(x)))"
        longs = "len(list_filter(w, x -> length(x) >= 7))"
    return f"""
    SELECT doc_id,
           CAST({size}(w) AS BIGINT) AS n_words,
           CAST({charsum} AS BIGINT) AS n_word_chars,
           CAST({charsum} AS DOUBLE) / {size}(w) AS mean_word_len,
           CAST({longs} AS DOUBLE) / {size}(w) AS long_word_ratio
    FROM (SELECT doc_id, {w} AS w FROM documents)
    ORDER BY doc_id
    """


_register("text_readability", _readability_sql(True), _readability_sql(False))

# ---------------------------------------------------------------------------
# BM25 retrieval scoring: rank the corpus against a fixed keyword query.
# The retrieval primitive behind corpus search / targeted-subset mining
# ("pull the top docs about X for curation"). One scan computes per-doc
# (dl, tf_i); a 1-row corpus aggregate yields (N, Σdl, df_i); idf is
# quantized to integer micro-nats (same rule as unigram_logprob_score —
# ln() is correctly-rounded libm in both engines, and FLOOR(·1e6) pins the
# value to an exact BIGINT) so the per-doc score is a fixed-order sum of
# three deterministic double terms. Top-k via ORDER BY … LIMIT plans as
# TakeOrderedAndProject (per-partition top-k + k-row driver merge) — at
# 100 TB this is one scan + a broadcast 1-row stats join, never a sort.
# ---------------------------------------------------------------------------
BM25_QUERY = ["spark", "merge", "window"]
BM25_K1 = "CAST(1.2 AS DOUBLE)"
BM25_B = "CAST(0.75 AS DOUBLE)"
BM25_TOP = 25


def _bm25_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    size = "size" if spark else "len"
    flt = "filter" if spark else "list_filter"
    tfs = ", ".join(
        f"CAST({size}({flt}(w, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_QUERY))
    )
    idfs = ", ".join(
        f"CAST(floor(ln(CAST(1.0 AS DOUBLE) + (n - df{i} + CAST(0.5 AS DOUBLE)) / "
        f"(df{i} + CAST(0.5 AS DOUBLE))) * 1000000) AS BIGINT) AS idf{i}"
        for i in range(len(BM25_QUERY))
    )
    # fixed left-to-right term order => identical IEEE754 rounding both engines
    score = " + ".join(
        f"(i.idf{i} / CAST(1000000 AS DOUBLE)) * "
        f"((d.tf{i} * ({BM25_K1} + CAST(1.0 AS DOUBLE))) / "
        f"(d.tf{i} + {BM25_K1} * (CAST(1.0 AS DOUBLE) - {BM25_B} + "
        f"{BM25_B} * (d.dl / i.avgdl))))"
        for i in range(len(BM25_QUERY))
    )
    tf_out = ", ".join(f"d.tf{i}" for i in range(len(BM25_QUERY)))
    return f"""
    WITH perdoc AS (
      SELECT doc_id, CAST({size}(w) AS BIGINT) AS dl, {tfs}
      FROM (SELECT doc_id, {w} AS w FROM documents)
    ),
    stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sumdl, {dfs} FROM perdoc
    ),
    idf AS (
      SELECT n, CAST(sumdl AS DOUBLE) / n AS avgdl, {idfs} FROM stats
    )
    SELECT d.doc_id, d.dl, {tf_out},
           CAST({score} AS DOUBLE) AS bm25
    FROM perdoc d CROSS JOIN idf i
    ORDER BY bm25 DESC, d.doc_id
    LIMIT {BM25_TOP}
    """


_register("text_bm25_topk", _bm25_sql(True), _bm25_sql(False))


# ---------------------------------------------------------------------------
# token-distribution entropy: repetition/diversity score per document
# ---------------------------------------------------------------------------
ENT_SCALE = 1_000_000  # micro-nat quantization (the unigram-LM trick)


def _entropy_sql(spark: bool) -> str:
    """Shannon entropy of each document's token distribution — the
    complementary fluency signal to `repetition_filter` (hard thresholds)
    and `unigram_logprob_score` (corpus-relative surprisal): low entropy =
    the document repeats few distinct tokens (keyword stuffing, templated
    spam), high entropy relative to length = natural prose.

    H = ln(L) − Σ c·ln(c) / L over per-doc token counts c. Determinism: BOTH
    terms are quantized to integer micro-nats (FLOOR of x·1e6 — ln itself is
    correctly-rounded libm on both engines, pinned by the oracle gate; raw
    double output drifted 1-2 ulp between engines through the closing
    arithmetic), summed/divided as exact integers (truncating integer
    division), so the reported entropy is a BIGINT micro-nat value that is
    bit-identical everywhere. One shuffle on (doc_id, token); map-side
    combinable — the same plan as any word count.
    """
    w = words("text", spark=spark)
    if spark:
        toks = (f"SELECT doc_id, w FROM (SELECT doc_id, {w} AS ws FROM documents) "
                f"LATERAL VIEW explode(ws) t AS w")
    else:
        toks = f"SELECT doc_id, unnest({w}) AS w FROM documents"
    return f"""
    WITH toks AS ({toks}),
    wc AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, w
    ),
    per AS (
      SELECT doc_id,
             SUM(c) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             SUM(CAST(FLOOR(c * LN(CAST(c AS DOUBLE)) * {ENT_SCALE}) AS BIGINT))
               AS s_micro
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           n_distinct,
           CAST(FLOOR(LN(CAST(n_tokens AS DOUBLE)) * {ENT_SCALE}) AS BIGINT)
             - CAST(s_micro {"DIV" if spark else "//"} n_tokens AS BIGINT)
             AS entropy_micro
    FROM per
    ORDER BY doc_id
    """


_register("text_token_entropy", _entropy_sql(True), _entropy_sql(False))


# ---------------------------------------------------------------------------
# novelty ratio: how much of each doc is first-seen content?
# ---------------------------------------------------------------------------
def _novelty_sql(spark: bool) -> str:
    """Fraction of a doc's distinct 3-shingles whose first corpus occurrence
    (lowest doc_id) is the doc itself — the marginal-contribution signal a
    curation pass uses to drop docs that add nothing beyond earlier
    documents (novelty ~ 0) without requiring them to be exact or near
    duplicates of any single doc. Plan: explode distinct shingles, one
    shuffle on shingle for MIN(doc_id), join back on the same key (co-
    partitioned after the aggregation), one per-doc regroup. novelty is an
    exact small-int division -> bit-identical across engines."""
    w = words("text", spark=spark)
    sh = shingles("w", 3, spark=spark)
    distinct = "array_distinct" if spark else "list_distinct"
    if spark:
        # OUTER explode + repartitioned source: suppresses the inferred
        # size(sh)>0 filter that re-runs the shingle pipeline at single-file
        # scan parallelism (see dedup._minhash_sql for the measured
        # pathology); sh is structurally non-empty/non-null, so OUTER is
        # row-identical.
        ex = ("SELECT doc_id, s AS shingle FROM docs "
              "LATERAL VIEW OUTER explode(sh) t AS s")
        hint = f"/*+ REPARTITION({_RP}) */ "
    else:
        ex = "SELECT doc_id, unnest(sh) AS shingle FROM docs"
        hint = ""
    return f"""
    WITH docs AS (
      SELECT doc_id, {distinct}({sh}) AS sh
      FROM (SELECT {hint}doc_id, {w} AS w FROM documents)
    ),
    ex AS ({ex}),
    first AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM ex GROUP BY shingle
    )
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS novelty
    FROM ex e JOIN first f ON f.shingle = e.shingle
    GROUP BY e.doc_id
    ORDER BY e.doc_id
    """


_register("text_novelty_ratio", _novelty_sql(True), _novelty_sql(False))


# ---------------------------------------------------------------------------
# trained quality classifier: naive Bayes log-odds over word counts (r6)
# ---------------------------------------------------------------------------
# The CCNet/DCLM-style quality gate: train a word-level classifier on a
# TRUSTED subset vs an UNTRUSTED subset, then score the whole corpus with
# smoothed log-odds — the trained counterpart of the heuristic `text_quality`
# battery (CCNet trains fastText wiki-vs-crawl; a unigram naive Bayes is the
# same decision rule with independence assumptions made explicit). Splits
# here are source-based (src0-4 = trusted, src15-19 = untrusted), mirroring
# how real pipelines label by provenance.
#
# Determinism: every ln() input is an exact integer (add-1 smoothed count,
# class totals + vocabulary size), so ln is correctly-rounded libm on an
# identical double in both engines; each term is quantized to integer
# micro-nats (FLOOR * 1e6, the same rule as unigram_logprob_score / BM25)
# and per-document scores are INTEGER sums of those — bit-identical
# regardless of fold order. OOV words take the smoothing-only odds.
#
# Scale shape: token explode is map-only; per-class word counts are one
# map-side-combinable shuffle on the word; the odds table is vocab-sized
# (broadcastable); scoring is a broadcast join + one integer-sum shuffle on
# doc_id. No driver materialization anywhere.
NB_POS_SOURCES = ["src0", "src1", "src2", "src3", "src4"]
NB_NEG_SOURCES = ["src15", "src16", "src17", "src18", "src19"]


def _nb_classifier_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    if spark:
        toks = (f"SELECT doc_id, source, w FROM "
                f"(SELECT doc_id, source, {w} AS ws FROM documents) "
                f"LATERAL VIEW explode(ws) t AS w")
    else:
        toks = (f"SELECT doc_id, source, unnest({w}) AS w "
                f"FROM documents")
    unat = lambda x: f"CAST(FLOOR(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"  # noqa: E731
    pos = _in_list(NB_POS_SOURCES)
    neg = _in_list(NB_NEG_SOURCES)
    return f"""
    WITH toks AS ({toks}),
    counts AS (
      SELECT w,
             CAST(SUM(CASE WHEN source IN {pos} THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
             CAST(SUM(CASE WHEN source IN {neg} THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
      FROM toks WHERE source IN {pos} OR source IN {neg}
      GROUP BY w
    ),
    stats AS (
      SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
             CAST(SUM(c_neg) AS BIGINT) AS n_neg,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM counts
    ),
    odds AS (
      SELECT w,
             {unat("c.c_pos + 1")} - {unat("s.n_pos + s.v")}
           - {unat("c.c_neg + 1")} + {unat("s.n_neg + s.v")} AS q
      FROM counts c CROSS JOIN stats s
    ),
    oov AS (
      SELECT {unat("s.n_neg + s.v")} - {unat("s.n_pos + s.v")} AS q_oov
      FROM stats s
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           CAST(SUM(COALESCE(o.q, ov.q_oov)) AS BIGINT) AS score_unats,
           CASE WHEN CAST(SUM(COALESCE(o.q, ov.q_oov)) AS BIGINT) > 0
                THEN 1 ELSE 0 END AS pred_trusted
    FROM toks t
    LEFT JOIN odds o ON o.w = t.w
    CROSS JOIN oov ov
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """


_register("text_nb_quality_classifier",
          _nb_classifier_sql(True), _nb_classifier_sql(False))


# ---------------------------------------------------------------------------
# interpolated bigram LM fluency score (r6)
# ---------------------------------------------------------------------------
# The KenLM-style fluency signal: score every document by the corpus bigram
# model with unigram interpolation, P(w2|w1) ~ 0.75*c12/c1 + 0.25*c2/N.
# The interpolated probability is kept as ONE exact rational —
#     (3*c12*N + c2*c1) / (4*c1*N)
# — so each bigram's log-probability is ln(num) - ln(den) on exact integer
# inputs, quantized to micro-nats and summed as integers per document:
# bit-identical in any engine and fold order (same discipline as
# unigram_logprob_score; the naive float interpolation inside ln would
# diverge in the last ulp between engines). c1 counts w1 as a CONTEXT
# (bigram predecessors), c2 is the plain unigram count, N total tokens.
# Shape: shingle explode -> two map-side-combinable count shuffles (bigram,
# unigram) -> model join (vocab-sized, broadcastable) -> integer sum per
# doc. BIGINT->DOUBLE conversion before ln is IEEE round-to-nearest in both
# engines, so determinism survives counts past 2^53.
def _bigram_lm_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    sh = shingles("w", 2, spark=spark)
    unat = lambda x: f"CAST(FLOOR(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"  # noqa: E731
    if spark:
        toks = (f"SELECT doc_id, w FROM "
                f"(SELECT /*+ REPARTITION({_RP}) */ doc_id, {w} AS ws FROM documents) "
                f"LATERAL VIEW explode(ws) t AS w")
    else:
        toks = f"SELECT doc_id, unnest({w}) AS w FROM documents"
    # shingles() operates on a column named w holding the word array
    if spark:
        # OUTER explode (shs structurally non-empty under size(w) >= 2) +
        # repartitioned source — see dedup._minhash_sql for the pathology.
        bgs = (f"SELECT doc_id, s FROM (SELECT doc_id, {sh} AS shs FROM "
               f"(SELECT /*+ REPARTITION({_RP}) */ doc_id, {w} AS w FROM documents) "
               f"WHERE size(w) >= 2) "
               f"LATERAL VIEW OUTER explode(shs) t AS s")
    else:
        bgs = (f"SELECT doc_id, unnest({sh}) AS s FROM "
               f"(SELECT doc_id, {w} AS w FROM documents) WHERE len(w) >= 2")
    return f"""
    WITH toks AS ({toks}),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c2 FROM toks GROUP BY w
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
    bg AS ({bgs}),
    bgc AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY s
    ),
    ctx AS (
      SELECT split_part(s, ' ', 1) AS w1, CAST(SUM(c12) AS BIGINT) AS c1
      FROM bgc GROUP BY split_part(s, ' ', 1)
    ),
    model AS (
      SELECT b.s,
             {unat("3 * b.c12 * t.n + u.c2 * c.c1")}
           - {unat("4 * c.c1 * t.n")} AS q
      FROM bgc b
      JOIN ctx c ON c.w1 = split_part(b.s, ' ', 1)
      JOIN uni u ON u.w = split_part(b.s, ' ', 2)
      CROSS JOIN tot t
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(m.q) AS BIGINT) AS logprob_unats,
           CAST(SUM(m.q) AS BIGINT) {"DIV" if spark else "//"} COUNT(*)
             AS mean_unats
    FROM bg g JOIN model m ON m.s = g.s
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """


_register("text_bigram_logprob", _bigram_lm_sql(True), _bigram_lm_sql(False))
