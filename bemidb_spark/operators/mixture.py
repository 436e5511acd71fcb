"""Dataset-assembly operators: split, mixture balancing, LM scoring,
boilerplate stripping, tokenizer-merge mining, and embedding outliers.

The reference engine has no dataset-assembly surface; these extend the
training-data-pipeline family (`operators/dedup.py`, `operators/curation.py`)
with the steps that turn a filtered corpus into an actual training mixture.
All are pure relational pipelines whose plan shape survives 100 TB:

- **split_train_valid_test**: deterministic md5-hash split — the assignment is
  a per-row expression (no shuffle, partition-invariant, stable under
  re-partitioning and engine choice), which is the property a reproducible
  train/held-out split actually needs. `df.sample()` would not give it.
- **mixture_resample_weights**: per-(source, lang) token shares → capped
  uniform-target resampling weights. One map-side-combinable aggregate over
  the corpus + a tiny weights table out; at scale the weights table is what a
  sampler broadcasts back onto the corpus.
- **unigram_logprob_score**: a corpus-trained unigram LM scores every doc
  (mean negative log-probability ≈ per-token surprisal, the cheap fluency /
  gibberish filter). Counts shuffle once on word; per-word ln() is quantized
  to integer micro-nats so the per-doc aggregation is an exact BIGINT sum —
  order-independent, hence bit-identical across engines (see the decimal-sum
  determinism rule in `_xengine`). ln() itself is correctly-rounded libm on
  both engines (asserted by the oracle gate on real corpus counts).
- **boilerplate_line_strip**: CCNet/RefinedWeb-style boilerplate removal —
  a segment occurring in ≥ BOILER_MIN_DOCS *distinct* docs is boilerplate
  everywhere (distinct from `dedup_paragraphs`, which keeps first
  occurrences). One shuffle on md5(segment) for the distinct-doc counts, one
  broadcast-size join back, one per-doc regroup.
- **bpe_merge_candidates**: the first BPE merge table — corpus-wide counts of
  adjacent character pairs inside words, top-20. Explode → count → global
  top-k; the final ORDER BY…LIMIT plans as TakeOrderedAndProject (per-
  partition top-k + k-row driver merge), never a single-partition sort.
- **embedding_centroid_outliers**: per-label exact centroids via fixed-point
  integer sums (FLOOR(x·2⁵⁰) of an exactly-scaled double — order-independent
  and engine-identical where decimal casts are not; see the half-way-case
  note in `_outlier_sql`), squared L2 of every vector to its label centroid
  via sequential folds, outlier = top OUTLIER_PCT of dist² within the label
  (a rank cut, because dist² concentrates around its mean in high dimension
  and fixed multiples of the mean flag nothing). The shape of an
  embedding-space quality filter: centroids broadcast, one scan, one
  per-label window.

Every entry has a DuckDB oracle producing bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.operators._xengine import (
    REPARTITION_WIDTH as _RP,
    dot_fold, hash_int, words,
)
from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

TRAIN_PCT = 80  # hash buckets 0-79 train, 80-89 valid, 90-99 test
VALID_PCT = 10
WEIGHT_CAP = 5.0
SEG_WORDS = 10
BOILER_MIN_DOCS = 3
BPE_TOP_K = 20
OUTLIER_PCT = 0.05
EMB_DIM = 64


def _register(name: str, spark_sql: str, duck_sql: str) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql


# ---------------------------------------------------------------------------
# deterministic train/valid/test split
# ---------------------------------------------------------------------------
def _split_sql(spark: bool) -> str:
    h = hash_int("CAST(doc_id AS STRING)" if spark else "CAST(doc_id AS VARCHAR)",
                 spark=spark, salt="split")
    ntok = ("size(split(text, ' '))" if spark else "len(string_split(text, ' '))")
    return f"""
    SELECT doc_id, lang,
           CAST({ntok} AS BIGINT) AS n_tokens,
           CASE WHEN {h} % 100 < {TRAIN_PCT} THEN 'train'
                WHEN {h} % 100 < {TRAIN_PCT + VALID_PCT} THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """


_register("split_train_valid_test", _split_sql(True), _split_sql(False))


# ---------------------------------------------------------------------------
# mixture balancing: capped uniform-target resampling weights
# ---------------------------------------------------------------------------
def _mixture_sql(spark: bool) -> str:
    ntok = ("size(split(text, ' '))" if spark else "len(string_split(text, ' '))")
    # weight = target_share / actual_share = tot / (n_groups * grp_tokens):
    # one division of exact integers -> the same double on both engines.
    return f"""
    WITH g AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({ntok}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT SUM(n_tokens) AS tot_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_groups FROM g)
    SELECT g.source, g.lang, g.n_docs, g.n_tokens,
           CAST(g.n_tokens AS DOUBLE) / t.tot_tokens AS actual_share,
           LEAST(CAST(t.tot_tokens AS DOUBLE) / (t.n_groups * g.n_tokens),
                 {WEIGHT_CAP}) AS weight,
           CAST(ROUND(LEAST(CAST(t.tot_tokens AS DOUBLE) / (t.n_groups * g.n_tokens),
                            {WEIGHT_CAP}) * g.n_tokens) AS BIGINT) AS resampled_tokens
    FROM g CROSS JOIN tot t
    ORDER BY g.source, g.lang
    """


_register("mixture_resample_weights", _mixture_sql(True), _mixture_sql(False))


# ---------------------------------------------------------------------------
# unigram LM surprisal score (integer micro-nat aggregation)
# ---------------------------------------------------------------------------
def _unigram_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    if spark:
        toks = (f"SELECT doc_id, w FROM (SELECT doc_id, {w} AS ws FROM documents) "
                f"LATERAL VIEW explode(ws) t AS w")
    else:
        toks = f"SELECT doc_id, unnest({w}) AS w FROM documents"
    # ln(count) in integer micro-nats: the per-doc SUM is over BIGINTs, so it
    # is order-independent (exact) on both engines; the only float steps are
    # one ln() per distinct count value and two final fixed-order divisions.
    return f"""
    WITH toks AS ({toks}),
    cnts AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w),
    tot AS (SELECT SUM(c) AS n_corpus FROM cnts),
    scored AS (
      SELECT t.doc_id,
             CAST(ROUND(LN(CAST(c.c AS DOUBLE)) * 1000000) AS BIGINT) AS ln_c_micro
      FROM toks t JOIN cnts c ON t.w = c.w
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           LN(CAST(t.n_corpus AS DOUBLE))
             - CAST(SUM(s.ln_c_micro) AS DOUBLE) / COUNT(*) / 1000000.0
             AS avg_neg_logprob
    FROM scored s CROSS JOIN tot t
    GROUP BY s.doc_id, t.n_corpus
    ORDER BY s.doc_id
    """


_register("unigram_logprob_score", _unigram_sql(True), _unigram_sql(False))


# ---------------------------------------------------------------------------
# boilerplate stripping: segments common to many distinct docs removed
# ---------------------------------------------------------------------------
def _boiler_sql(spark: bool) -> str:
    n = SEG_WORDS
    w = words("text", spark=spark)
    if spark:
        segs = (
            f"transform(sequence(0, CAST(ceil(size(w) / {n}.0) AS INT) - 1), "
            f"i -> struct(i AS idx, array_join(slice(w, i * {n} + 1, {n}), ' ') AS seg))"
        )
        explode = (
            f"SELECT doc_id, s.idx AS idx, s.seg AS seg FROM "
            f"(SELECT doc_id, {segs} AS ss FROM (SELECT doc_id, {w} AS w FROM documents)) "
            f"LATERAL VIEW explode(ss) t AS s"
        )
        rebuild = (
            "array_join(transform(array_sort(collect_list("
            "CASE WHEN nd < " + str(BOILER_MIN_DOCS) + " THEN struct(idx, seg) END)), "
            "s -> s.seg), ' ')"
        )
    else:
        segs = (
            f"[{{'idx': i - 1, 'seg': array_to_string(w[(i - 1) * {n} + 1:(i - 1) * {n} + {n}], ' ')}} "
            f"for i in generate_series(1, CAST(ceil(len(w) / {n}.0) AS INT))]"
        )
        explode = (
            f"SELECT doc_id, s['idx'] AS idx, s['seg'] AS seg FROM "
            f"(SELECT doc_id, unnest({segs}) AS s FROM (SELECT doc_id, {w} AS w FROM documents))"
        )
        rebuild = (
            f"string_agg(seg, ' ' ORDER BY idx) FILTER (WHERE nd < {BOILER_MIN_DOCS})"
        )
    return f"""
    WITH segs AS ({explode}),
    seg_docs AS (
      SELECT md5(seg) AS h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
      FROM segs GROUP BY md5(seg)
    ),
    marked AS (
      SELECT s.doc_id, s.idx, s.seg, d.nd
      FROM segs s JOIN seg_docs d ON md5(s.seg) = d.h
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN nd >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           CAST(SUM(CASE WHEN nd < {BOILER_MIN_DOCS} THEN LENGTH(seg) ELSE 0 END) AS BIGINT)
             AS kept_chars,
           md5(coalesce({rebuild}, '')) AS stripped_text_hash
    FROM marked
    GROUP BY doc_id
    ORDER BY doc_id
    """


_register("boilerplate_line_strip", _boiler_sql(True), _boiler_sql(False))


# ---------------------------------------------------------------------------
# tokenizer induction: top adjacent character-pair merge candidates
# ---------------------------------------------------------------------------
def _bpe_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    if spark:
        word_rows = (f"SELECT word FROM (SELECT {w} AS ws FROM documents) "
                     f"LATERAL VIEW explode(ws) t AS word")
        pair_rows = (
            "SELECT pair FROM (SELECT transform(sequence(1, length(word) - 1), "
            "i -> substring(word, i, 2)) AS ps FROM words_t WHERE length(word) >= 2) "
            "LATERAL VIEW explode(ps) t AS pair"
        )
    else:
        word_rows = f"SELECT unnest({w}) AS word FROM documents"
        pair_rows = (
            "SELECT unnest([substr(word, i, 2) for i in generate_series(1, length(word) - 1)]) AS pair "
            "FROM words_t WHERE length(word) >= 2"
        )
    return f"""
    WITH words_t AS ({word_rows}),
    pairs AS ({pair_rows})
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {BPE_TOP_K}
    """


_register("bpe_merge_candidates", _bpe_sql(True), _bpe_sql(False))


# ---------------------------------------------------------------------------
# embedding-space outliers vs per-label decimal-exact centroid
# ---------------------------------------------------------------------------
def _outlier_sql(spark: bool) -> str:
    # Exact fixed-point mean: FLOOR(x · 2⁵⁰) is computed on an EXACT double
    # (power-of-two scaling never rounds), so each term is the identical
    # BIGINT on both engines and the SUM is order-independent integer math.
    # Decimal-cast means are NOT safe here: a float32 whose binary expansion
    # terminates exactly one digit past the decimal scale is a half-way case,
    # and Spark (HALF_UP) vs DuckDB (HALF_EVEN) round it apart — observed on
    # real data at DECIMAL(20,10).
    two50 = "1125899906842624.0"  # 2^50; |x|≲4 → terms ≤2^52, sums fit BIGINT

    def mean_comp(idx_expr: str) -> str:
        return (f"CAST(SUM(CAST(FLOOR(CAST({idx_expr} AS DOUBLE) * {two50}) AS BIGINT)) "
                f"AS DOUBLE) / {two50} / COUNT(*)")

    if spark:
        centroid = "array(" + ", ".join(
            mean_comp(f"embedding[{i}]") for i in range(EMB_DIM)) + ")"
    else:
        centroid = "[" + ", ".join(
            mean_comp(f"embedding[{i + 1}]") for i in range(EMB_DIM)) + "]"
    ee = dot_fold("v.embedding", "v.embedding", spark=spark)
    ec = dot_fold("v.embedding", "c.centroid", spark=spark)
    cc = dot_fold("c.centroid", "c.centroid", spark=spark)
    dist2 = f"({ee} - 2 * {ec} + {cc})"
    # Outlier = top OUTLIER_PCT by dist² within the label. A fixed multiple
    # of the mean is useless in high dimension (concentration of measure:
    # observed max/mean ≈ 1.1 at 64 dims), and a rank cut is pure integer
    # logic — deterministic on both engines, no float-threshold edge cases.
    return f"""
    WITH cents AS (
      SELECT label, {centroid} AS centroid FROM embeddings GROUP BY label
    ),
    dists AS (
      SELECT v.vec_id, v.label, {dist2} AS dist2
      FROM embeddings v JOIN cents c ON v.label = c.label
    ),
    ranked AS (
      SELECT vec_id, label, dist2,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dist2 DESC, vec_id) AS rk,
             COUNT(*) OVER (PARTITION BY label) AS n
      FROM dists
    )
    SELECT vec_id, label, dist2,
           CASE WHEN rk <= CAST(CEIL(n * {OUTLIER_PCT}) AS BIGINT)
                THEN 1 ELSE 0 END AS is_outlier
    FROM ranked
    ORDER BY vec_id
    """


_register("embedding_centroid_outliers", _outlier_sql(True), _outlier_sql(False))


# ---------------------------------------------------------------------------
# quality-threshold calibration against a token budget (histogram method)
# ---------------------------------------------------------------------------
BUDGET_FRAC = 0.4  # keep the best-quality ~40% of corpus tokens
N_QBINS = 100


def _budget_sql(spark: bool) -> str:
    """Find the quality cutoff that fills a token budget with the BEST docs.

    The scale-right shape: instead of globally sorting every doc by quality
    (a full-corpus sort), bucket quality into N_QBINS fixed-width bins, sum
    tokens per bin (one map-side-combinable aggregate), then cumulative-sum
    the tiny bin table from the top down. At 100 TB the bin table is 100 rows
    regardless of corpus size; the sort the naive version needs never
    happens. Quality = distinct-word ratio (one exact INT/INT division).
    """
    w = words("text", spark=spark)
    distinct = "array_distinct" if spark else "list_distinct"
    size = "size" if spark else "len"
    return f"""
    WITH scored AS (
      SELECT doc_id,
             CAST({size}(w) AS BIGINT) AS n_tokens,
             CAST({size}({distinct}(w)) AS DOUBLE) / {size}(w) AS q
      FROM (SELECT doc_id, {w} AS w FROM documents)
    ),
    binned AS (
      SELECT LEAST({N_QBINS - 1}, CAST(FLOOR(q * {N_QBINS}) AS INT)) AS qbin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
      FROM scored GROUP BY LEAST({N_QBINS - 1}, CAST(FLOOR(q * {N_QBINS}) AS INT))
    ),
    tot AS (SELECT SUM(bin_tokens) AS total_tokens FROM binned),
    cum AS (
      SELECT qbin, n_docs, bin_tokens,
             CAST(SUM(bin_tokens) OVER (ORDER BY qbin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM binned
    )
    SELECT c.qbin, c.n_docs, c.bin_tokens, c.cum_tokens,
           CASE WHEN c.cum_tokens <= {BUDGET_FRAC} * t.total_tokens
                THEN 1 ELSE 0 END AS in_budget
    FROM cum c CROSS JOIN tot t
    ORDER BY c.qbin DESC
    """


_register("quality_budget_threshold", _budget_sql(True), _budget_sql(False))


# ---------------------------------------------------------------------------
# export shard manifest: deterministic shard assignment for the final corpus
# ---------------------------------------------------------------------------
N_SHARDS = 16


def _shard_manifest_sql(spark: bool) -> str:
    """The materialization step: every doc lands in a deterministic hash
    shard (stable across engines, runs, and partitionings — the property a
    resumable multi-writer export needs), and the manifest row per shard
    carries counts, token totals, and an order-insensitive content checksum
    (XOR-free: sum of per-doc hash values mod 2^62 — exact integer math, so
    the checksum is reproducible no matter which executor wrote the shard).
    At 100 TB this IS the write plan: repartition by shard_id, one writer
    task per shard, manifest as the job's commit record."""
    h = hash_int("CAST(doc_id AS STRING)" if spark else "CAST(doc_id AS VARCHAR)",
                 spark=spark, salt="shard")
    hcontent = hash_int("text", spark=spark, salt="content")
    ntok = ("size(split(text, ' '))" if spark else "len(string_split(text, ' '))")
    return f"""
    WITH assigned AS (
      SELECT doc_id,
             {h} % {N_SHARDS} AS shard_id,
             CAST({ntok} AS BIGINT) AS n_tokens,
             {hcontent} AS content_hash
      FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           CAST(SUM(content_hash) % 4611686018427387904 AS BIGINT) AS content_checksum,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM assigned
    GROUP BY shard_id
    ORDER BY shard_id
    """


_register("export_shard_manifest", _shard_manifest_sql(True), _shard_manifest_sql(False))


# ---------------------------------------------------------------------------
# deterministic training shuffle: global order without a global sort
# ---------------------------------------------------------------------------
SHUF_SHARDS = 64


def _shuffle_assign_sql(spark: bool) -> str:
    """Epoch-shuffle materialization: every doc gets a (shard, pos) training
    order derived ONLY from md5(doc_id, salt) — reproducible across engines,
    runs, cluster sizes, and input partitionings, which is what makes a
    training run resumable and an ablation re-creatable. The global
    permutation is (shard asc, pos asc): hash buckets the docs into shards,
    the within-shard rank orders by the full hash. No global sort anywhere —
    one shuffle on shard_id, then a per-shard window; shards are sized to the
    training-file unit (~1-4 GB each at 100 TB, the same granularity the
    export writer uses), so each window partition is one output file's worth.
    Changing the salt re-deals the whole permutation (a new epoch)."""
    h = hash_int("CAST(doc_id AS STRING)" if spark else "CAST(doc_id AS VARCHAR)",
                 spark=spark, salt="epoch0")
    return f"""
    WITH keyed AS (
      SELECT doc_id, {h} AS k FROM documents
    )
    SELECT doc_id,
           CAST(k % {SHUF_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY k % {SHUF_SHARDS}
                                   ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM keyed
    ORDER BY shard, pos
    """


_register("shuffle_shard_assign", _shuffle_assign_sql(True), _shuffle_assign_sql(False))


# ---------------------------------------------------------------------------
# cross-source overlap matrix: provenance duplicate accounting
# ---------------------------------------------------------------------------
def _source_overlap_sql(spark: bool) -> str:
    """How much content do the corpus' sources share? Distinct 10-word
    segments that appear in more than one source, counted per
    (source_a, source_b) pair — the provenance matrix behind 'which crawls
    re-collected the same pages' (segment-level, so partial re-collection
    counts too). One shuffle on md5(segment); the pair expansion happens
    only on segments spanning >1 source (a small fraction of the corpus)."""
    n = SEG_WORDS
    w = words("text", spark=spark)
    if spark:
        segs = (f"transform(sequence(0, CAST(ceil(size(w) / {n}.0) AS INT) - 1), "
                f"i -> array_join(slice(w, i * {n} + 1, {n}), ' '))")
        expl = (f"SELECT DISTINCT source, md5(s) AS h FROM "
                f"(SELECT source, {segs} AS ss FROM (SELECT source, {w} AS w FROM documents)) "
                f"LATERAL VIEW explode(ss) t AS s")
    else:
        segs = (f"[array_to_string(w[(i - 1) * {n} + 1:(i - 1) * {n} + {n}], ' ') "
                f"for i in generate_series(1, CAST(ceil(len(w) / {n}.0) AS INT))]")
        expl = (f"SELECT DISTINCT source, md5(unnest({segs})) AS h "
                f"FROM (SELECT source, {w} AS w FROM documents)")
    return f"""
    WITH hashed AS ({expl}),
    pairs AS (
      SELECT a.h, a.source AS source_a, b.source AS source_b
      FROM hashed a JOIN hashed b ON a.h = b.h AND a.source < b.source
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS shared_segments
    FROM pairs
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """


_register("source_overlap_matrix", _source_overlap_sql(True), _source_overlap_sql(False))


# ---------------------------------------------------------------------------
# vocabulary coverage: fraction of a doc's tokens inside the corpus top-K
# ---------------------------------------------------------------------------
VOCAB_K = 1000


def _vocab_coverage_sql(spark: bool) -> str:
    """Closed-vocabulary coverage per doc — the filter catching docs full of
    rare junk/OOV tokens (complements `unigram_logprob_score`: coverage is a
    hard membership test, surprisal a soft average). The vocab is the corpus
    top-K by frequency (deterministic tie-break on the word), built with
    ORDER BY…LIMIT (TakeOrderedAndProject: per-partition top-K, K-row driver
    merge — no global sort); the scoring join broadcasts the K-row vocab.
    Integer counts + one division keep both engines bit-identical."""
    w = words("text", spark=spark)
    if spark:
        toks = (f"SELECT doc_id, w FROM (SELECT doc_id, {w} AS ws FROM documents) "
                f"LATERAL VIEW explode(ws) t AS w")
    else:
        toks = f"SELECT doc_id, unnest({w}) AS w FROM documents"
    return f"""
    WITH toks AS ({toks}),
    vocab AS (
      SELECT w FROM (
        SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w
        ORDER BY cnt DESC, w LIMIT {VOCAB_K}
      ) v
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(v.w) AS BIGINT) AS n_in_vocab,
           CAST(COUNT(v.w) AS DOUBLE) / COUNT(*) AS coverage
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """


_register("vocab_coverage_score", _vocab_coverage_sql(True), _vocab_coverage_sql(False))


# ---------------------------------------------------------------------------
# temperature-scaled mixture sampling (multilingual-LM style, T = 0.5)
# ---------------------------------------------------------------------------
TEMP_FP_SCALE = 140737488355328  # 2^47: fixed-point scale for the normalizer


def _temperature_sql(spark: bool) -> str:
    """Temperature sampling weights per (source, lang): p_i ∝ share_i^T with
    T = 1/2 — the standard way multilingual/multi-source LM training upsamples
    low-resource groups without letting any group dominate (T=1 keeps natural
    proportions, T→0 goes uniform; sqrt is the common middle ground).
    Complements `mixture_resample_weights` (capped uniform target): this one
    is a smooth power-law reweighting, that one a hard cap.

    Determinism across engines: share_i is one exact integer division;
    share^0.5 is SQRT — the only *IEEE-exact* power, which is why T = 1/2 is
    implemented with SQRT and not POWER (libm pow is not correctly rounded on
    either engine). The normalizer Σ sqrt(share) would be an order-dependent
    float sum, so each sqrt is fixed-point quantized (×2^47, ~15 significant
    digits — beyond double's ulp at these magnitudes) and summed as exact
    BIGINTs. One aggregate over the corpus, a groups-count-sized table out —
    at 100 TB the weights broadcast back onto the corpus like any sampler
    table."""
    ntok = ("size(split(text, ' '))" if spark else "len(string_split(text, ' '))")
    share = "CAST(g.n_tokens AS DOUBLE) / t.tot_tokens"
    return f"""
    WITH g AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({ntok}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT SUM(n_tokens) AS tot_tokens FROM g),
    scaled AS (
      SELECT g.source, g.lang, g.n_docs, g.n_tokens,
             {share} AS actual_share,
             CAST(FLOOR(SQRT({share}) * {TEMP_FP_SCALE}) AS BIGINT) AS s_fp
      FROM g CROSS JOIN tot t
    ),
    norm AS (SELECT SUM(s_fp) AS sum_fp FROM scaled)
    SELECT s.source, s.lang, s.n_docs, s.n_tokens, s.actual_share,
           CAST(s.s_fp AS DOUBLE) / n.sum_fp AS temp_share,
           (CAST(s.s_fp AS DOUBLE) / n.sum_fp) / s.actual_share AS sampling_factor
    FROM scaled s CROSS JOIN norm n
    ORDER BY s.source, s.lang
    """


_register("mixture_temperature_weights", _temperature_sql(True), _temperature_sql(False))


# ---------------------------------------------------------------------------
# sequence-length histogram: power-of-2 buckets + padding-waste accounting
# ---------------------------------------------------------------------------
LEN_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048]


def _len_buckets_sql(spark: bool) -> str:
    """Token-length distribution in power-of-2 buckets, with the padding
    waste a padded-batch loader would pay per bucket (bucket_size − n_tokens
    summed) — the diagnostic that decides between padding and packing and
    sizes `pack_sequences_budget`'s budget. The bucket assignment is an
    integer CASE cascade (no log2: float log of an exact power boundary is
    an ulp hazard across engines); one map-side-combinable aggregate, an
    8-row table out."""
    ntok = (
        "CAST(size(split(text, ' ')) AS BIGINT)" if spark
        else "CAST(len(string_split(text, ' ')) AS BIGINT)"
    )
    cascade = " ".join(f"WHEN n <= {b} THEN {b}" for b in LEN_BUCKETS)
    return f"""
    WITH toks AS (SELECT doc_id, {ntok} AS n FROM documents),
    b AS (
      SELECT doc_id, n,
             CASE {cascade} ELSE {LEN_BUCKETS[-1] * 2} END AS bucket
      FROM toks
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS all_docs,
                   SUM(n) AS all_tokens FROM b)
    SELECT b.bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.n) AS BIGINT) AS bucket_tokens,
           CAST(SUM(GREATEST(b.bucket - b.n, 0)) AS BIGINT) AS pad_tokens,
           CAST(COUNT(*) AS DOUBLE) / t.all_docs AS doc_share,
           CAST(SUM(b.n) AS DOUBLE) / t.all_tokens AS token_share
    FROM b CROSS JOIN tot t
    GROUP BY b.bucket, t.all_docs, t.all_tokens
    ORDER BY b.bucket
    """


_register("seq_len_buckets", _len_buckets_sql(True), _len_buckets_sql(False))


# ---------------------------------------------------------------------------
# per-domain document cap: skew-safe two-phase top-N per source
# ---------------------------------------------------------------------------
DOMAIN_CAP = 10  # max docs any single source may contribute
DOMAIN_SALT = 8  # phase-1 fan-out per source


def _domain_cap_sql(spark: bool) -> str:
    """Cap every source's contribution at DOMAIN_CAP docs, keeping its
    longest documents (n_chars DESC, doc_id ties) — the over-represented-
    domain guard every crawl-derived mixture applies before sampling.

    The Spark plan is the skew-safe *two-phase* top-N: phase 1 ranks within
    (source, doc_id % DOMAIN_SALT) so a mega-domain's rows spread over
    DOMAIN_SALT reducers and each emits at most DOMAIN_CAP survivors; phase
    2 ranks the <= CAP*SALT survivors per source exactly. Any global
    top-CAP row is within its salt bucket's top-CAP, and doc_id uniqueness
    makes the order total, so the result is bit-identical to the
    single-phase window the DuckDB oracle runs. A single-phase
    row_number() would funnel all rows of the hottest domain through one
    task at 100 TB; here no task ever sees more than 1/DOMAIN_SALT of a
    domain (phase 1) or CAP*SALT rows per domain (phase 2)."""
    if spark:
        return f"""
        WITH salted AS (
          SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source, doc_id % {DOMAIN_SALT}
                                    ORDER BY n_chars DESC, doc_id) AS srn
          FROM documents
        ),
        survivors AS (
          SELECT doc_id, source, n_chars FROM salted WHERE srn <= {DOMAIN_CAP}
        )
        SELECT doc_id, source, n_chars, domain_rank FROM (
          SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS domain_rank
          FROM survivors
        ) WHERE domain_rank <= {DOMAIN_CAP}
        ORDER BY source, domain_rank
        """
    return f"""
    SELECT doc_id, source, n_chars, domain_rank FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS domain_rank
      FROM documents
    ) WHERE domain_rank <= {DOMAIN_CAP}
    ORDER BY source, domain_rank
    """


_register("sample_domain_cap", _domain_cap_sql(True), _domain_cap_sql(False))


# ---------------------------------------------------------------------------
# mixture shift report: what did the domain cap do to per-source shares?
# ---------------------------------------------------------------------------
def _cap_shift_sql(spark: bool) -> str:
    """Per-source token share before vs after the DOMAIN_CAP cut and their
    ratio — the accounting a pipeline publishes alongside any rebalancing
    step so a mixture change is a reviewed decision, not a side effect.
    One window (salted two-phase at scale, see sample_domain_cap) + one
    aggregate; shares are exact-int divisions and the ratio divides two
    identical doubles, so the oracle is bit-identical."""
    ntok = (
        "CAST(size(split(text, ' ')) AS BIGINT)" if spark
        else "CAST(len(string_split(text, ' ')) AS BIGINT)"
    )
    return f"""
    WITH ranked AS (
      SELECT source, {ntok} AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ),
    agg AS (
      SELECT source,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
             CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN n_tokens ELSE 0 END)
                  AS BIGINT) AS tokens_after
      FROM ranked GROUP BY source
    ),
    tot AS (SELECT SUM(tokens_before) AS tb, SUM(tokens_after) AS ta FROM agg)
    SELECT a.source, a.tokens_before, a.tokens_after,
           CAST(a.tokens_before AS DOUBLE) / t.tb AS share_before,
           CAST(a.tokens_after AS DOUBLE) / t.ta AS share_after,
           (CAST(a.tokens_after AS DOUBLE) / t.ta)
             / (CAST(a.tokens_before AS DOUBLE) / t.tb) AS share_ratio
    FROM agg a CROSS JOIN tot t
    ORDER BY a.source
    """


_register("mixture_domain_cap_shift", _cap_shift_sql(True), _cap_shift_sql(False))


# ---------------------------------------------------------------------------
# mixture concentration: Gini coefficient of per-source token counts
# ---------------------------------------------------------------------------
def _gini_sql(spark: bool) -> str:
    """How concentrated is the mixture? Gini over per-source token counts
    via the rank formula G = sum_i (2i - n - 1) x_(i) / (n * total) — the
    one-number alarm that says "three domains are most of the corpus" before
    any capping decision. The numerator is exact BIGINT arithmetic (rank
    window over the AGGREGATED source table, which is tiny relative to the
    corpus — the only global sort touches n_sources rows, never documents),
    and the single final division produces the same double on both engines.
    Ties in counts rank deterministically by source name."""
    ntok = (
        "CAST(size(split(text, ' ')) AS BIGINT)" if spark
        else "CAST(len(string_split(text, ' ')) AS BIGINT)"
    )
    return f"""
    WITH g AS (
      SELECT source, CAST(SUM({ntok}) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(toks) AS BIGINT) AS total FROM g
    ),
    r AS (
      SELECT toks, ROW_NUMBER() OVER (ORDER BY toks, source) AS i FROM g
    )
    SELECT t.n AS n_sources, t.total AS total_tokens,
           CAST(SUM((2 * r.i - t.n - 1) * r.toks) AS DOUBLE)
             / (CAST(t.n AS DOUBLE) * t.total) AS gini
    FROM r CROSS JOIN tot t
    GROUP BY t.n, t.total
    """


_register("mixture_source_gini", _gini_sql(True), _gini_sql(False))


# ---------------------------------------------------------------------------
# per-dimension embedding statistics (drift / collapse / scale report)
# ---------------------------------------------------------------------------
def _dim_stats_sql(spark: bool) -> str:
    """Per-dimension mean / variance / range over the embedding corpus.

    The standard health report before training on an embedding column:
    collapsed dimensions (variance ~ 0), un-normalized scales, and
    distribution drift between snapshots all show up here. Output is one row
    per dimension (64 rows regardless of corpus size).

    Shape: positional explode (posexplode / generate_subscripts) then a
    single groupBy(dim) — map-side combinable, one shuffle of EMB_DIM-sized
    partial states. Means use the FLOOR(x * 2^30) fixed-point trick from
    `embedding_centroid_outliers` (power-of-two scaling of an exact double is
    exact, so each term is the identical BIGINT on both engines and the SUM
    is order-independent integer math); 2^30 (vs the centroid's 2^50) keeps
    |term| < 2^31 so the BIGINT sum holds to ~10^10 rows. At larger scale the
    same expression works under two-level hierarchical aggregation (Spark's
    partial aggregation already does this). min/max on doubles are
    order-independent; E[x^2] uses the same fixed-point guard.
    """
    two30 = "1073741824.0"  # 2^30
    if spark:
        pos = (
            "SELECT p AS dim, CAST(x AS DOUBLE) AS x "
            "FROM embeddings LATERAL VIEW posexplode(embedding) t AS p, x"
        )
    else:
        pos = (
            "SELECT generate_subscripts(embedding, 1) - 1 AS dim, "
            "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings"
        )
    fx = f"CAST(FLOOR(x * {two30}) AS BIGINT)"
    fx2 = f"CAST(FLOOR(x * x * {two30}) AS BIGINT)"
    return f"""
    WITH pos AS ({pos}),
    agg AS (
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n_vals,
             CAST(SUM({fx}) AS DOUBLE) / {two30} AS sum_x,
             CAST(SUM({fx2}) AS DOUBLE) / {two30} AS sum_x2,
             MIN(x) AS min_val,
             MAX(x) AS max_val
      FROM pos GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim, n_vals,
           sum_x / n_vals AS mean_val,
           sum_x2 / n_vals - (sum_x / n_vals) * (sum_x / n_vals) AS var_val,
           min_val, max_val,
           max_val - min_val AS range_val
    FROM agg
    ORDER BY dim
    """


_register("embedding_dim_stats", _dim_stats_sql(True), _dim_stats_sql(False))


# ---------------------------------------------------------------------------
# top principal direction via unrolled power iteration (relational linear
# algebra: each iteration = one corpus pass with 64 fixed-point sums)
# ---------------------------------------------------------------------------
PI_SCALE = "33554432.0"  # 2^25: |x*dot| <= ~18 -> terms < 2^30; BIGINT sums
# hold to ~10^9 rows, and Spark's partial aggregation extends that



def _power_iter_sql(spark: bool) -> str:
    """Dominant eigenvector of the (uncentered) Gram matrix X'X, 2 unrolled
    power iterations from v0 = 1⃗.

    The relational form of the classic distributed PCA step: an iteration is
    ONE corpus pass — project dot = x·v (sequential 64-term fold, computed
    once per row), then 64 map-side-combinable SUMs give w = X'(Xv); the
    64-value normalization happens on the 1-row aggregate, which broadcasts
    back for the next pass. No matrix is ever materialized; at 100 TB each
    iteration is a scan + one 64-column partial-agg shuffle, the same shape
    Spark MLlib's PCA uses for its Gramian accumulation.

    Determinism: each summand FLOOR(x_d * dot * 2^25) is a BIGINT (power-of-
    two scaling of identically-computed doubles), so sums are order-
    independent integer math — bit-identical across engines and Spark
    partitionings. All downstream normalization is straight-line scalar
    double arithmetic over those exact integers. 2 iterations are unrolled
    (enough to pin the math; convergence adds iterations, not new shapes).
    Output: one row per dimension with the unit direction after each
    iteration and the Rayleigh-quotient eigenvalue estimate ||w2|| (v1 is
    unit, so ||X'X v1|| estimates the top eigenvalue).
    """
    def idx(col: str, d: int) -> str:
        return f"{col}[{d}]" if spark else f"{col}[{d + 1}]"

    def dot_v(vec_prefix: str) -> str:
        # x · v with v's 64 components taken from the cross-joined 1-row CTE
        return " + ".join(
            f"CAST({idx('e.embedding', d)} AS DOUBLE) * {vec_prefix}{d}"
            for d in range(EMB_DIM))

    def w_sums(dot_col: str) -> str:
        return ", ".join(
            f"CAST(SUM(CAST(FLOOR(CAST({idx('e.embedding', d)} AS DOUBLE) "
            f"* {dot_col} * {PI_SCALE}) AS BIGINT)) AS DOUBLE) / {PI_SCALE} "
            f"AS w{d}"
            for d in range(EMB_DIM))

    def norm(prefix: str) -> str:
        return ("sqrt(" + " + ".join(
            f"{prefix}{d} * {prefix}{d}" for d in range(EMB_DIM)) + ")")

    # Per-dim output goes through ONE positional explode of packed arrays —
    # a 64-branch UNION ALL would re-inline (and re-run) the whole iteration
    # chain per branch in both engines (the CTE-inlining trap; see README
    # "CTE-inlining audit": this exact shape measured 162 s -> 3 s).
    arr_open, arr_close = ("array(", ")") if spark else ("[", "]")
    v1_cols = ", ".join(f"w.w{d} / {norm('w.w')} AS v{d}"
                        for d in range(EMB_DIM))
    v1_arr = (arr_open
              + ", ".join(f"w.w{d} / {norm('w.w')}" for d in range(EMB_DIM))
              + arr_close + " AS varr")
    v2_arr = (arr_open
              + ", ".join(f"w.w{d} / {norm('w.w')}" for d in range(EMB_DIM))
              + arr_close + " AS varr")
    if spark:
        out = (
            "SELECT d AS dim, element_at(a.varr, d + 1) AS loading_it1, "
            "element_at(b.varr, d + 1) AS loading_it2, b.eig AS eigenvalue "
            "FROM v1 a CROSS JOIN v2e b "
            f"LATERAL VIEW explode(sequence(0, {EMB_DIM - 1})) t AS d"
        )
    else:
        out = (
            "SELECT t.d AS dim, a.varr[t.d + 1] AS loading_it1, "
            "b.varr[t.d + 1] AS loading_it2, b.eig AS eigenvalue "
            "FROM v1 a CROSS JOIN v2e b CROSS JOIN "
            f"(SELECT unnest(generate_series(0, {EMB_DIM - 1})) AS d) t"
        )
    # iteration 1: v0 = 1⃗ -> dot is the plain component sum
    dot1 = " + ".join(f"CAST({idx('e.embedding', d)} AS DOUBLE)"
                      for d in range(EMB_DIM))
    hint = f"/*+ REPARTITION({_RP}) */ " if spark else ""
    return f"""
    WITH d1 AS (
      SELECT {hint}e.embedding, ({dot1}) AS dot FROM embeddings e
    ),
    w1 AS (
      SELECT {w_sums('e.dot')} FROM d1 e
    ),
    v1 AS (
      SELECT {v1_cols}, {v1_arr} FROM w1 w
    ),
    d2 AS (
      SELECT {hint}e.embedding, ({dot_v('v.v')}) AS dot
      FROM embeddings e CROSS JOIN v1 v
    ),
    w2 AS (
      SELECT {w_sums('e.dot')} FROM d2 e
    ),
    v2e AS (
      SELECT {v2_arr}, {norm('w.w')} AS eig FROM w2 w
    )
    {out}
    ORDER BY dim
    """


def _power_iter_spark_sql() -> str:
    """Array-fold form of ``_power_iter_sql(True)`` — same math, ~64x smaller
    expression tree (r10, guide §1.2 "per-task work" applied to the DRIVER:
    the unrolled form repeated 64-term dot/norm chains per output column, a
    253 KB formatted plan whose Catalyst analysis + codegen dominated the
    entry — 1.5-1.9 s construct+analyze and 2.5-4.3 s first execution at
    sf0.01, data work being milliseconds; tools/probe_r10_decomp.json).

    Bit-identity argument (the DuckDB oracle keeps the unrolled text, so
    every gate run re-proves it):
    - each per-row BIGINT summand ``FLOOR(x_d * dot * 2^25)`` is unchanged —
      ``dot`` as a fold ``((0.0+t0)+t1)+...`` equals the unrolled left chain
      ``(t0+t1)+...`` for every IEEE double (0.0+t == t except -0.0 -> +0.0,
      and a ±0.0 dot yields the same FLOOR->BIGINT 0 either way);
    - the BIGINT sums are order-independent integer math (same values, any
      grouping), and every output double (loadings, eigenvalue) is the same
      straight-line arithmetic over those integers — norm/eig folds start at
      +0.0 and add squares (never -0.0), so they equal the unrolled chains
      bit-for-bit.
    ``slice(..., 1, 64)`` pins the 64-dim prefix the unrolled form read, so
    an over-long vector cannot change ``dot`` through zip_with padding.
    """
    hint = f"/*+ REPARTITION({_RP}) */ "
    emb64 = f"slice(e.embedding, 1, {EMB_DIM})"
    dot1 = (f"aggregate({emb64}, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE))")
    dot2 = (f"aggregate(zip_with({emb64}, v.varr, "
            "(x, vv) -> CAST(x AS DOUBLE) * vv), CAST(0.0 AS DOUBLE), "
            "(acc, y) -> acc + y)")
    terms = (f"transform(slice(e.embedding, 1, {EMB_DIM}), "
             f"x -> CAST(FLOOR(CAST(x AS DOUBLE) * e.dot * {PI_SCALE}) "
             "AS BIGINT))")
    sums = ", ".join(
        f"CAST(SUM(t.terms[{d}]) AS DOUBLE) / {PI_SCALE} AS w{d}"
        for d in range(EMB_DIM))
    warr = "array(" + ", ".join(f"w{d}" for d in range(EMB_DIM)) + ")"
    norm = "sqrt(aggregate(warr, CAST(0.0 AS DOUBLE), (acc, w) -> acc + w * w))"
    return f"""
    WITH d1 AS (
      SELECT {hint}e.embedding, ({dot1}) AS dot FROM embeddings e
    ),
    t1 AS (SELECT {terms} AS terms FROM d1 e),
    w1 AS (SELECT {sums} FROM t1 t),
    v1 AS (
      SELECT transform(warr, w -> w / nrm) AS varr
      FROM (SELECT warr, {norm} AS nrm
            FROM (SELECT {warr} AS warr FROM w1))
    ),
    d2 AS (
      SELECT {hint}e.embedding, ({dot2}) AS dot
      FROM embeddings e CROSS JOIN v1 v
    ),
    t2 AS (SELECT {terms} AS terms FROM d2 e),
    w2 AS (SELECT {sums} FROM t2 t),
    v2e AS (
      SELECT transform(warr, w -> w / nrm) AS varr, nrm AS eig
      FROM (SELECT warr, {norm} AS nrm
            FROM (SELECT {warr} AS warr FROM w2))
    )
    SELECT d AS dim, element_at(a.varr, d + 1) AS loading_it1,
           element_at(b.varr, d + 1) AS loading_it2, b.eig AS eigenvalue
    FROM v1 a CROSS JOIN v2e b
    LATERAL VIEW explode(sequence(0, {EMB_DIM - 1})) t AS d
    ORDER BY dim
    """


_register("embedding_top_component", _power_iter_spark_sql(), _power_iter_sql(False))
