"""Corpus-curation operators: decontamination, repetition filters, duplicate
clustering, and n-gram familiarity scoring over the `documents` table.

The reference engine has no corpus-curation surface (it is a pass-through SQL
engine); these are training-data-pipeline extensions in the same family as
`operators/dedup.py`, built as pure relational pipelines so the identical plan
runs at 100 TB:

- **decontamination**: flag training docs that share >= K distinct word
  5-grams with an eval split (here: `source = 'src0'`). The eval shingle set
  is tiny relative to the corpus, so at scale the shingle join is a broadcast
  hash join against a full scan of the train side — no shuffle of the corpus;
  the per-doc distinct-overlap count is a map-side-combinable aggregation on
  doc_id. This is the standard n-gram-overlap decontamination used for
  benchmark leakage checks.
- **repetition**: Gopher-style per-document repetition signals — duplicate-
  word fraction and most-frequent-bigram fraction — as per-row explode +
  two-level aggregate. All ratios are INT/INT computed in IEEE double (one
  correctly-rounded division), so both engines agree bit-for-bit.
- **dup_clusters**: connected components over the MinHash-LSH near-dup pair
  graph (edges from `dedup.dedup_minhash_lsh`), via iterative min-label
  propagation in Spark (each round = one shuffle join; rounds = cluster
  diameter, which is tiny for dup clusters). The DuckDB oracle computes the
  same components with a recursive transitive closure. At 100 TB the
  propagation loop is the standard big-graph CC shape (alternating-star
  variants halve round count; diameter of dup clusters rarely exceeds ~4).
- **familiarity**: per-doc mean corpus-frequency of its bigrams — a cheap
  LM-free fluency/quality proxy (docs made of corpus-rare bigrams score low).
  Corpus counts shuffle once on bigram, then join back to doc bigrams; at
  scale the counts table can be replaced by a count-min sketch broadcast.

Every query has a DuckDB oracle producing bit-identical values (see
`_xengine` for the cross-engine primitives and determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bemidb_spark.operators._xengine import (
    REPARTITION_WIDTH as _RP,
    shingles,
    words,
)
from bemidb_spark.operators.dedup import _minhash_sql
from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

EVAL_SOURCE = "src0"  # the held-out "benchmark" split
DECON_NGRAM = 5
DECON_MIN_SHARED = 5
DUP_WORD_MAX = 0.5  # Gopher-style thresholds for the keep flag
TOP_BIGRAM_MAX = 0.12
CC_MAX_ROUNDS = 12


def _register_sql(name: str, spark_sql: str, duck_sql: str) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql


# ---------------------------------------------------------------------------
# decontamination: eval-split n-gram overlap
# ---------------------------------------------------------------------------
def _decontaminate_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    sh = shingles("w", DECON_NGRAM, spark=spark)
    distinct = "array_distinct" if spark else "list_distinct"
    if spark:
        # OUTER explode + repartitioned source: suppress the inferred
        # size(sh)>0 filter (re-runs the shingle pipeline at single-file
        # scan parallelism — see dedup._minhash_sql) and spread the
        # per-row shingle work; sh is structurally non-empty/non-null.
        expl = (
            f"SELECT doc_id, source, s FROM "
            f"(SELECT doc_id, source, {distinct}({sh}) AS sh "
            f" FROM (SELECT /*+ REPARTITION({_RP}) */ doc_id, source, {w} AS w FROM documents)) "
            f"LATERAL VIEW OUTER explode(sh) t AS s"
        )
    else:
        expl = (
            f"SELECT doc_id, source, unnest({distinct}({sh})) AS s "
            f"FROM (SELECT doc_id, source, {w} AS w FROM documents)"
        )
    return f"""
    WITH sh AS ({expl}),
    ev AS (SELECT DISTINCT s FROM sh WHERE source = '{EVAL_SOURCE}'),
    hits AS (
      SELECT t.doc_id, COUNT(DISTINCT t.s) AS n_shared
      FROM sh t JOIN ev ON t.s = ev.s
      WHERE t.source <> '{EVAL_SOURCE}'
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_shared, 0) AS shared_ngrams,
           CASE WHEN COALESCE(h.n_shared, 0) >= {DECON_MIN_SHARED}
                THEN 1 ELSE 0 END AS contaminated
    FROM documents d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.source <> '{EVAL_SOURCE}'
    ORDER BY d.doc_id
    """


_register_sql("decontaminate_eval_overlap", _decontaminate_sql(True), _decontaminate_sql(False))


# ---------------------------------------------------------------------------
# contamination spans: longest contiguous run of contaminated positions
# ---------------------------------------------------------------------------
SPAN_FLAG_MIN = 3  # a run of >= 3 consecutive contaminated 5-grams ≈ a
# verbatim substring of >= 7 words copied from the eval split — much stronger
# leakage evidence than the same number of shingles scattered across the doc.


def _contamination_span_sql(spark: bool) -> str:
    """Positional decontamination: islands of consecutive contaminated shingles.

    `decontaminate_eval_overlap` counts HOW MANY eval shingles a training doc
    shares; this entry finds WHERE they sit. A long contiguous run of
    contaminated positions means a verbatim copied span (the signal used for
    span-level eval decontamination in LLM data pipelines), while the same
    count scattered through the doc is usually benign phrase reuse.

    Shape: positional shingle explode (posexplode / generate_subscripts), a
    broadcast semi-join of corpus positions against the tiny distinct eval
    shingle set, then the classic gaps-and-islands trick — group consecutive
    positions by ``p - ROW_NUMBER() OVER (PARTITION BY doc ORDER BY p)``.
    At 100 TB: the eval set broadcasts, the explode is map-side, and the only
    shuffle is the per-doc window whose state is bounded by document length.
    """
    w = words("text", spark=spark)
    sh = shingles("w", DECON_NGRAM, spark=spark)
    if spark:
        # OUTER posexplode + repartitioned source (same inferred-filter
        # pathology as dedup._minhash_sql; sh structurally non-empty).
        pos = (
            f"SELECT doc_id, source, p, s FROM "
            f"(SELECT doc_id, source, {sh} AS sh "
            f" FROM (SELECT /*+ REPARTITION({_RP}) */ doc_id, source, {w} AS w FROM documents)) "
            f"LATERAL VIEW OUTER posexplode(sh) t AS p, s"
        )
    else:
        pos = (
            f"SELECT doc_id, source, generate_subscripts(sh, 1) - 1 AS p, "
            f"unnest(sh) AS s "
            f"FROM (SELECT doc_id, source, {sh} AS sh "
            f"      FROM (SELECT doc_id, source, {w} AS w FROM documents))"
        )
    return f"""
    WITH pos AS ({pos}),
    ev AS (SELECT DISTINCT s FROM pos WHERE source = '{EVAL_SOURCE}'),
    hits AS (
      SELECT t.doc_id, t.p
      FROM pos t JOIN ev ON t.s = ev.s
      WHERE t.source <> '{EVAL_SOURCE}'
    ),
    runs AS (
      SELECT doc_id,
             p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
      FROM hits
    ),
    spans AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS span_len
      FROM runs GROUP BY doc_id, grp
    ),
    agg AS (
      SELECT doc_id,
             CAST(MAX(span_len) AS BIGINT) AS max_span,
             CAST(SUM(span_len) AS BIGINT) AS n_pos
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_pos, 0) AS BIGINT) AS contaminated_positions,
           CAST(COALESCE(a.max_span, 0) AS BIGINT) AS max_contiguous_span,
           CASE WHEN COALESCE(a.max_span, 0) >= {SPAN_FLAG_MIN}
                THEN 1 ELSE 0 END AS span_flagged
    FROM documents d
    LEFT JOIN agg a ON d.doc_id = a.doc_id
    WHERE d.source <> '{EVAL_SOURCE}'
    ORDER BY d.doc_id
    """


_register_sql(
    "contamination_span_max",
    _contamination_span_sql(True),
    _contamination_span_sql(False),
)


# ---------------------------------------------------------------------------
# repetition / boilerplate signals (Gopher-style)
# ---------------------------------------------------------------------------
def _repetition_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    bg = shingles("w", 2, spark=spark)
    distinct = "array_distinct" if spark else "list_distinct"
    size = "size" if spark else "len"
    if spark:
        # OUTER explode + repartitioned source (same inferred-filter
        # pathology as dedup._minhash_sql; bgs structurally non-empty).
        expl = (
            f"SELECT doc_id, b FROM (SELECT doc_id, {bg} AS bgs "
            f"FROM (SELECT /*+ REPARTITION({_RP}) */ doc_id, {w} AS w FROM documents)) "
            f"LATERAL VIEW OUTER explode(bgs) t AS b"
        )
        base_src = f"(SELECT /*+ REPARTITION({_RP}) */ doc_id, {w} AS w FROM documents)"
    else:
        expl = (
            f"SELECT doc_id, unnest({bg}) AS b "
            f"FROM (SELECT doc_id, {w} AS w FROM documents)"
        )
        base_src = f"(SELECT doc_id, {w} AS w FROM documents)"
    return f"""
    WITH base AS (
      SELECT doc_id, {size}(w) AS n_words, {size}({distinct}(w)) AS n_distinct
      FROM {base_src}
    ),
    bg AS ({expl}),
    bgc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
    agg AS (SELECT doc_id, MAX(c) AS max_bg, SUM(c) AS tot_bg FROM bgc GROUP BY doc_id)
    SELECT b.doc_id,
           b.n_words,
           CAST(b.n_words - b.n_distinct AS DOUBLE) / b.n_words AS dup_word_frac,
           CAST(a.max_bg AS DOUBLE) / a.tot_bg AS top_bigram_frac,
           CASE WHEN CAST(b.n_words - b.n_distinct AS DOUBLE) / b.n_words <= {DUP_WORD_MAX}
                 AND CAST(a.max_bg AS DOUBLE) / a.tot_bg <= {TOP_BIGRAM_MAX}
                THEN 1 ELSE 0 END AS keep
    FROM base b JOIN agg a ON b.doc_id = a.doc_id
    ORDER BY b.doc_id
    """


_register_sql("repetition_filter", _repetition_sql(True), _repetition_sql(False))


# ---------------------------------------------------------------------------
# bigram familiarity: mean corpus-frequency of a doc's bigrams
# ---------------------------------------------------------------------------
def _familiarity_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    bg = shingles("w", 2, spark=spark)
    if spark:
        # OUTER explode + repartitioned source (same inferred-filter
        # pathology as dedup._minhash_sql; bgs structurally non-empty).
        expl = (
            f"SELECT doc_id, b FROM (SELECT doc_id, {bg} AS bgs "
            f"FROM (SELECT /*+ REPARTITION({_RP}) */ doc_id, {w} AS w FROM documents)) "
            f"LATERAL VIEW OUTER explode(bgs) t AS b"
        )
    else:
        expl = (
            f"SELECT doc_id, unnest({bg}) AS b "
            f"FROM (SELECT doc_id, {w} AS w FROM documents)"
        )
    return f"""
    WITH bg AS ({expl}),
    corpus AS (SELECT b, COUNT(*) AS cnt FROM bg GROUP BY b)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(c.cnt) AS DOUBLE) / COUNT(*) AS avg_bigram_freq
    FROM bg JOIN corpus c ON bg.b = c.b
    GROUP BY bg.doc_id
    ORDER BY bg.doc_id
    """


_register_sql("bigram_familiarity", _familiarity_sql(True), _familiarity_sql(False))


# ---------------------------------------------------------------------------
# duplicate clusters: connected components over MinHash near-dup pairs
# ---------------------------------------------------------------------------
def _dup_clusters_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation over the near-dup pair graph.

    Each round: label(v) <- min(label(v), min over neighbors label(u)) — one
    shuffle join per round, rounds bounded by cluster diameter (checked with a
    cheap changed-count; dup clusters converge in a handful of rounds). The
    edge set comes from the LSH candidate pipeline, so nothing here is
    all-pairs. Returns (doc_id, cluster_id, cluster_size, is_canonical).
    """
    register_views(spark, sf_dir)
    pairs = spark.sql(f"SELECT doc_a, doc_b FROM ({_minhash_sql(True)})")
    und = pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
    # localCheckpoint (not just persist): each round's plan otherwise nests
    # the whole previous round's lineage, so Catalyst re-analysis compounds
    # per round (measured 32 s -> ~8 s at sf0.01). Lineage truncation per
    # iteration is the standard shape for iterative graph algorithms; on a
    # cluster the same call (or a reliable checkpoint dir) bounds plan depth.
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("doc_a").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(CC_MAX_ROUNDS):
        nbr_min = (
            und.join(labels, und.doc_b == labels.doc_id)
            .groupBy(und.doc_a.alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select("doc_id", F.least("label", F.coalesce("nbr_label", "label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
            F.when(F.col("doc_id") == F.col("label"), 1).otherwise(0).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


_DUP_CLUSTERS_DUCK = f"""
    WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({_minhash_sql(False)})),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a WHERE r.a <> u.b
    ),
    labels AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id)
    SELECT l.doc_id, l.cluster_id, s.cluster_size,
           CASE WHEN l.doc_id = l.cluster_id THEN 1 ELSE 0 END AS is_canonical
    FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id
    ORDER BY l.doc_id
"""

QUERIES["dedup_dup_clusters"] = _dup_clusters_spark
ORACLES["dedup_dup_clusters"] = _DUP_CLUSTERS_DUCK


def _cluster_survivors_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best survivor selection over the duplicate clusters: detect →
    cluster → pick ONE canonical document per cluster by quality (longest
    `n_chars`, doc_id tie-break) and mark the rest for dropping. This is the
    retention *policy* step every production dedup pipeline runs after
    clustering (keeping the longest/highest-quality member, not an arbitrary
    min-id); `dedup_dup_clusters`' is_canonical is the graph label, this is
    the quality decision. One window over the (small) clustered subset — the
    unclustered corpus never enters the plan."""
    from pyspark.sql.window import Window

    clusters = _dup_clusters_spark(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        clusters.join(docs, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "n_chars",
            F.when(F.col("rk") == 1, 1).otherwise(0).alias("keep"),
        )
        .orderBy("doc_id")
    )


_CLUSTER_SURVIVORS_DUCK = f"""
    WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({_minhash_sql(False)})),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a WHERE r.a <> u.b
    ),
    labels AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id),
    ranked AS (
      SELECT l.doc_id, l.cluster_id, s.cluster_size, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                ORDER BY d.n_chars DESC, l.doc_id) AS rk
      FROM labels l
      JOIN sizes s ON l.cluster_id = s.cluster_id
      JOIN documents d ON d.doc_id = l.doc_id
    )
    SELECT doc_id, cluster_id, cluster_size, n_chars,
           CASE WHEN rk = 1 THEN 1 ELSE 0 END AS keep
    FROM ranked
    ORDER BY doc_id
"""

QUERIES["dedup_cluster_survivors"] = _cluster_survivors_spark
ORACLES["dedup_cluster_survivors"] = _CLUSTER_SURVIVORS_DUCK


def _dup_spectrum_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-multiplicity spectrum: how many clusters exist at each
    size, and how many documents those clusters hold — the one-table summary
    behind 'X% of the corpus is duplicated, mostly in pairs / mostly in one
    giant near-dup family'. Drives dedup policy (pair-heavy corpora keep
    `dedup_cluster_survivors`' keep-best; a giant cluster usually means a
    boilerplate template to strip instead). Tiny aggregation over the
    cluster assignment — scale cost is the clustering itself."""
    clusters = _dup_clusters_spark(spark, sf_dir)
    return (
        clusters.groupBy("cluster_size")
        .agg(
            (F.count("*") / F.col("cluster_size")).cast("bigint").alias("n_clusters"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


_DUP_SPECTRUM_DUCK = f"""
    WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({_minhash_sql(False)})),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a WHERE r.a <> u.b
    ),
    labels AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY cluster_id
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM sizes
    GROUP BY cluster_size
    ORDER BY cluster_size
"""

QUERIES["dedup_dup_spectrum"] = _dup_spectrum_spark
ORACLES["dedup_dup_spectrum"] = _DUP_SPECTRUM_DUCK


# ---------------------------------------------------------------------------
# sequence packing: token-budget contiguous bin-packing for training batches
# ---------------------------------------------------------------------------
PACK_BUDGET = 512  # tokens per packed training sequence


def _pack_sql(spark: bool) -> str:
    """Greedy contiguous packing: docs (per language, in doc_id order) are
    assigned to sequence bins by exclusive running token count —
    ``seq_id = floor(prior_tokens / budget)``. One window over one shuffle
    on (lang); at 100 TB the same plan range-partitions on (lang, doc_id)
    and the running sum distributes (each partition adds its predecessors'
    offset — Spark's window already executes it that way). This is the
    streaming-packer shape every LLM data loader uses; best-fit-decreasing
    variants buy ~2-3% fill at the cost of a global sort per bin and are
    not worth the extra shuffle at corpus scale.
    """
    ntok = (
        "CAST(size(split(text, ' ')) AS BIGINT)" if spark
        else "CAST(len(string_split(text, ' ')) AS BIGINT)"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, {ntok} AS n_tokens FROM documents
    ),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_tokens
      FROM toks
    )
    SELECT lang,
           CAST(FLOOR(prior_tokens / {PACK_BUDGET}) AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM cum
    GROUP BY lang, CAST(FLOOR(prior_tokens / {PACK_BUDGET}) AS BIGINT)
    ORDER BY lang, seq_id
    """


_register_sql("pack_sequences_budget", _pack_sql(True), _pack_sql(False))


# ---------------------------------------------------------------------------
# document chunking with overlap (RAG / pretraining shard prep): fixed-size
# word windows with stride < window, the standard context-chunking shape.
# Per-row transform + explode — embarrassingly parallel, no shuffle until the
# final ORDER BY (which a real pipeline drops); at 100 TB this is a map-only
# stage feeding the tokenizer.
# ---------------------------------------------------------------------------
CHUNK_WORDS = 48
CHUNK_STRIDE = 32


def _chunk_sql(spark: bool) -> str:
    from bemidb_spark.operators._xengine import words

    w = words("text", spark=spark)
    if spark:
        starts = (
            f"CASE WHEN size(w) <= {CHUNK_WORDS} THEN array(1) "
            f"ELSE transform(sequence(0, CAST(ceil((size(w) - {CHUNK_WORDS}) "
            f"/ CAST({CHUNK_STRIDE} AS DOUBLE)) AS INT)), i -> i * {CHUNK_STRIDE} + 1) END"
        )
        chunk = f"array_join(slice(w, s, {CHUNK_WORDS}), ' ')"
        nwords = f"size(slice(w, s, {CHUNK_WORDS}))"
        tok = (
            f"SELECT doc_id, lang, pos AS chunk_idx, {chunk} AS chunk_text, "
            f"{nwords} AS n_words "
            f"FROM (SELECT doc_id, lang, {w} AS w FROM documents) "
            f"LATERAL VIEW posexplode({starts}) t AS pos, s"
        )
    else:
        starts = (
            f"CASE WHEN len(w) <= {CHUNK_WORDS} THEN [1] "
            f"ELSE [i * {CHUNK_STRIDE} + 1 FOR i IN "
            f"generate_series(0, CAST(ceil((len(w) - {CHUNK_WORDS}) "
            f"/ CAST({CHUNK_STRIDE} AS DOUBLE)) AS INT))] END"
        )
        chunk = f"array_to_string(w[u.s:u.s+{CHUNK_WORDS - 1}], ' ')"
        nwords = f"len(w[u.s:u.s+{CHUNK_WORDS - 1}])"
        tok = (
            f"SELECT doc_id, lang, u.i - 1 AS chunk_idx, "
            f"{chunk} AS chunk_text, {nwords} AS n_words "
            f"FROM (SELECT doc_id, lang, {w} AS w, {starts} AS starts "
            f"FROM documents) d, "
            f"LATERAL (SELECT UNNEST(starts) AS s, "
            f"generate_subscripts(starts, 1) AS i) u"
        )
    return f"""
    SELECT doc_id, chunk_idx, lang,
           CAST(n_words AS BIGINT) AS n_words,
           md5(chunk_text) AS chunk_digest
    FROM ({tok}) chunks
    WHERE n_words > 0
    ORDER BY doc_id, chunk_idx
    """


_register_sql("doc_chunk_overlap", _chunk_sql(True), _chunk_sql(False))


# ---------------------------------------------------------------------------
# exact-substring duplication (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better"): a document's word n-grams that literally
# recur in OTHER documents mark copied spans; docs past a duplicated-gram
# fraction threshold are dropped. The canonical implementation builds a
# corpus suffix array; the distributed re-expression is gram-hash frequency:
# explode each doc's n-grams (all occurrences), count distinct docs per
# gram, and aggregate the duplicated-gram fraction per doc. One shuffle on
# the gram digest + one map-side-combinable groupBy(doc) — at 100 TB the
# gram table is the classic shuffle-heavy-but-linear dedup shape, and the
# digest keeps shuffle rows at 32 bytes regardless of n.
# ---------------------------------------------------------------------------
ES_NGRAM = 13  # the span length the paper found marks real copying
ES_DUP_MAX = 0.5


def _exact_substring_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    sh = shingles("w", ES_NGRAM, spark=spark)
    if spark:
        # OUTER explode + repartitioned source (same inferred-filter
        # pathology as dedup._minhash_sql; sh structurally non-empty).
        expl = (
            f"SELECT doc_id, md5(s) AS g FROM "
            f"(SELECT doc_id, {sh} AS sh "
            f" FROM (SELECT /*+ REPARTITION({_RP}) */ doc_id, {w} AS w FROM documents)) "
            f"LATERAL VIEW OUTER explode(sh) t AS s"
        )
    else:
        expl = (
            f"SELECT doc_id, md5(unnest({sh})) AS g "
            f"FROM (SELECT doc_id, {w} AS w FROM documents)"
        )
    return f"""
    WITH grams AS ({expl}),
    freq AS (
      SELECT g, COUNT(DISTINCT doc_id) AS nd
      FROM grams GROUP BY g
    ),
    per_doc AS (
      SELECT gr.doc_id,
             COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
      FROM grams gr JOIN freq f ON gr.g = f.g
      GROUP BY gr.doc_id
    )
    SELECT doc_id, n_grams, dup_grams,
           CAST(dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_fraction,
           CASE WHEN CAST(dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                     <= {ES_DUP_MAX}
                THEN 1 ELSE 0 END AS keep
    FROM per_doc
    ORDER BY doc_id
    """


_register_sql(
    "exact_substring_dedup",
    _exact_substring_sql(True),
    _exact_substring_sql(False),
)
