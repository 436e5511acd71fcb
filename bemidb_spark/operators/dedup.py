"""Deduplication operators over the `documents` / `embeddings` tables.

The reference has no dedup operators (its engine is pass-through SQL); these are
the training-data-pipeline extensions, built as pure relational pipelines so the
same plan runs at 100 TB:

- **exact**: hash-groupBy on normalized text (one shuffle on a 32-hex key).
- **minhash_lsh**: shingle → k minhash → band → bucket self-join → exact-jaccard
  verify. Candidate generation is the banded join (tiny buckets ⇒ near-linear);
  no all-pairs comparison ever happens, which is what makes it scale.
- **simhash**: 32-bit fingerprint per doc (per-row expression, no shuffle);
  near-pairs use 64-bit fingerprints with 16-bit chunk banding (pigeonhole-
  exact for Hamming ≤ 3, 65,536 buckets per chunk).
- **ngram_jaccard**: prefix-blocked exact jaccard (blocking key = first 4
  words) — the classic cheap blocker; complements MinHash (which catches
  pairs whose prefixes differ).
- **embedding**: random-hyperplane LSH buckets (8 bands × 4 bits) +
  exact-cosine verify (decimal-free, sequential-fold math; see _xengine).

Every query has a DuckDB oracle producing bit-identical values. Engine-specific
SQL is generated from one template per operator with `spark: bool` switches, so
the logic cannot drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.operators._xengine import (
    REPARTITION_WIDTH as _RP,
    cosine,
    dot_fold,
    hash_int,
    minhash_min_aggs,
    shingles,
    words,
)
from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

MINHASH_K = 16
BANDS = 8  # 8 bands x 2 rows: P(candidate | jaccard 0.5) ~ 0.90
ROWS_PER_BAND = MINHASH_K // BANDS
JACCARD_MIN = 0.5
SIMHASH_BITS = 32
HAMMING_MAX = 3  # standard 64-bit simhash near-dup threshold
COSINE_MIN = 0.4


def _register(name: str, spark_sql: str, duck_sql: str) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql


# ---------------------------------------------------------------------------
# exact dedup: normalized-text hash, keep lowest doc_id per group
# ---------------------------------------------------------------------------
def _exact_sql(spark: bool) -> str:
    return """
    SELECT md5(lower(trim(text))) AS dedup_key,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5(lower(trim(text)))
    ORDER BY keep_doc_id
    """


_register("dedup_exact", _exact_sql(True), _exact_sql(False))


# ---------------------------------------------------------------------------
# minhash + LSH near-dedup with exact-jaccard verification
# ---------------------------------------------------------------------------
def _minhash_sql(spark: bool) -> str:
    """Shingle -> one md5 base hash per shingle (exploded) -> 16 MIN
    aggregates (universal-hash permutations) -> 8 band digests -> banded
    self-join -> exact-jaccard verify on candidates only.

    The signature computation is explode + GROUP BY MIN — NOT nested array
    lambdas: the aggregation boundary materializes each doc's 16 minhashes
    exactly once, so downstream expressions can't re-trigger the
    shingle/md5 pipeline (CollapseProject re-evaluation was a measured
    8 s -> 150 s regression; see _xengine.minhash_min_aggs). Candidates
    come from ONE self-join on exploded (band_no, digest) rows, not 8
    per-band self-joins: Spark inlines each CTE reference, so the 8-join
    UNION evaluated the whole scan->shingle->minhash subtree 16+ times
    (18 FileScans, 0 reused exchanges in the physical plan); the exploded
    form evaluates it twice. The REPARTITION hint spreads the CPU-heavy
    hash/verify work across cores even when the scan is a single file."""
    w = words("text", spark=spark)
    sh = shingles("w", 3, spark=spark)
    aggs = ", ".join(minhash_min_aggs(MINHASH_K))
    distinct = "array_distinct" if spark else "list_distinct"
    size = "size" if spark else "len"
    inter = (
        f"{size}(array_intersect(a.sh, b.sh))"
        if spark
        else "len(list_intersect(a.sh, b.sh))"
    )
    cast_t = "STRING" if spark else "VARCHAR"
    digests = [
        "md5(concat_ws(',', "
        + ", ".join(
            f"CAST(m{b * ROWS_PER_BAND + r} AS {cast_t})"
            for r in range(ROWS_PER_BAND)
        )
        + "))"
        for b in range(BANDS)
    ]
    if spark:
        hint = f"/*+ REPARTITION({_RP}) */ "
        # OUTER explode: plain explode lets InferFiltersFromGenerate add a
        # `size(sh) > 0` filter that predicate-pushdown rewrites into the
        # full shingle pipeline and pushes BELOW the REPARTITION hint — the
        # whole split/shingle/array_distinct work then runs a third time at
        # raw-scan parallelism (a single file at test scale = one task).
        # `sh` is structurally non-empty and non-null (the shingles() CASE
        # always yields >= 1 element, even for NULL text), so OUTER explode
        # is row-for-row identical and suppresses the inferred filter.
        # That NULL-text argument requires non-ANSI size(NULL) = -1
        # semantics, which build_session pins explicitly
        # (spark.sql.ansi.enabled=false + legacy.sizeOfNull=true).
        # Measured at sf0.1 (noop sink): 2.15 s -> 0.70 s, identical rows;
        # the verify-side docs subtree then also reuses the repartition
        # exchange instead of a separate scan (guide §4.4 analog — stop the
        # optimizer duplicating expensive expressions).
        ex = (
            "SELECT doc_id, "
            + hash_int("s", spark=True, salt="mh")
            + " AS h FROM docs LATERAL VIEW OUTER explode(sh) t AS s"
        )
        bandrows = (
            "SELECT doc_id, pos AS band_no, digest FROM mh "
            f"LATERAL VIEW posexplode(array({', '.join(digests)})) t AS pos, digest"
        )
    else:
        hint = ""
        ex = (
            "SELECT doc_id, "
            + hash_int("unnest(sh)", spark=False, salt="mh")
            + " AS h FROM docs"
        )
        bandrows = (
            "SELECT doc_id, u.i - 1 AS band_no, u.d AS digest FROM "
            f"(SELECT doc_id, [{', '.join(digests)}] AS ds FROM mh) m, "
            "LATERAL (SELECT unnest(ds) AS d, "
            "generate_subscripts(ds, 1) AS i) u"
        )
    return f"""
    WITH raw AS (
      SELECT {hint}doc_id, text FROM documents
    ),
    docs AS (
      SELECT doc_id, {distinct}({sh}) AS sh
      FROM (SELECT doc_id, {w} AS w FROM raw)
    ),
    ex AS (
      {ex}
    ),
    mh AS (
      SELECT doc_id, {aggs} FROM ex GROUP BY doc_id
    ),
    bandrows AS (
      {bandrows}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandrows a
      JOIN bandrows b ON a.band_no = b.band_no AND a.digest = b.digest
                     AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST({inter} AS DOUBLE)
             / ({size}(a.sh) + {size}(b.sh) - {inter}) AS jaccard
    FROM cands c
    JOIN docs a ON a.doc_id = c.doc_a
    JOIN docs b ON b.doc_id = c.doc_b
    WHERE CAST({inter} AS DOUBLE)
             / ({size}(a.sh) + {size}(b.sh) - {inter}) >= {JACCARD_MIN}
    ORDER BY doc_a, doc_b
    """


_register("dedup_minhash_lsh", _minhash_sql(True), _minhash_sql(False))


# ---------------------------------------------------------------------------
# simhash fingerprints (32-bit) per document
# ---------------------------------------------------------------------------
def _simhash_sql(spark: bool) -> str:
    h = hash_int("token", spark=spark, salt="sh")
    shift = (lambda i: f"(shiftright(h, {i}) & 1)") if spark else (lambda i: f"((h >> {i}) & 1)")
    bit_sums = ", ".join(
        f"SUM(CASE WHEN {shift(i)} = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(SIMHASH_BITS)
    )
    if spark:
        tok = ("SELECT doc_id, token FROM documents "
               "LATERAL VIEW explode(split(text, ' ')) t AS token")
    else:
        tok = "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
    return f"""
    WITH tok AS ({tok}),
    hashed AS (SELECT doc_id, {h} AS h FROM tok),
    bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {fp} AS simhash
    FROM bits
    ORDER BY doc_id
    """


_register("dedup_simhash", _simhash_sql(True), _simhash_sql(False))


# ---------------------------------------------------------------------------
# simhash near-pairs: 64-bit fingerprints, 16-bit chunk banding + Hamming
# ---------------------------------------------------------------------------
PAIR_BITS = 64
CHUNK_BITS = 16
N_CHUNKS = PAIR_BITS // CHUNK_BITS


def _simhash_pairs_sql(spark: bool) -> str:
    """64-bit simhash near-pairs via 16-bit chunk banding.

    By the pigeonhole principle a pair with Hamming <= 3 agrees on at least
    one of the 4 chunks, so chunk-equality candidate joins are exact for the
    threshold. 16-bit chunks give 65,536 buckets each — at corpus scale each
    bucket holds ~n/65536 docs (vs 256 buckets for the old 8-bit banding,
    which saturated and sent the candidate join quadratic).

    The 64-bit fingerprint is materialized as four 16-bit chunk columns
    (c0..c3) rather than one BIGINT: bit 63 would overflow the signed range,
    and the chunks are what both the banding and the Hamming sum need anyway.
    """
    # hash_int is 32-bit; two independently-salted hashes give 64 independent
    # bits (lo: 0-31, hi: 32-63).
    h_lo = hash_int("token", spark=spark, salt="sh64a")
    h_hi = hash_int("token", spark=spark, salt="sh64b")

    def shift(i: int) -> str:
        col, k = ("hlo", i) if i < 32 else ("hhi", i - 32)
        if spark:
            return f"(shiftright({col}, {k}) & 1)"
        return f"(({col} >> {k}) & 1)"

    bit_sums = ", ".join(
        f"SUM(CASE WHEN {shift(i)} = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(PAIR_BITS)
    )
    chunk_exprs = []
    for c in range(N_CHUNKS):
        bits = " + ".join(
            f"(CASE WHEN s{c * CHUNK_BITS + k} > 0 THEN {1 << k} ELSE 0 END)"
            for k in range(CHUNK_BITS)
        )
        chunk_exprs.append(f"CAST({bits} AS BIGINT) AS c{c}")
    if spark:
        tok = (f"SELECT doc_id, token FROM "
               f"(SELECT /*+ REPARTITION({_RP}) */ doc_id, text FROM documents) "
               "LATERAL VIEW explode(split(text, ' ')) t AS token")
    else:
        tok = "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
    xor_hamming = " + ".join(
        f"bit_count(a.c{c} ^ b.c{c})" if spark else f"bit_count(xor(a.c{c}, b.c{c}))"
        for c in range(N_CHUNKS)
    )
    chunk_arr = ", ".join(f"c{c}" for c in range(N_CHUNKS))
    if spark:
        chunkrows = (
            "SELECT doc_id, pos AS chunk_no, v FROM fp "
            f"LATERAL VIEW posexplode(array({chunk_arr})) t AS pos, v"
        )
    else:
        chunkrows = (
            "SELECT doc_id, u.i - 1 AS chunk_no, u.v AS v FROM "
            f"(SELECT doc_id, [{chunk_arr}] AS cs FROM fp) m, "
            "LATERAL (SELECT unnest(cs) AS v, generate_subscripts(cs, 1) AS i) u"
        )
    # ONE join on exploded (chunk_no, value) rows — the N-way UNION of
    # per-chunk self-joins re-inlined the token-explode aggregation per
    # reference (same Catalyst CTE-inlining pathology as _minhash_sql)
    return f"""
    WITH tok AS ({tok}),
    hashed AS (SELECT doc_id, {h_lo} AS hlo, {h_hi} AS hhi FROM tok),
    bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id),
    fp AS (SELECT doc_id, {', '.join(chunk_exprs)} FROM bits),
    chunkrows AS ({chunkrows}),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM chunkrows a
      JOIN chunkrows b ON a.chunk_no = b.chunk_no AND a.v = b.v
                      AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, CAST({xor_hamming} AS INT) AS hamming
    FROM cands c
    JOIN fp a ON a.doc_id = c.doc_a
    JOIN fp b ON b.doc_id = c.doc_b
    WHERE {xor_hamming} <= {HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """


_register("dedup_simhash_pairs", _simhash_pairs_sql(True), _simhash_pairs_sql(False))


# ---------------------------------------------------------------------------
# prefix-blocked exact n-gram jaccard
# ---------------------------------------------------------------------------
def _ngram_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    sh = shingles("w", 3, spark=spark)
    distinct = "array_distinct" if spark else "list_distinct"
    size = "size" if spark else "len"
    inter = (
        f"{size}(array_intersect(a.sh, b.sh))"
        if spark
        else "len(list_intersect(a.sh, b.sh))"
    )
    prefix = (
        "array_join(slice(w, 1, 4), ' ')" if spark else "array_to_string(w[1:4], ' ')"
    )
    hint = f"/*+ REPARTITION({_RP}) */ " if spark else ""
    return f"""
    WITH docs AS (
      SELECT doc_id, {prefix} AS block_key, {distinct}({sh}) AS sh
      FROM (SELECT {hint}doc_id, {w} AS w FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({inter} AS DOUBLE)
             / ({size}(a.sh) + {size}(b.sh) - {inter}) AS jaccard
    FROM docs a
    JOIN docs b ON a.block_key = b.block_key AND a.doc_id < b.doc_id
    WHERE CAST({inter} AS DOUBLE)
             / ({size}(a.sh) + {size}(b.sh) - {inter}) >= {JACCARD_MIN}
    ORDER BY doc_a, doc_b
    """


_register("dedup_ngram_jaccard", _ngram_sql(True), _ngram_sql(False))


# ---------------------------------------------------------------------------
# embedding cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------
LSH_BITS_PER_BAND = 4
LSH_BANDS = 8
EMB_DIM = 64


def _hyperplane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: md5-derived components in
    [-1, 1]. Baked into the SQL as literals, so both engines bucket
    identically and results are reproducible across runs."""
    import hashlib

    return [
        int(hashlib.md5(f"hp{j}-{i}".encode()).hexdigest()[:8], 16) / 0x7FFFFFFF - 1.0
        for i in range(EMB_DIM)
    ]


def _embedding_sql(spark: bool) -> str:
    """Cosine near-dup with random-hyperplane LSH blocking (no label use).

    Bucket key per band = the sign pattern of LSH_BITS_PER_BAND hyperplane
    dot products; candidates = same-bucket pairs in ANY band; verification =
    exact sequential-fold cosine. At corpus scale the pruning factor is
    2^bits per band and bits grows with log(n) — unlike label blocking, whose
    biggest block is O(n) and makes the join quadratic. The parameters here
    (8 bands x 4 bits) are tuned for this corpus's weak pairs (cos ~0.45,
    ~60 deg): P(candidate) = 1-(1-p^4)^8 ~ 0.83 where p = 1 - theta/pi.
    """
    cos = cosine("a.embedding", "b.embedding", spark=spark)
    arr = (lambda v: "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in v) + ")") if spark \
        else (lambda v: "[" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in v) + "]")
    band_cols = []
    for b in range(LSH_BANDS):
        bits = []
        for r in range(LSH_BITS_PER_BAND):
            j = b * LSH_BITS_PER_BAND + r
            d = dot_fold("embedding", arr(_hyperplane(j)), spark=spark)
            bits.append(f"(CASE WHEN {d} >= 0 THEN {1 << r} ELSE 0 END)")
        band_cols.append(" + ".join(bits) + f" AS band{b}")
    band_arr = ", ".join(f"band{b}" for b in range(LSH_BANDS))
    if spark:
        bandrows = (
            "SELECT vec_id, pos AS band_no, bucket FROM sigs "
            f"LATERAL VIEW posexplode(array({band_arr})) t AS pos, bucket"
        )
    else:
        bandrows = (
            "SELECT vec_id, u.i - 1 AS band_no, u.b AS bucket FROM "
            f"(SELECT vec_id, [{band_arr}] AS bs FROM sigs) m, "
            "LATERAL (SELECT unnest(bs) AS b, generate_subscripts(bs, 1) AS i) u"
        )
    # single join on exploded (band_no, bucket) rows — not 8 inlined
    # self-joins (CTE-inlining re-evaluated the 32 hyperplane folds per
    # reference; same pathology as _minhash_sql)
    if spark:
        # Verify arm with per-vector norms precomputed once (the inline
        # cosine re-derives sqrt(dot(x,x)) for both sides of every
        # candidate pair in both the SELECT and the WHERE — 6 folds per
        # pair; with norms it is 1 fold + 1 multiply per appearance).
        # Same fold expressions, same `dot / (na * nb)` arithmetic order ->
        # identical doubles; the oracle keeps the inline form and proves
        # it. The shared repartitioned source spreads the 32 hyperplane
        # folds per vector across cores (single-file scan otherwise = one
        # task) and is reused by sigs and normed via exchange reuse.
        dot = dot_fold("a.embedding", "b.embedding", spark=True)
        src = f"(SELECT /*+ REPARTITION({_RP}) */ vec_id, embedding FROM embeddings)"
        cos_pair = f"{dot} / (a.nrm * b.nrm)"
        return f"""
    WITH sigs AS (
      SELECT vec_id, {', '.join(band_cols)}
      FROM {src}
    ),
    bandrows AS ({bandrows}),
    cands AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bandrows a
      JOIN bandrows b ON a.band_no = b.band_no AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
    ),
    normed AS (
      SELECT vec_id, embedding,
             SQRT({dot_fold('embedding', 'embedding', spark=True)}) AS nrm
      FROM {src}
    )
    SELECT c.vec_a, c.vec_b, {cos_pair} AS cos_sim
    FROM cands c
    JOIN normed a ON a.vec_id = c.vec_a
    JOIN normed b ON b.vec_id = c.vec_b
    WHERE {cos_pair} >= {COSINE_MIN}
    ORDER BY vec_a, vec_b
    """
    return f"""
    WITH sigs AS (
      SELECT vec_id, {', '.join(band_cols)}
      FROM embeddings
    ),
    bandrows AS ({bandrows}),
    cands AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bandrows a
      JOIN bandrows b ON a.band_no = b.band_no AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b, {cos} AS cos_sim
    FROM cands c
    JOIN embeddings a ON a.vec_id = c.vec_a
    JOIN embeddings b ON b.vec_id = c.vec_b
    WHERE {cos} >= {COSINE_MIN}
    ORDER BY vec_a, vec_b
    """


_register("dedup_embedding_cosine", _embedding_sql(True), _embedding_sql(False))


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet-style: chunk, hash, keep first occurrence)
# ---------------------------------------------------------------------------
SEG_WORDS = 10


def _paragraph_sql(spark: bool) -> str:
    """Corpus-wide segment dedup: chunk each doc into fixed 10-word segments
    (the corpus is single-line, so segments stand in for lines/paragraphs),
    keep only each segment's globally-first occurrence (min doc_id, idx), and
    emit per-doc stats + an md5 of the deduped reassembled text.

    Scale shape: ONE shuffle — segments are windowed by md5(segment), so
    first-occurrence ranking and occurrence counting share the same hash
    partitioning; no join, no all-pairs. Reassembly is a per-doc groupBy
    (second shuffle, keyed by doc_id) over already-deduped rows.
    """
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
            "CASE WHEN rk = 1 THEN struct(idx, seg) END)), s -> s.seg), ' ')"
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
        rebuild = "string_agg(seg, ' ' ORDER BY idx) FILTER (WHERE rk = 1)"
    return f"""
    WITH segs AS ({explode}),
    marked AS (
      SELECT doc_id, idx, seg,
             ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, idx) AS rk,
             COUNT(*) OVER (PARTITION BY md5(seg)) AS n_occ
      FROM segs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
           md5(coalesce({rebuild}, '')) AS dedup_text_hash
    FROM marked
    GROUP BY doc_id
    ORDER BY doc_id
    """


_register("dedup_paragraphs", _paragraph_sql(True), _paragraph_sql(False))


# ---------------------------------------------------------------------------
# edit-distance verification of LSH candidates (the high-precision pass)
# ---------------------------------------------------------------------------
EDIT_REL_MAX = 0.2  # near-dup iff levenshtein / max(len) <= 20%


def _edit_distance_sql(spark: bool) -> str:
    """Levenshtein verification over the MinHash-LSH candidate pairs: the
    classic two-stage near-dup pipeline (cheap recall stage -> exact edit
    distance only on candidates). Never all-pairs: the quadratic-cost
    levenshtein runs on the LSH-bucketed pair list, which is linear-ish in
    corpus size by construction. Integer edit distance + one division keep
    both engines bit-identical."""
    return f"""
    WITH cands AS (SELECT doc_a, doc_b FROM ({_minhash_sql(spark)})),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
             CAST(levenshtein(a.text, b.text) AS DOUBLE)
               / GREATEST(LENGTH(a.text), LENGTH(b.text)) AS rel_dist
      FROM cands c
      JOIN documents a ON a.doc_id = c.doc_a
      JOIN documents b ON b.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, edit_dist, rel_dist,
           CASE WHEN rel_dist <= {EDIT_REL_MAX} THEN 1 ELSE 0 END AS is_dup
    FROM verified
    ORDER BY doc_a, doc_b
    """


_register("dedup_edit_distance", _edit_distance_sql(True), _edit_distance_sql(False))


# ---------------------------------------------------------------------------
# incremental dedup: a NEW batch against the EXISTING corpus
# ---------------------------------------------------------------------------
BATCH_SOURCE = "src1"  # stands in for the newly-ingested batch


def _incremental_sql(spark: bool) -> str:
    """Ingestion-time dedup: keep a new batch's docs only if they don't
    near-duplicate the existing corpus. Same banded-LSH candidates as
    `dedup_minhash_lsh`, but the join is BATCH × CORPUS (not corpus × corpus):
    at 100 TB the corpus side's signatures are precomputed and stored once
    per table (they are per-row expressions), and the batch side is small —
    Catalyst broadcasts it, so incremental ingest never reshuffles the
    corpus. Emits every batch doc with its verdict and best corpus match.
    """
    w = words("text", spark=spark)
    sh = shingles("w", 3, spark=spark)
    aggs = ", ".join(minhash_min_aggs(MINHASH_K))
    distinct = "array_distinct" if spark else "list_distinct"
    size = "size" if spark else "len"
    inter = (
        f"{size}(array_intersect(b.sh, c.sh))"
        if spark
        else "len(list_intersect(b.sh, c.sh))"
    )
    cast_t = "STRING" if spark else "VARCHAR"
    digests = [
        "md5(concat_ws(',', "
        + ", ".join(
            f"CAST(m{b * ROWS_PER_BAND + r} AS {cast_t})"
            for r in range(ROWS_PER_BAND)
        )
        + "))"
        for b in range(BANDS)
    ]
    if spark:
        hint = f"/*+ REPARTITION({_RP}) */ "
        ex = (
            "SELECT doc_id, source, "
            + hash_int("s", spark=True, salt="mh")
            + " AS h FROM docs LATERAL VIEW OUTER explode(sh) t AS s"
        )
        bandrows = (
            "SELECT doc_id, source, pos AS band_no, digest FROM mh "
            f"LATERAL VIEW posexplode(array({', '.join(digests)})) t AS pos, digest"
        )
    else:
        hint = ""
        ex = (
            "SELECT doc_id, source, "
            + hash_int("unnest(sh)", spark=False, salt="mh")
            + " AS h FROM docs"
        )
        bandrows = (
            "SELECT doc_id, source, u.i - 1 AS band_no, u.d AS digest FROM "
            f"(SELECT doc_id, source, [{', '.join(digests)}] AS ds FROM mh) m, "
            "LATERAL (SELECT unnest(ds) AS d, "
            "generate_subscripts(ds, 1) AS i) u"
        )
    return f"""
    WITH raw AS (
      SELECT {hint}doc_id, source, text FROM documents
    ),
    docs AS (
      SELECT doc_id, source, {distinct}({sh}) AS sh
      FROM (SELECT doc_id, source, {w} AS w FROM raw)
    ),
    ex AS (
      {ex}
    ),
    mh AS (
      SELECT doc_id, source, {aggs} FROM ex GROUP BY doc_id, source
    ),
    bandrows AS (
      {bandrows}
    ),
    cands AS (
      SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
      FROM (SELECT * FROM bandrows WHERE source = '{BATCH_SOURCE}') b
      JOIN (SELECT * FROM bandrows WHERE source <> '{BATCH_SOURCE}') c
        ON b.band_no = c.band_no AND b.digest = c.digest
    ),
    verified AS (
      SELECT v.batch_id, v.corpus_id,
             CAST({inter} AS DOUBLE)
               / ({size}(b.sh) + {size}(c.sh) - {inter}) AS jaccard
      FROM cands v
      JOIN docs b ON b.doc_id = v.batch_id
      JOIN docs c ON c.doc_id = v.corpus_id
    ),
    best AS (
      SELECT batch_id, corpus_id, jaccard,
             ROW_NUMBER() OVER (PARTITION BY batch_id
                                ORDER BY jaccard DESC, corpus_id) AS rk
      FROM verified WHERE jaccard >= {JACCARD_MIN}
    )
    SELECT d.doc_id,
           CASE WHEN m.batch_id IS NULL THEN 1 ELSE 0 END AS keep,
           m.corpus_id AS dup_of,
           m.jaccard
    FROM (SELECT doc_id FROM documents WHERE source = '{BATCH_SOURCE}') d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) m ON d.doc_id = m.batch_id
    ORDER BY d.doc_id
    """


_register("dedup_incremental_batch", _incremental_sql(True), _incremental_sql(False))


# ---------------------------------------------------------------------------
# LSH banding quality: precision/recall of the candidate generator against
# exact Jaccard ground truth on a deterministic sample — the gauge that
# keeps BANDS x ROWS_PER_BAND tuning honest (more bands => recall up,
# precision down). Ground truth needs all-pairs Jaccard, which must never
# run corpus-wide; production evals it on a bounded sample, so the chain
# here is row-sampled up front (doc_id % SAMPLE_MOD = 0 on both arms) and
# the all-pairs stage touches (N/SAMPLE_MOD)^2 rows — a fixed, small eval
# set at any corpus size, while the LSH arm stays the production plan.
# ---------------------------------------------------------------------------
# 1-in-3 deterministic eval sample at test scale; in production the modulus
# scales with the corpus so the eval set stays fixed-size (the all-pairs
# stage is quadratic in the SAMPLE, never the corpus).
SAMPLE_MOD = 3


def _quality_agg(spark: bool, ca: str, cb: str) -> str:
    """Precision/recall count summary over the `truth` and `cands` CTEs.

    Spark branch: one FULL OUTER JOIN computes all three counts in a single
    evaluation of each arm. The scalar-subquery form (kept for the DuckDB
    oracle, which caches CTEs) makes Spark evaluate BOTH subtrees twice —
    once for the COUNT, once for the hits join — a measured 2x on the
    quality gauges whose truth arm is the expensive part. The oracle keeps
    the subquery text, so the driver gate proves the equivalence on every
    run."""
    if spark:
        return f"""agg AS (
      SELECT CAST(COUNT(t.{ca}) AS BIGINT) AS n_truth,
             CAST(COUNT(c.{ca}) AS BIGINT) AS n_cands,
             CAST(COUNT(CASE WHEN t.{ca} IS NOT NULL AND c.{ca} IS NOT NULL
                             THEN 1 END) AS BIGINT) AS n_hits
      FROM (SELECT {ca}, {cb} FROM truth) t
      FULL OUTER JOIN (SELECT {ca}, {cb} FROM cands) c
        ON c.{ca} = t.{ca} AND c.{cb} = t.{cb}
    )"""
    return f"""agg AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cands) AS n_cands,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
          JOIN cands c ON c.{ca} = t.{ca} AND c.{cb} = t.{cb}) AS n_hits
    )"""


def _lsh_quality_sql(spark: bool) -> str:
    """One summary row: truth pairs, LSH candidate pairs, their overlap,
    and precision/recall (exact small-int divisions -> bit-identical)."""
    w = words("text", spark=spark)
    sh = shingles("w", 3, spark=spark)
    aggs = ", ".join(minhash_min_aggs(MINHASH_K))
    distinct = "array_distinct" if spark else "list_distinct"
    size = "size" if spark else "len"
    inter = (
        f"{size}(array_intersect(a.sh, b.sh))"
        if spark
        else "len(list_intersect(a.sh, b.sh))"
    )
    cast_t = "STRING" if spark else "VARCHAR"
    digests = [
        "md5(concat_ws(',', "
        + ", ".join(
            f"CAST(m{b * ROWS_PER_BAND + r} AS {cast_t})"
            for r in range(ROWS_PER_BAND)
        )
        + "))"
        for b in range(BANDS)
    ]
    if spark:
        ex = (
            "SELECT doc_id, "
            + hash_int("s", spark=True, salt="mh")
            + " AS h FROM docs LATERAL VIEW OUTER explode(sh) t AS s"
        )
        bandrows = (
            "SELECT doc_id, pos AS band_no, digest FROM mh "
            f"LATERAL VIEW posexplode(array({', '.join(digests)})) t AS pos, digest"
        )
    else:
        ex = (
            "SELECT doc_id, "
            + hash_int("unnest(sh)", spark=False, salt="mh")
            + " AS h FROM docs"
        )
        bandrows = (
            "SELECT doc_id, u.i - 1 AS band_no, u.d AS digest FROM "
            f"(SELECT doc_id, [{', '.join(digests)}] AS ds FROM mh) m, "
            "LATERAL (SELECT unnest(ds) AS d, "
            "generate_subscripts(ds, 1) AS i) u"
        )
    jac = f"CAST({inter} AS DOUBLE) / ({size}(a.sh) + {size}(b.sh) - {inter})"
    if spark:
        # Truth arm re-expressed as a PREFIX-FILTERED set-similarity join
        # (guide §2.4/§3; Chaudhuri ICDE'06 / Xiao WWW'08 — the same shape
        # dedup_ssjoin_prefix ships). r9 used a plain shingle equi-join
        # (pairs sharing ANY shingle), whose cost is sum-over-shingles of
        # bucket^2 — fine on the sampled corpus, but one pathologically hot
        # shingle (a stop-phrase) recreates a skewed quadratic self-join at
        # scale (VERDICT r9 #5-carried/#7). Prefix filtering bounds exactly
        # that: each doc joins only on its n - ceil(t*n) + 1 RAREST
        # shingles (ascending corpus frequency, string tie-break), so a hot
        # shingle participates only for docs where it falls inside the
        # prefix. LOSSLESS for the t = JACCARD_MIN threshold by the
        # standard prefix theorem: if two docs' prefixes are disjoint then
        # |A∩B| <= ceil(t|A|)-1 < t|A| <= t|A∪B|, i.e. J < t — so every
        # truth pair survives candidate generation, and the exact
        # array_intersect verify (the oracle's own spelling) decides
        # membership bit-identically. The DuckDB oracle keeps the all-pairs
        # text, so the driver gate proves equivalence on every run.
        t_pct = int(JACCARD_MIN * 100)  # exact-integer prefix length
        p_len = f"n - (({t_pct} * n + 99) DIV 100) + 1"
        truth = f"""shx AS (
      SELECT doc_id, s FROM docs LATERAL VIEW OUTER explode(sh) t AS s
    ),
    sfreq AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM shx GROUP BY s
    ),
    sord AS (
      SELECT x.doc_id, x.s,
             ROW_NUMBER() OVER (PARTITION BY x.doc_id
                                ORDER BY f.df, x.s) AS rk,
             COUNT(*) OVER (PARTITION BY x.doc_id) AS n
      FROM shx x JOIN sfreq f ON f.s = x.s
    ),
    spre AS (
      SELECT doc_id, s FROM sord WHERE rk <= {p_len}
    ),
    tcand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM spre a JOIN spre b ON b.s = a.s AND b.doc_id > a.doc_id
    ),
    truth AS (
      SELECT c.doc_a, c.doc_b
      FROM tcand c
      JOIN docs a ON a.doc_id = c.doc_a
      JOIN docs b ON b.doc_id = c.doc_b
      WHERE {jac} >= {JACCARD_MIN}
    )"""
    else:
        truth = f"""truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM docs a JOIN docs b ON a.doc_id < b.doc_id
      WHERE {jac} >= {JACCARD_MIN}
    )"""
    agg = _quality_agg(spark, "doc_a", "doc_b")
    hint = f"/*+ REPARTITION({_RP}) */ " if spark else ""
    return f"""
    WITH raw AS (
      SELECT {hint}doc_id, text FROM documents WHERE doc_id % {SAMPLE_MOD} = 0
    ),
    docs AS (
      SELECT doc_id, {distinct}({sh}) AS sh
      FROM (SELECT doc_id, {w} AS w FROM raw)
    ),
    ex AS (
      {ex}
    ),
    mh AS (
      SELECT doc_id, {aggs} FROM ex GROUP BY doc_id
    ),
    bandrows AS (
      {bandrows}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandrows a
      JOIN bandrows b ON a.band_no = b.band_no AND a.digest = b.digest
                     AND a.doc_id < b.doc_id
    ),
    {truth},
    {agg}
    SELECT n_truth, n_cands, n_hits,
           CASE WHEN n_cands = 0 THEN NULL
                ELSE CAST(n_hits AS DOUBLE) / n_cands END AS precision_lsh,
           CASE WHEN n_truth = 0 THEN NULL
                ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall_lsh
    FROM agg
    """


_register("dedup_lsh_quality", _lsh_quality_sql(True), _lsh_quality_sql(False))


# ---------------------------------------------------------------------------
# simhash banding quality: the pigeonhole EXACTNESS of 16-bit chunk banding
# for Hamming <= HAMMING_MAX, measured — recall against exact all-pairs
# Hamming ground truth must be exactly 1.0 (a pair differing in <= 3 bits
# agrees on at least one of 4 chunks), and precision is the wasted-verify
# ratio that tunes CHUNK_BITS (wider chunks => fewer, purer buckets). Like
# dedup_lsh_quality, the quadratic truth arm runs only on the bounded
# 1-in-SAMPLE_MOD eval sample; the banded arm is the production plan.
# ---------------------------------------------------------------------------
def _simhash_quality_sql(spark: bool) -> str:
    h_lo = hash_int("token", spark=spark, salt="sh64a")
    h_hi = hash_int("token", spark=spark, salt="sh64b")

    def shift(i: int) -> str:
        col, k = ("hlo", i) if i < 32 else ("hhi", i - 32)
        if spark:
            return f"(shiftright({col}, {k}) & 1)"
        return f"(({col} >> {k}) & 1)"

    bit_sums = ", ".join(
        f"SUM(CASE WHEN {shift(i)} = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(PAIR_BITS)
    )
    chunk_exprs = []
    for c in range(N_CHUNKS):
        bits = " + ".join(
            f"(CASE WHEN s{c * CHUNK_BITS + k} > 0 THEN {1 << k} ELSE 0 END)"
            for k in range(CHUNK_BITS)
        )
        chunk_exprs.append(f"CAST({bits} AS BIGINT) AS c{c}")
    if spark:
        tok = ("SELECT doc_id, token FROM "
               f"(SELECT /*+ REPARTITION({_RP}) */ doc_id, text "
               f"FROM documents WHERE doc_id % {SAMPLE_MOD} = 0) "
               "LATERAL VIEW explode(split(text, ' ')) t AS token")
    else:
        tok = ("SELECT doc_id, unnest(string_split(text, ' ')) AS token "
               f"FROM documents WHERE doc_id % {SAMPLE_MOD} = 0")
    xor_hamming = " + ".join(
        f"bit_count(a.c{c} ^ b.c{c})" if spark else f"bit_count(xor(a.c{c}, b.c{c}))"
        for c in range(N_CHUNKS)
    )
    chunk_arr = ", ".join(f"c{c}" for c in range(N_CHUNKS))
    if spark:
        chunkrows = (
            "SELECT doc_id, pos AS chunk_no, v FROM fp "
            f"LATERAL VIEW posexplode(array({chunk_arr})) t AS pos, v"
        )
    else:
        chunkrows = (
            "SELECT doc_id, u.i - 1 AS chunk_no, u.v AS v FROM "
            f"(SELECT doc_id, [{chunk_arr}] AS cs FROM fp) m, "
            "LATERAL (SELECT unnest(cs) AS v, generate_subscripts(cs, 1) AS i) u"
        )
    return f"""
    WITH tok AS ({tok}),
    hashed AS (SELECT doc_id, {h_lo} AS hlo, {h_hi} AS hhi FROM tok),
    bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id),
    fp AS (SELECT doc_id, {', '.join(chunk_exprs)} FROM bits),
    chunkrows AS ({chunkrows}),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM chunkrows a
      JOIN chunkrows b ON a.chunk_no = b.chunk_no AND a.v = b.v
                      AND a.doc_id < b.doc_id
    ),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE {xor_hamming} <= {HAMMING_MAX}
    ),
    {_quality_agg(spark, "doc_a", "doc_b")}
    SELECT n_truth, n_cands, n_hits,
           CASE WHEN n_cands = 0 THEN NULL
                ELSE CAST(n_hits AS DOUBLE) / n_cands END AS precision_band,
           CASE WHEN n_truth = 0 THEN NULL
                ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall_band
    FROM agg
    """


_register("dedup_simhash_quality", _simhash_quality_sql(True), _simhash_quality_sql(False))


# ---------------------------------------------------------------------------
# hyperplane-LSH banding quality: precision/recall of the cosine candidate
# generator vs exact all-pairs cosine ground truth on the bounded 1-in-
# SAMPLE_MOD sample — completes the gauge family (MinHash-Jaccard, simhash-
# Hamming, ANN recall@k). Unlike simhash banding, hyperplane banding is
# probabilistic (P(candidate | cos 0.45) ~ 0.83 at 8x4 bits), so recall
# genuinely measures the banding parameters rather than verifying a proof.
# ---------------------------------------------------------------------------
def _embedding_quality_sql(spark: bool) -> str:
    cos = cosine("a.embedding", "b.embedding", spark=spark)
    arr = (lambda v: "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in v) + ")") if spark \
        else (lambda v: "[" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in v) + "]")
    band_cols = []
    for b in range(LSH_BANDS):
        bits = []
        for r in range(LSH_BITS_PER_BAND):
            j = b * LSH_BITS_PER_BAND + r
            d = dot_fold("embedding", arr(_hyperplane(j)), spark=spark)
            bits.append(f"(CASE WHEN {d} >= 0 THEN {1 << r} ELSE 0 END)")
        band_cols.append(" + ".join(bits) + f" AS band{b}")
    band_arr = ", ".join(f"band{b}" for b in range(LSH_BANDS))
    if spark:
        bandrows = (
            "SELECT vec_id, pos AS band_no, bucket FROM sigs "
            f"LATERAL VIEW posexplode(array({band_arr})) t AS pos, bucket"
        )
    else:
        bandrows = (
            "SELECT vec_id, u.i - 1 AS band_no, u.b AS bucket FROM "
            f"(SELECT vec_id, [{band_arr}] AS bs FROM sigs) m, "
            "LATERAL (SELECT unnest(bs) AS b, generate_subscripts(bs, 1) AS i) u"
        )
    if spark:
        # Per-vector norms computed ONCE (not per pair): the inline cosine
        # re-derives sqrt(dot(a,a)) and sqrt(dot(b,b)) for every one of the
        # (sample)^2 pairs — 3 sequential folds per pair; with norms
        # precomputed the pair predicate is 1 fold + 1 multiply. Identical
        # doubles: same fold expression per vector, same `dot / (na * nb)`
        # arithmetic order as the inline form (the oracle keeps the inline
        # text and proves it).
        truth = f"""normed AS (
      SELECT vec_id, embedding,
             SQRT({dot_fold('embedding', 'embedding', spark=True)}) AS nrm
      FROM sample
    ),
    truth AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM normed a JOIN normed b ON a.vec_id < b.vec_id
      WHERE {dot_fold('a.embedding', 'b.embedding', spark=True)}
              / (a.nrm * b.nrm) >= {COSINE_MIN}
    )"""
    else:
        truth = f"""truth AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM sample a JOIN sample b ON a.vec_id < b.vec_id
      WHERE {cos} >= {COSINE_MIN}
    )"""
    hint = f"/*+ REPARTITION({_RP}) */ " if spark else ""
    return f"""
    WITH sample AS (
      SELECT {hint}vec_id, embedding FROM embeddings WHERE vec_id % {SAMPLE_MOD} = 0
    ),
    sigs AS (
      SELECT vec_id, {', '.join(band_cols)}
      FROM sample
    ),
    bandrows AS ({bandrows}),
    cands AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bandrows a
      JOIN bandrows b ON a.band_no = b.band_no AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
    ),
    {truth},
    {_quality_agg(spark, "vec_a", "vec_b")}
    SELECT n_truth, n_cands, n_hits,
           CASE WHEN n_cands = 0 THEN NULL
                ELSE CAST(n_hits AS DOUBLE) / n_cands END AS precision_lsh,
           CASE WHEN n_truth = 0 THEN NULL
                ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall_lsh
    FROM agg
    """


_register("dedup_embedding_quality", _embedding_quality_sql(True), _embedding_quality_sql(False))


# ---------------------------------------------------------------------------
# exact set-similarity join via prefix filtering (ppjoin-style, r6)
# ---------------------------------------------------------------------------
# The LOSSLESS counterpart of MinHash-LSH, and the complete upgrade of
# dedup_ngram_jaccard's first-4-words blocking (which can miss pairs whose
# openings differ): ALL document pairs with 3-shingle-set Jaccard >=
# threshold, found without the all-pairs product. Prefix filtering
# (Chaudhuri et al. ICDE'06; Xiao et al. WWW'08): order every document's
# distinct shingles by ascending corpus frequency (rarest first, string
# tie-break); two sets with |A∩B|/|A∪B| >= t MUST share an element inside
# each one's first n - ceil(t·n) + 1 — so candidates come from an
# equi-join on PREFIX shingles only, and rare-shingle prefixes keep the
# join small exactly where naive token joins explode. Candidates are then
# verified with the exact intersection. Unlike LSH there are no false
# negatives — recall is definitionally 1 (pinned vs brute force in tests).
#
# Determinism: prefix length n - ceil(t·n) + 1 is computed in integer
# arithmetic (ceil(7n/10) = (7n+9) DIV 10); jaccard_ppm is an exact
# integer-derived FLOOR. Scale shape: token frequencies = one
# map-side-combinable shuffle; per-doc ordering = one window over doc_id;
# the candidate join runs on prefix tokens only; verification joins two
# sorted-array columns (array_intersect) on the bounded candidate set.
SSJOIN_T_PCT = 70  # Jaccard threshold as integer percent


def _ssjoin_sql(spark: bool) -> str:
    w = words("text", spark=spark)
    sh = shingles("w", 3, spark=spark)
    distinct = "array_distinct" if spark else "list_distinct"
    t = SSJOIN_T_PCT
    if spark:
        # OUTER explode + repartitioned source: same pathology and fix as
        # _minhash_sql (inferred size(shs)>0 filter re-ran the shingle
        # pipeline per scan at single-file parallelism). shs is structurally
        # non-empty/non-null, so OUTER is row-identical.
        tok = (f"SELECT doc_id, w FROM (SELECT doc_id, {distinct}({sh}) AS shs "
               f"FROM (SELECT /*+ REPARTITION({_RP}) */ doc_id, {w} AS w "
               f"FROM documents)) "
               f"LATERAL VIEW OUTER explode(shs) t AS w")
        inter = "size(array_intersect(sa.ws, sb.ws))"
        collect = "sort_array(collect_list(w))"
    else:
        tok = (f"SELECT doc_id, unnest({distinct}({sh})) AS w "
               f"FROM (SELECT doc_id, {w} AS w FROM documents)")
        inter = ("len(list_filter(sa.ws, x -> list_contains(sb.ws, x)))")
        collect = "list_sort(list(w))"
    return f"""
    WITH toks AS ({tok}),
    freq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY w
    ),
    ordered AS (
      SELECT t.doc_id, t.w,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY f.df, t.w) AS rk,
             COUNT(*) OVER (PARTITION BY t.doc_id) AS n
      FROM toks t JOIN freq f ON f.w = t.w
    ),
    prefix AS (
      SELECT doc_id, w FROM ordered
      WHERE rk <= n - (({t} * n + 99) {"DIV" if spark else "//"} 100) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM prefix a JOIN prefix b
        ON b.w = a.w AND b.doc_id > a.doc_id
    ),
    sets AS (
      SELECT doc_id, {collect} AS ws, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks GROUP BY doc_id
    )
    SELECT c.da, c.db,
           CAST(FLOOR(CAST({inter} AS DOUBLE) * 1000000
                      / (sa.n + sb.n - {inter})) AS BIGINT) AS jaccard_ppm
    FROM cand c
    JOIN sets sa ON sa.doc_id = c.da
    JOIN sets sb ON sb.doc_id = c.db
    WHERE CAST({inter} AS DOUBLE) / (sa.n + sb.n - {inter}) >= {t} / 100.0
    ORDER BY c.da, c.db
    """


_register("dedup_ssjoin_prefix", _ssjoin_sql(True), _ssjoin_sql(False))
