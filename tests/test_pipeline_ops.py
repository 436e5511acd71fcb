"""Differential tests for the training-data pipeline operators.

Runs at sf0.001 (like the TPC-H battery); the cross-engine primitives these
rely on (md5 hex→int, sequential float folds) are additionally pinned by
direct equality probes so a drift in either engine fails loudly.
"""

from __future__ import annotations

import duckdb
import pytest

from bemidb_spark.operators import curation, dedup, similarity, text
from bemidb_spark.oracle import compare

ALL = {}
for mod in (dedup, similarity, text, curation):
    ALL.update({name: (mod.QUERIES[name], mod.ORACLES[name]) for name in mod.QUERIES})


@pytest.mark.parametrize("name", sorted(ALL))
def test_pipeline_oracle_parity(spark, sf_dir, name):
    fn, oracle = ALL[name]
    compare(fn(spark, sf_dir), oracle, sf_dir)


def test_hash_int_primitive_parity(spark):
    """The md5-hex→BIGINT primitive must agree bit-for-bit across engines."""
    from bemidb_spark.operators._xengine import hash_int

    vals = ["", "a", "hello world", "Ωµ—emoji🙂", "0"]
    s = spark.sql(
        "SELECT " + ", ".join(
            hash_int(f"'{v}'", spark=True, salt="t") + f" AS h{i}"
            for i, v in enumerate(vals)
        )
    ).collect()[0]
    d = duckdb.connect().execute(
        "SELECT " + ", ".join(
            hash_int(f"'{v}'", spark=False, salt="t") + f" AS h{i}"
            for i, v in enumerate(vals)
        )
    ).fetchone()
    assert tuple(s) == d


def test_fold_primitive_parity(spark):
    """Sequential-fold dot product must agree bit-for-bit across engines."""
    from bemidb_spark.operators._xengine import dot_fold

    a = [0.1, 0.25, 1e-7, 3.5, -2.25]
    b = [1.5, -0.5, 2e6, 0.125, 0.3]
    lit_s = "array(" + ",".join(f"CAST({x} AS FLOAT)" for x in a) + ")"
    lit_s2 = "array(" + ",".join(f"CAST({x} AS FLOAT)" for x in b) + ")"
    lit_d = "[" + ",".join(f"CAST({x} AS FLOAT)" for x in a) + "]"
    lit_d2 = "[" + ",".join(f"CAST({x} AS FLOAT)" for x in b) + "]"
    s = spark.sql(f"SELECT {dot_fold(lit_s, lit_s2, spark=True)} AS d").collect()[0].d
    d = duckdb.connect().execute(
        f"SELECT {dot_fold(lit_d, lit_d2, spark=False)}"
    ).fetchone()[0]
    assert s == d


def test_minhash_finds_planted_near_dups(spark, sf_dir_med):
    """At sf0.01 the corpus contains planted near-dup pairs; LSH must find them."""
    df = dedup.QUERIES["dedup_minhash_lsh"](spark, sf_dir_med)
    rows = df.collect()
    assert len(rows) >= 20
    assert all(r.jaccard >= dedup.JACCARD_MIN for r in rows)


def test_ivf_kmeans_cells_are_data_dependent(spark, sf_dir):
    """k-means cells must reflect vector locality, not vec_id arithmetic: at
    least one vector must land in a different cell than its vec_id % K init,
    and cell sizes must be non-uniform (data-driven)."""
    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    similarity._kmeans_views(spark)  # materialized index (round-3 shape)
    rows = spark.sql(
        "SELECT cell, COUNT(*) AS n, "
        f"SUM(CASE WHEN cell <> vec_id % {similarity.N_CELLS} THEN 1 ELSE 0 END)"
        " AS moved FROM _km_cells GROUP BY cell ORDER BY cell"
    ).collect()
    sizes = [r.n for r in rows]
    assert sum(r.moved for r in rows) > 0  # assignment actually moved vectors
    assert len(set(sizes)) > 1  # non-uniform, data-driven cells


def test_ivf_recall_vs_exact_topk(spark, sf_dir):
    """recall@5 of IVF against the exact brute-force ranking; with real
    centroids and NPROBE=2 of 8 cells this must be well above chance
    (NPROBE/K = 25%)."""
    exact = similarity.QUERIES["ann_cosine_topk"](spark, sf_dir).collect()
    approx = similarity.QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    hits = total = 0
    for r in approx:
        total += 1
        if r.cand_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total > 0
    recall = hits / total
    assert recall >= 0.5, f"recall@{similarity.TOP_K} = {recall}"


def test_cosine_lsh_recall_and_pruning(spark, sf_dir):
    """The hyperplane-LSH blocker must (a) beat the old label-blocking recall
    against the exact all-pairs truth and (b) generate strictly fewer
    candidates than all-pairs (the pruning that makes it scale)."""
    from bemidb_spark.operators._xengine import cosine
    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    cos = cosine("a.embedding", "b.embedding", spark=True)
    exact = {(r.vec_a, r.vec_b) for r in spark.sql(f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {cos} >= {dedup.COSINE_MIN}""").collect()}
    label_blocked = {(r.vec_a, r.vec_b) for r in spark.sql(f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {cos} >= {dedup.COSINE_MIN}""").collect()}
    lsh = {(r.vec_a, r.vec_b)
           for r in dedup.QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()}
    assert lsh <= exact  # verification step keeps only true pairs
    assert len(lsh) / len(exact) >= 0.6
    assert len(lsh) / len(exact) > len(label_blocked) / len(exact)
    # pruning: candidate set well under all-pairs
    sql = dedup._embedding_sql(True)
    cands_sql = sql.split(")\n    SELECT c.vec_a")[0] + \
        ") SELECT COUNT(*) AS n FROM (SELECT DISTINCT vec_a, vec_b FROM cands)"
    n = spark.sql("SELECT COUNT(*) AS n FROM embeddings").collect()[0].n
    cands = spark.sql(cands_sql).collect()[0].n
    assert cands < 0.5 * n * (n - 1) / 2


def test_simhash64_banding_exact_and_pruning(spark, sf_dir):
    """On a diverse corpus (unlike the template-generated test corpus, whose
    fingerprints all cluster), 16-bit chunk banding must find EVERY pair with
    Hamming <= 3 (pigeonhole: <=3 flipped bits leave >=1 of 4 chunks equal)
    while generating a small fraction of all-pairs as candidates."""
    import random

    from bemidb_spark.tables import register_views

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50_000)]
    docs = []
    for d in range(1500):
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(40))))
    planted = []
    for p in range(20):  # near-dup: copy with one token swapped -> tiny Hamming
        base_id, base_text = docs[p * 3]
        toks = base_text.split()
        toks[5] = rng.choice(vocab)
        dup_id = 10_000 + p
        docs.append((dup_id, " ".join(toks)))
        planted.append((base_id, dup_id))
    spark.createDataFrame(docs, "doc_id bigint, text string") \
        .createOrReplaceTempView("documents")
    try:
        pairs_sql = dedup._simhash_pairs_sql(True)
        found = {(r.doc_a, r.doc_b) for r in spark.sql(pairs_sql).collect()}
        hamming_sql = pairs_sql.replace(
            f"WHERE {' + '.join(f'bit_count(a.c{c} ^ b.c{c})' for c in range(dedup.N_CHUNKS))} <= {dedup.HAMMING_MAX}",
            "WHERE 1 = 1",
        )
        # every planted pair within the threshold must be found (exactness)
        all_pairs = {(r.doc_a, r.doc_b): r.hamming
                     for r in spark.sql(hamming_sql).collect()
                     if (r.doc_a, r.doc_b) in set(planted)}
        within = {p for p, hm in all_pairs.items() if hm <= dedup.HAMMING_MAX}
        assert len(within) >= 10  # one-token edits stay under the threshold
        assert within <= found
        # pruning: candidates a small fraction of all-pairs
        cands_sql = pairs_sql.split(")\n    SELECT c.doc_a")[0] + \
            ") SELECT COUNT(*) AS n FROM (SELECT DISTINCT doc_a, doc_b FROM cands)"
        n = 1520
        cands = spark.sql(cands_sql).collect()[0].n
        assert cands < 0.05 * n * (n - 1) / 2
    finally:
        register_views(spark, sf_dir)  # restore the shared documents view


def test_decontamination_flags_planted_eval_dups(spark, sf_dir_med):
    """Docs sharing many 5-grams with the eval split (near-copies of eval
    docs) must be flagged; unrelated docs must not be."""
    df = curation.QUERIES["decontaminate_eval_overlap"](spark, sf_dir_med)
    rows = df.collect()
    flagged = [r for r in rows if r.contaminated == 1]
    assert len(flagged) >= 1
    # flagged docs share far more 5-grams than the unflagged background
    assert min(r.shared_ngrams for r in flagged) >= curation.DECON_MIN_SHARED
    clean = [r.shared_ngrams for r in rows if r.contaminated == 0]
    assert max(clean, default=0) < curation.DECON_MIN_SHARED


def test_dup_clusters_cover_pairs_and_pick_min_canonical(spark, sf_dir_med):
    """Every near-dup pair must land in one cluster; the canonical member is
    the cluster min; sizes are consistent."""
    pairs = {(r.doc_a, r.doc_b)
             for r in spark.sql(dedup._minhash_sql(True)).collect()}
    labels = {r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
              for r in curation.QUERIES["dedup_dup_clusters"](spark, sf_dir_med).collect()}
    assert pairs, "corpus has planted near-dup pairs"
    for a, b in pairs:
        assert labels[a][0] == labels[b][0], (a, b)
    from collections import Counter

    members = Counter(cl for cl, _, _ in labels.values())
    for doc, (cl, size, canon) in labels.items():
        assert size == members[cl]
        assert canon == (1 if doc == cl else 0)
        assert cl <= doc


def test_incremental_batch_dedup_verdicts(spark, sf_dir):
    from bemidb_spark.operators import dedup
    from bemidb_spark.oracle import compare

    compare(dedup.QUERIES["dedup_incremental_batch"](spark, sf_dir),
            dedup.ORACLES["dedup_incremental_batch"], sf_dir)
    rows = dedup.QUERIES["dedup_incremental_batch"](spark, sf_dir).collect()
    # every batch doc gets exactly one verdict; dropped docs cite a corpus doc
    assert all((r.keep == 1) == (r.dup_of is None) for r in rows)
    assert any(r.keep == 0 for r in rows)  # the corpus plants near-dups


def test_hard_negatives_cross_label_only(spark, sf_dir):
    from bemidb_spark.operators import similarity
    from bemidb_spark.oracle import compare

    compare(similarity.QUERIES["ann_hard_negatives"](spark, sf_dir),
            similarity.ORACLES["ann_hard_negatives"], sf_dir)
    rows = similarity.QUERIES["ann_hard_negatives"](spark, sf_dir).collect()
    assert all(r.anchor_label != r.neg_label for r in rows)
    assert len({r.anchor_id for r in rows}) == similarity.N_QUERIES


def test_readability_structure(spark, sf_dir):
    from bemidb_spark.operators import text
    from bemidb_spark.oracle import compare

    compare(text.QUERIES["text_readability"](spark, sf_dir),
            text.ORACLES["text_readability"], sf_dir)
    rows = text.QUERIES["text_readability"](spark, sf_dir).collect()
    assert all(r.mean_word_len > 0 for r in rows)
    assert all(0.0 <= r.long_word_ratio <= 1.0 for r in rows)


def test_bm25_scores_rank_term_hits(spark, sf_dir):
    """BM25 top-k: every returned doc hits at least one query term, scores
    are positive and non-increasing, and the median-free plan shape holds
    (one corpus aggregate, no global sort — ORDER BY..LIMIT is top-k)."""
    from bemidb_spark.operators import text

    rows = text.QUERIES["text_bm25_topk"](spark, sf_dir).collect()
    assert len(rows) == text.BM25_TOP
    assert all(r.tf0 + r.tf1 + r.tf2 > 0 for r in rows)
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    df = text.QUERIES["text_bm25_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


def test_norm_filter_median_is_exact_order_statistic(spark, sf_dir):
    """The staged two-phase median must select the same element as a direct
    sort (lower median), and the result must be partition-invariant."""
    from bemidb_spark.operators import similarity

    df = similarity.QUERIES["embedding_norm_filter"](spark, sf_dir)
    rows = df.collect()
    norms = sorted(r.l2_norm for r in rows)
    expect = norms[(len(norms) + 1) // 2 - 1]  # lower median, 1-based rank
    assert all(r.med_l2 == expect for r in rows)
    assert all((r.keep == 1) == (0.5 * expect <= r.l2_norm <= 2.0 * expect
                                 and r.l2_norm > 0.0) for r in rows)


def test_recall_entry_matches_recomputation(spark, sf_dir):
    """ann_recall_at_k must equal the recall recomputed from the two
    registered arms (exact top-k ∩ IVF top-k), per query."""
    got = {r.query_id: r for r in
           similarity.QUERIES["ann_recall_at_k"](spark, sf_dir).collect()}
    exact_sets, ivf_sets = {}, {}
    for r in similarity.QUERIES["ann_cosine_topk"](spark, sf_dir).collect():
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    for r in similarity.QUERIES["ann_ivf_topk"](spark, sf_dir).collect():
        ivf_sets.setdefault(r.query_id, set()).add(r.cand_id)
    assert set(got) == set(exact_sets)
    for q, ex in exact_sets.items():
        hits = len(ex & ivf_sets.get(q, set()))
        assert got[q].n_exact == similarity.TOP_K
        assert got[q].n_hits == hits
        assert got[q].recall_at_k == hits / similarity.TOP_K


def test_lsh_quality_gauge_sane(spark, sf_dir):
    """The banding quality gauge must be non-degenerate on the eval sample
    (truth and candidate sets both non-empty) and internally consistent."""
    row = dedup.QUERIES["dedup_lsh_quality"](spark, sf_dir).collect()[0]
    assert row.n_truth > 0 and row.n_cands > 0
    assert row.n_hits <= min(row.n_truth, row.n_cands)
    assert row.precision_lsh == row.n_hits / row.n_cands
    assert row.recall_lsh == row.n_hits / row.n_truth
    # 8x2 banding at jaccard 0.5 catches ~90% of true pairs; on the planted
    # corpus it should not miss more than half
    assert row.recall_lsh >= 0.5


def test_simhash_banding_is_pigeonhole_exact(spark, sf_dir):
    """Chunk banding must recall EVERY true Hamming<=3 pair (pigeonhole:
    <=3 differing bits cannot touch all 4 chunks) — recall is exactly 1.0,
    not approximately."""
    row = dedup.QUERIES["dedup_simhash_quality"](spark, sf_dir).collect()[0]
    assert row.n_truth > 0
    assert row.recall_band == 1.0
    assert row.n_hits == row.n_truth
    assert 0 < row.precision_band <= 1.0


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """The lowest doc_id is all-first-occurrences (novelty 1.0); planted
    near-duplicates of earlier docs sit near 0; every ratio is in (0, 1]."""
    rows = text.QUERIES["text_novelty_ratio"](spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    first = min(by_id)
    assert by_id[first].novelty == 1.0
    assert all(0 <= r.novelty <= 1.0 and r.n_novel <= r.n_shingles for r in rows)
    assert any(r.novelty < 0.2 for r in rows)  # planted dups add ~nothing


def test_probe_sweep_monotone_and_exact_at_full_probe(spark, sf_dir):
    """Recall must be non-decreasing in the probe budget, agree with the
    registered single-point recall entry at np=NPROBE, and hit exactly 1.0
    at np=N_CELLS (probing every cell IS brute force)."""
    rows = {r.np: r for r in
            similarity.QUERIES["ann_probe_sweep"](spark, sf_dir).collect()}
    assert set(rows) == set(range(1, similarity.N_CELLS + 1))
    rec = [rows[np].recall for np in range(1, similarity.N_CELLS + 1)]
    assert all(a <= b for a, b in zip(rec, rec[1:]))
    assert rows[similarity.N_CELLS].recall == 1.0
    point = similarity.QUERIES["ann_recall_at_k"](spark, sf_dir).collect()
    agg = sum(r.n_hits for r in point) / sum(r.n_exact for r in point)
    assert rows[similarity.NPROBE].recall == agg


def test_embedding_lsh_quality_beats_chance(spark, sf_dir):
    """Hyperplane banding recall on true cosine pairs must beat the share
    of all pairs that are candidates (i.e., the blocker is informative,
    not a random subset), with internally consistent counts."""
    row = dedup.QUERIES["dedup_embedding_quality"](spark, sf_dir).collect()[0]
    assert row.n_truth > 0 and row.n_cands > 0
    assert row.n_hits <= min(row.n_truth, row.n_cands)
    n_sample = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(f"vec_id % {dedup.SAMPLE_MOD} = 0").count())
    all_pairs = n_sample * (n_sample - 1) // 2
    chance = row.n_cands / all_pairs
    assert row.recall_lsh > chance


def test_contamination_span_matches_python_recompute(spark, sf_dir):
    """Gaps-and-islands span detection matches an exact Python recompute."""
    rows = {r.doc_id: r
            for r in curation.QUERIES["contamination_span_max"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    def sh5(t):
        ws = t.split(" ")
        if len(ws) < curation.DECON_NGRAM:
            return [" ".join(ws)]
        n = curation.DECON_NGRAM
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]

    ev = set()
    for d in docs:
        if d.source == curation.EVAL_SOURCE:
            ev.update(sh5(d.text))
    for d in docs:
        if d.source == curation.EVAL_SOURCE:
            assert d.doc_id not in rows
            continue
        hits = [i for i, s in enumerate(sh5(d.text)) if s in ev]
        best = run = 0
        prev = None
        for p in hits:
            run = run + 1 if prev is not None and p == prev + 1 else 1
            best = max(best, run)
            prev = p
        r = rows[d.doc_id]
        assert r.contaminated_positions == len(hits), d.doc_id
        assert r.max_contiguous_span == best, d.doc_id
        assert r.span_flagged == (1 if best >= curation.SPAN_FLAG_MIN else 0)


def test_contamination_span_flags_planted_eval_copies(spark, sf_dir_med):
    """Near-copies of eval docs carry long verbatim spans; span-flagged docs
    must be a subset of count-contaminated docs (a span is shared shingles)."""
    spans = {r.doc_id: r for r in
             curation.QUERIES["contamination_span_max"](spark, sf_dir_med).collect()}
    counts = {r.doc_id: r for r in
              curation.QUERIES["decontaminate_eval_overlap"](spark, sf_dir_med).collect()}
    flagged = [d for d, r in spans.items() if r.span_flagged == 1]
    assert flagged, "planted eval near-copies should carry contiguous spans"
    for d in flagged:
        assert counts[d].shared_ngrams > 0


def test_nb_quality_classifier_separates_train_sources(spark, sf_dir):
    """The naive-Bayes log-odds must be higher on the trusted training
    sources than the untrusted ones (it trained on them), scores must be
    integral micro-nats, and every document must be scored."""
    import __spark_entry__ as entry_mod

    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    df = entry_mod.queries()["text_nb_quality_classifier"](spark, sf_dir)
    df.createOrReplaceTempView("nb_scores")
    n_docs = spark.table("documents").count()
    assert spark.table("nb_scores").count() == n_docs

    from bemidb_spark.operators.text import NB_NEG_SOURCES, NB_POS_SOURCES
    pos = ", ".join(f"'{s}'" for s in NB_POS_SOURCES)
    neg = ", ".join(f"'{s}'" for s in NB_NEG_SOURCES)
    row = spark.sql(f"""
        SELECT avg(CASE WHEN d.source IN ({pos}) THEN s.score_unats END) AS m_pos,
               avg(CASE WHEN d.source IN ({neg}) THEN s.score_unats END) AS m_neg
        FROM nb_scores s JOIN documents d ON d.doc_id = s.doc_id
    """).collect()[0]
    assert row.m_pos > row.m_neg, (row.m_pos, row.m_neg)


def test_bigram_logprob_scores_every_multiword_doc(spark, sf_dir):
    """Every document with >= 2 words gets a score; scores are negative
    (log-probabilities) and integral micro-nats; repeated text (high corpus
    bigram frequency) scores higher per-bigram than unique text."""
    import __spark_entry__ as entry_mod

    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    df = entry_mod.queries()["text_bigram_logprob"](spark, sf_dir)
    rows = df.collect()
    n_multi = spark.sql(
        "SELECT COUNT(*) AS n FROM documents WHERE size(split(text, ' ')) >= 2"
    ).collect()[0].n
    assert len(rows) == n_multi
    for r in rows:
        assert r.logprob_unats < 0 and r.n_bigrams >= 1
        assert r.mean_unats <= 0


def test_ssjoin_prefix_is_lossless_vs_brute_force(spark, sf_dir):
    """Prefix filtering must be complete: the operator's pairs equal the
    brute-force all-pairs shingle-Jaccard >= t result exactly (no LSH-style
    misses), including the ppm values."""
    import __spark_entry__ as entry_mod

    from bemidb_spark.tables import register_views

    register_views(spark, sf_dir)
    got = {(r.da, r.db, r.jaccard_ppm) for r in entry_mod.queries()[
        "dedup_ssjoin_prefix"](spark, sf_dir).collect()}
    brute = {(r.da, r.db, r.jaccard_ppm) for r in spark.sql("""
        WITH sets AS (
          SELECT doc_id,
                 array_distinct(CASE WHEN size(w) < 3
                   THEN array(array_join(w, ' '))
                   ELSE transform(sequence(1, size(w) - 2),
                                  i -> array_join(slice(w, i, 3), ' ')) END) AS sh
          FROM (SELECT doc_id, split(text, ' ') AS w FROM documents)
        )
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(FLOOR(CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE)
                    * 1000000 / (size(a.sh) + size(b.sh)
                                 - size(array_intersect(a.sh, b.sh))))
                    AS BIGINT) AS jaccard_ppm
        FROM sets a JOIN sets b ON b.doc_id > a.doc_id
        WHERE CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE)
              / (size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh)))
              >= 0.7
    """).collect()}
    assert got == brute
    assert got, "corpus has no near-dup pairs at t=0.7 — test is vacuous"


def test_pg_ivf_orderby_route_probes_and_recall(spark, sf_dir):
    """The ivfflat-indexed `ORDER BY embedding <-> q LIMIT k` route must
    (a) run the probe-pruned plan — its physical plan reads the
    CHECKPOINTED index views, not a parquet scan of the full corpus, and
    limits the centroid side to NPROBE — and (b) recall >= the monitored
    ann_recall_at_k floor against the exact brute-force top-k."""
    from bemidb_spark.operators.pgpath import (
        QUERIES as PGQ, _IVF_QV_TEXT, _IVF_K,
    )
    from bemidb_spark.pgcompat.session import PgSession

    df = PGQ["pg_ivf_orderby_route"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower(), "probe plan must not rescan parquet"
    assert f"limit={similarity.NPROBE}" in plan.lower().replace(" ", "") or \
        "globallimit 3" in plan.lower() or "limit 3" in plan.lower(), plan
    approx = {r.vec_id for r in df.collect()}
    assert len(approx) == _IVF_K

    # exact top-k: the UNindexed path (no CREATE INDEX -> full scan-and-sort)
    pg = PgSession(spark)
    exact_df = pg.execute(
        f"SELECT vec_id FROM embeddings "
        f"ORDER BY embedding <-> '{_IVF_QV_TEXT}'::vector LIMIT {_IVF_K}")
    exact_plan = exact_df._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in exact_plan.lower()  # unindexed IS the full scan
    exact = {r.vec_id for r in exact_df.collect()}
    recall = len(approx & exact) / float(_IVF_K)
    assert recall >= 0.6, recall  # ann_recall_at_k floor (monitored 0.68)


def test_min_by_assignment_matches_window_form_with_ties(spark):
    """r10: the Spark side of similarity._assign_select is a min_by
    aggregate (map-side combinable, no sort); the window form stays in the
    DuckDB oracle. Pin the argmin equivalence on a crafted corpus that
    includes EXACT distance ties — the struct(dist, cell) ordering must
    break them by cell exactly like ROW_NUMBER's ORDER BY dist, cell."""
    from bemidb_spark.operators import similarity as S

    # v0 equidistant from both centroids (tie -> cell 0); v1/v2 clear picks
    rows = [(0, [0.0] * S.DIM), (1, [1.0] + [0.0] * (S.DIM - 1)),
            (2, [-1.0] + [0.0] * (S.DIM - 1))]
    orig = spark.table("embeddings") if spark.catalog.tableExists("embeddings") else None
    spark.createDataFrame(rows, "vec_id bigint, embedding array<float>") \
        .createOrReplaceTempView("embeddings")
    try:
        cents = [(0, [0.5] + [0.0] * (S.DIM - 1)),
                 (1, [-0.5] + [0.0] * (S.DIM - 1))]
        spark.createDataFrame(cents, "cell bigint, centroid array<double>") \
            .createOrReplaceTempView("_tie_cents")
        got = sorted(map(tuple, spark.sql(
            S._assign_select("_tie_cents", True)
        ).selectExpr("vec_id", "cell").collect()))
        # reference: the window form the oracle runs, executed in Spark
        dist = S._dist("v.embedding", "ct.centroid", True)
        want = sorted(map(tuple, spark.sql(f"""
            SELECT vec_id, cell FROM (
              SELECT v.vec_id, ct.cell,
                     ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                        ORDER BY {dist} ASC, ct.cell) AS ark
              FROM embeddings v CROSS JOIN _tie_cents ct
            ) WHERE ark = 1""").collect()))
        assert got == want
        assert dict(got)[0] == 0  # the tie really broke by cell
    finally:
        spark.catalog.dropTempView("_tie_cents")
        if orig is not None:
            orig.createOrReplaceTempView("embeddings")
