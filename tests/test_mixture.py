"""Dataset-assembly operators (operators/mixture.py) vs the DuckDB oracle,
plus property checks the oracle can't express (split stability, weight caps,
boilerplate monotonicity)."""

from __future__ import annotations

import pytest

from bemidb_spark.operators import mixture as mx
from bemidb_spark.oracle import compare

ALL = sorted(mx.QUERIES)


@pytest.mark.parametrize("name", ALL)
def test_oracle_parity(spark, sf_dir, name):
    compare(mx.QUERIES[name](spark, sf_dir), mx.ORACLES[name], sf_dir)


def test_split_is_partition_invariant(spark, sf_dir):
    df = mx.QUERIES["split_train_valid_test"](spark, sf_dir)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in df.repartition(7).collect())
    assert a == b
    splits = {r["split"] for r in df.collect()}
    assert splits == {"train", "valid", "test"}
    n = df.count()
    n_train = df.where("split = 'train'").count()
    assert 0.6 * n < n_train < 0.95 * n  # ~80% expected


def test_mixture_weights_capped_and_normalizing(spark, sf_dir):
    rows = mx.QUERIES["mixture_resample_weights"](spark, sf_dir).collect()
    assert all(0 < r["weight"] <= mx.WEIGHT_CAP for r in rows)
    # uncapped groups resample to ~uniform token share
    tot = sum(r["n_tokens"] for r in rows)
    uniform = tot / len(rows)
    for r in rows:
        if r["weight"] < mx.WEIGHT_CAP:
            assert abs(r["resampled_tokens"] - uniform) < 2

def test_unigram_score_orders_by_rarity(spark, sf_dir):
    rows = mx.QUERIES["unigram_logprob_score"](spark, sf_dir).collect()
    assert all(r["avg_neg_logprob"] > 0 for r in rows)
    assert len(rows) == 500 if "0.01" in sf_dir else len(rows) > 0


def test_boilerplate_counts_consistent(spark, sf_dir):
    rows = mx.QUERIES["boilerplate_line_strip"](spark, sf_dir).collect()
    assert all(r["n_boilerplate"] <= r["n_segments"] for r in rows)
    assert any(r["n_boilerplate"] > 0 for r in rows)  # corpus has planted dups


def test_bpe_candidates_shape(spark, sf_dir):
    rows = mx.QUERIES["bpe_merge_candidates"](spark, sf_dir).collect()
    assert len(rows) == mx.BPE_TOP_K
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


def test_outlier_rate_tracks_pct(spark, sf_dir):
    df = mx.QUERIES["embedding_centroid_outliers"](spark, sf_dir)
    n = df.count()
    n_out = df.where("is_outlier = 1").count()
    # rank cut flags ceil(n_label * pct) per label: within a label of rounding
    n_labels = df.select("label").distinct().count()
    assert mx.OUTLIER_PCT * n <= n_out <= mx.OUTLIER_PCT * n + n_labels


def test_budget_threshold_monotone(spark, sf_dir):
    rows = mx.QUERIES["quality_budget_threshold"](spark, sf_dir).collect()
    # rows come qbin DESC; cum_tokens strictly increases down the list
    cums = [r["cum_tokens"] for r in rows]
    assert cums == sorted(cums)
    flags = [r["in_budget"] for r in rows]
    # in_budget is a prefix of the quality-descending list
    assert flags == sorted(flags, reverse=True)
    assert 0 < sum(flags) < len(flags)


def test_bpe_topk_plans_without_global_sort(spark, sf_dir):
    df = mx.QUERIES["bpe_merge_candidates"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_split_and_mixture_plans_have_no_join(spark, sf_dir):
    # split is a pure per-row projection: no shuffle at all
    plan = mx.QUERIES["split_train_valid_test"](spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan.split("Sort")[0] or "rangepartitioning" in plan
    # mixture: one aggregate + a 1-row cross join (broadcast), never a
    # shuffle join of the corpus against itself
    plan2 = mx.QUERIES["mixture_resample_weights"](spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SortMergeJoin" not in plan2


def test_shard_manifest_covers_corpus(spark, sf_dir):
    rows = mx.QUERIES["export_shard_manifest"](spark, sf_dir).collect()
    assert len(rows) == mx.N_SHARDS
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == total
    # shard assignment is partition-invariant (same manifest any layout)
    again = mx.QUERIES["export_shard_manifest"](spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_source_overlap_symmetric_pairs(spark, sf_dir):
    rows = mx.QUERIES["source_overlap_matrix"](spark, sf_dir).collect()
    assert all(r.source_a < r.source_b for r in rows)
    assert all(r.shared_segments > 0 for r in rows)


def test_vocab_coverage_bounds(spark, sf_dir):
    rows = mx.QUERIES["vocab_coverage_score"](spark, sf_dir).collect()
    assert all(0.0 <= r.coverage <= 1.0 for r in rows)
    assert all(r.n_in_vocab <= r.n_tokens for r in rows)
    # the corpus vocab is small, so most tokens should be covered
    assert sum(r.n_in_vocab for r in rows) > 0.5 * sum(r.n_tokens for r in rows)


def test_shuffle_assign_is_a_permutation(spark, sf_dir):
    """(shard, pos) is a bijection over docs: positions are dense 1..n per
    shard, the mapping is input-partitioning-invariant, and a different salt
    would re-deal (spot-checked via the hash key's spread across shards)."""
    rows = mx.QUERIES["shuffle_shard_assign"](spark, sf_dir).collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert 0 <= shard < mx.SHUF_SHARDS
        assert sorted(ps) == list(range(1, len(ps) + 1))
    assert len(by_shard) > mx.SHUF_SHARDS // 2  # hash actually spreads


def test_domain_cap_respected_and_keeps_longest(spark, sf_dir):
    """No source exceeds DOMAIN_CAP, ranks are dense 1..k per source, and
    every kept doc is at least as long as every dropped doc of its source
    (the two-phase salted plan must equal the exact per-source top-N)."""
    rows = mx.QUERIES["sample_domain_cap"](spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    min_kept = {s: min(r.n_chars for r in rs) for s, rs in by_src.items()}
    dropped = docs.join(
        spark.createDataFrame([(r.doc_id,) for r in rows], "doc_id long"),
        "doc_id", "left_anti").collect()
    for s, rs in by_src.items():
        assert len(rs) <= mx.DOMAIN_CAP
        assert sorted(r.domain_rank for r in rs) == list(range(1, len(rs) + 1))
    for d in dropped:
        if d.source in min_kept:
            assert d.n_chars <= min_kept[d.source]


def test_cap_shift_shares_consistent(spark, sf_dir):
    rows = mx.QUERIES["mixture_domain_cap_shift"](spark, sf_dir).collect()
    assert abs(sum(r.share_before for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_after for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.tokens_after <= r.tokens_before
        assert r.share_ratio == r.share_after / r.share_before


def test_gini_bounds_and_known_cases(spark, sf_dir):
    row = mx.QUERIES["mixture_source_gini"](spark, sf_dir).collect()[0]
    # near-uniform corpus (equal docs per source) => small but non-negative
    assert 0.0 <= row.gini < 0.5
    assert row.n_sources > 1 and row.total_tokens > 0
    # cross-check against a python recomputation
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks: dict[str, int] = {}
    for d in docs:
        toks[d.source] = toks.get(d.source, 0) + len(d.text.split(" "))
    xs = [t for _, t in sorted(toks.items(), key=lambda kv: (kv[1], kv[0]))]
    n, tot = len(xs), sum(xs)
    gini = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs)) / (n * tot)
    assert abs(row.gini - gini) < 1e-12


def test_embedding_dim_stats_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = mx.QUERIES["embedding_dim_stats"](spark, sf_dir).collect()
    vecs = np.array(
        [r.embedding for r in
         spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()],
        dtype=np.float64,
    )
    assert len(rows) == vecs.shape[1] == mx.EMB_DIM
    for r in rows:
        col = vecs[:, r.dim]
        assert r.n_vals == len(col)
        assert abs(r.mean_val - col.mean()) < 1e-6
        assert abs(r.var_val - col.var()) < 1e-6
        assert r.min_val == col.min() and r.max_val == col.max()
        assert r.range_val == r.max_val - r.min_val
        assert r.var_val >= -1e-9


def test_embedding_top_component_matches_numpy_power_iteration(spark, sf_dir):
    """The SQL power iteration replicates the exact algorithm (fixed-point
    floors included) — verified against a numpy reimplementation — and the
    per-iteration outputs are unit vectors."""
    import math

    import numpy as np

    rows = mx.QUERIES["embedding_top_component"](spark, sf_dir).collect()
    assert len(rows) == mx.EMB_DIM
    X = np.array(
        [r.embedding for r in
         spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()],
        dtype=np.float64,
    )
    scale = float(mx.PI_SCALE)

    def step(v):
        dot = X @ v
        w = np.array([
            np.floor(X[:, d] * dot * scale).sum() / scale
            for d in range(mx.EMB_DIM)
        ])
        return w

    w1 = step(np.ones(mx.EMB_DIM))
    v1 = w1 / math.sqrt((w1 * w1).sum())
    w2 = step(v1)
    v2 = w2 / math.sqrt((w2 * w2).sum())
    eig = math.sqrt((w2 * w2).sum())
    for r in rows:
        assert abs(r.loading_it1 - v1[r.dim]) < 1e-9
        assert abs(r.loading_it2 - v2[r.dim]) < 1e-9
        assert abs(r.eigenvalue - eig) < max(1e-9, 1e-12 * abs(eig))
    assert abs(sum(r.loading_it2 ** 2 for r in rows) - 1.0) < 1e-9
