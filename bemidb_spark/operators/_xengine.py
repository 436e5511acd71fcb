"""Cross-engine SQL snippet builders (Spark dialect vs DuckDB-oracle dialect).

The pipeline operators (dedup/similarity/text) are defined once per engine from
these primitives, chosen so both engines produce **bit-identical** values:

- ``hash_int``: first 8 hex digits of md5 → BIGINT. md5 is identical everywhere;
  the hex→int spelling differs (Spark ``conv``, DuckDB ``'0x…'::BIGINT``).
  Verified equal (see tests/test_dedup.py).
- ``shingles``: word n-grams as space-joined strings. Spark ``transform`` over a
  ``sequence`` (guarded: Spark's sequence(1,0) counts *down*), DuckDB list
  comprehension with inclusive slices.
- ``dot_fold``: floating dot-product as a *sequential left fold* in both engines
  (Spark ``aggregate`` over ``zip_with``; DuckDB ``list_sum`` over
  ``list_transform``) — IEEE754 addition is deterministic for a fixed order, so
  both engines produce the same double bit-for-bit (empirically verified).

Scale note: every snippet is a per-row expression (no joins, no state), so each
runs inside whole-stage codegen / vectorized eval and parallelizes trivially.
"""

from __future__ import annotations

import os as _os

# Width for the REPARTITION hints that spread CPU-heavy per-row work
# (shingle/md5 pipelines, bounded all-pairs arms) across cores: the raw test
# tables are single-file/single-row-group, so without a hint that work runs
# in ONE scan task. Derived from the driver's core count (the driver also
# benches at reduced core counts), never pinned to the local 32.
REPARTITION_WIDTH = int(_os.environ.get("SPARK_GRAFT_CPUS", _os.cpu_count() or 8))


def hash_int(expr: str, *, spark: bool, salt: str = "") -> str:
    """Deterministic 32-bit hash of a string expression as BIGINT."""
    salted = f"concat('{salt}:', {expr})" if salt else expr
    if spark:
        return f"CAST(conv(substring(md5({salted}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({salted}), 1, 8) AS BIGINT)"


def words(text_expr: str, *, spark: bool) -> str:
    """Whitespace tokenization (the documents corpus is single-space-joined)."""
    if spark:
        return f"split({text_expr}, ' ')"
    return f"string_split({text_expr}, ' ')"


def shingles(words_expr: str, n: int, *, spark: bool) -> str:
    """Word n-gram shingle array (distinct not applied — caller decides)."""
    if spark:
        return (
            f"CASE WHEN size({words_expr}) < {n} THEN array(array_join({words_expr}, ' ')) "
            f"ELSE transform(sequence(1, size({words_expr}) - {n - 1}), "
            f"i -> array_join(slice({words_expr}, i, {n}), ' ')) END"
        )
    return (
        f"CASE WHEN len({words_expr}) < {n} THEN [array_to_string({words_expr}, ' ')] "
        f"ELSE [array_to_string({words_expr}[i:i+{n - 1}], ' ') "
        f"for i in generate_series(1, len({words_expr}) - {n - 1})] END"
    )


# Mersenne prime for the minhash permutation family: (a*h + b) mod P with
# h < 2^32 and a,b < 2^31 stays under 2^63, so 64-bit integer arithmetic is
# exact (and therefore bit-identical) in both engines.
_MINHASH_P = 2147483647


def _perm_consts(j: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation j — odd multiplier, fixed seeds
    (splitmix-style constants; any fixed coprime family works)."""
    a = (2654435761 * (j + 1) + 104729) % _MINHASH_P
    b = (40503 * (j + 1) * (j + 1) + 97) % _MINHASH_P
    return a | 1, b


def minhash_min_aggs(k: int, h_col: str = "h") -> list[str]:
    """MIN-aggregate form of the k universal-hash permutations, over an
    EXPLODED base-hash column (one row per (doc, shingle)): ``MIN((a_j*h+b_j)
    % P) AS m{j}``. Engine-independent SQL; the GROUP BY materializes each
    signature once (no expression re-evaluation downstream), partial
    aggregation is map-side combinable, and the md5 base hash is computed
    exactly once per shingle occurrence — the scale-correct minhash shape.

    Deliberately NOT an array-lambda (``array_min(transform(hs, ...))``)
    projection: Catalyst's CollapseProject inlines array lambdas into every
    downstream expression that touches them, re-evaluating the whole
    shingle->md5->min pipeline per reference — a measured 8 s -> 150 s
    regression on dedup_minhash_lsh at SF0.1 before this form replaced it."""
    out = []
    for j in range(k):
        a, b = _perm_consts(j)
        out.append(f"MIN(({a} * {h_col} + {b}) % {_MINHASH_P}) AS m{j}")
    return out


def dot_fold(a: str, b: str, *, spark: bool) -> str:
    """Sequential-fold dot product of two float arrays, as DOUBLE."""
    if spark:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def cosine(a: str, b: str, *, spark: bool) -> str:
    """Cosine similarity from three sequential folds (deterministic order)."""
    return (
        f"{dot_fold(a, b, spark=spark)} / "
        f"(sqrt({dot_fold(a, a, spark=spark)}) * sqrt({dot_fold(b, b, spark=spark)}))"
    )
