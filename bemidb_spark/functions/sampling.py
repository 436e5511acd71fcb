"""Deterministic hash-based sampling.

`df.sample()` is seed-dependent *per partitioning*, which breaks reproducible
pipelines at scale (a repartition changes the sample). Hash-based sampling is
partition-invariant, stable across engines and runs, and trivially
stratifiable — the standard trick for reproducible training-data subsets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 8 hex digits → 32-bit space
_BUCKETS = 1 << 32


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform [0,1) value derived from md5(salt:key) — engine-portable."""
    key = F.col(key) if isinstance(key, str) else key
    salted = F.concat(F.lit(f"{salt}:"), key.cast("string")) if salt else key.cast("string")
    h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")
    return h / F.lit(float(_BUCKETS))


def hash_sample(key: Column | str, fraction: float, salt: str = "") -> Column:
    """Boolean keep-predicate for a deterministic bernoulli(fraction) sample."""
    return hash_bucket(key, salt) < F.lit(fraction)
