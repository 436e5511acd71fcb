"""Sketch aggregates: cardinality and quantile estimation.

Wraps Spark's native sketch aggregates (HyperLogLog++ and an
approximate-quantile summary). At 100 TB these replace exact
distinct/percentile computations whose state would not fit: fixed-size
mergeable sketch state flows through map-side partial aggregation like any
sum. Estimates are engine-specific (different sketch impls), so driver
checks for them are rows-only — exact twins exist in the operator battery.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct-count estimate (relative std deviation rsd)."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(col: Column | str, probs: list[float], accuracy: int = 10000) -> Column:
    c = col if isinstance(col, str) else None
    name = c or (col._jc.toString() if hasattr(col, "_jc") else "value")
    prob_list = ", ".join(str(p) for p in probs)
    return F.expr(f"approx_percentile({name}, array({prob_list}), {accuracy})")
