"""Recursive-CTE emulation: driver-coordinated iterative union with fixpoint.

Spark has no native ``WITH RECURSIVE`` (the reference accepts it and hands it
to its engine — reference server/query_handler_test.go:1366-1374). The standard
Spark formulation is an iterative loop: materialize the frontier each step,
union the results, stop at an empty frontier or the iteration cap.

Scale notes:
- each step is a full distributed plan; only the *termination check* touches
  the driver (``isEmpty`` → a cheap limit-1 job);
- ``localCheckpoint`` truncates the lineage each step so the union of N steps
  doesn't build an N-deep plan tree (the classic iterative-algorithm trap);
- the accumulated union is a union of persisted step outputs — no
  recomputation of earlier frontiers.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame


def iterate(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iter: int = 100,
) -> DataFrame:
    """UNION ALL of seed and repeated applications of step until empty.

    ``step`` receives the previous frontier and returns the next one (the
    recursive term referencing the CTE's previous iteration).
    """
    frontier = seed.localCheckpoint(eager=True)
    frames = [frontier]
    for _ in range(max_iter):
        frontier = step(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        frames.append(frontier)
    else:
        raise RuntimeError(f"recursive iteration did not converge in {max_iter} steps")
    return reduce(DataFrame.unionAll, frames)
