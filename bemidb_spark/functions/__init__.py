"""Reusable column-level functions (the engine's function library).

The reference's only extension surface is 28 engine macros installed at boot
(SURVEY.md §2 B7); this package is the Spark-first equivalent — composable
Column builders that stay JVM-side (inside codegen) and are shared by the
operator modules:

- vector: dot / cosine over array<float> columns (sequential-fold, oracle-safe)
- sampling: deterministic hash-based bernoulli / stratified sampling
- sketches: cardinality & quantile estimates (Spark-native sketch aggregates)
"""

from bemidb_spark.functions.sampling import hash_bucket, hash_sample  # noqa: F401
from bemidb_spark.functions.sketches import approx_distinct, approx_quantiles  # noqa: F401
from bemidb_spark.functions.vector import cosine_sim, dot, l2_norm  # noqa: F401
