"""SparkSession construction tuned for the engine.

The reference caps its embedded engine at 3 GB / 2 threads (src/server/main.go:65-66).
We instead size for the host and rely on AQE to adapt at runtime: the same code path
must hold from local[32] test runs up to a 1000-executor cluster — partition counts
and broadcast thresholds are set relative to cluster parallelism, never hard-coded to
the test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle-partition default: local mode uses the core count so every shuffle
# saturates the machine without creating thousands of empty tasks at test SF.
# On a real cluster this is overridden (2-3x total executor cores) and AQE
# coalesces down when a stage's data is small.
_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(
    app_name: str = "bemidb-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Key choices, each aimed at "the same plan must survive 100 TB":
    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic join-strategy switching replace any hand-tuned per-query knobs.
    - Broadcast threshold left at default (10 MB) — dimension tables (region,
      nation, supplier, part at our scale factors) broadcast automatically;
      fact-fact joins shuffle on their keys as they must.
    - Arrow enabled: every pandas_udf / toPandas crosses the JVM/Python
      boundary in columnar batches, not row-at-a-time pickles.
    - Session timezone pinned to UTC so timestamp semantics are deterministic
      and match the DuckDB oracle.
    - ANSI mode off: the engine accepts Postgres-ish permissive SQL the way the
      reference's DuckDB does (e.g. lax casts); correctness tests compare
      values, not error surfaces.
    """
    cpus = cpus or _DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        # 32-thread local JVM: an 8g heap GC-thrashes once a few hundred
        # plans/codegen classes accumulate (cold-statement passes drifted
        # 20→60 s at SF0.1); 24g holds the working set steady (~9-14 s).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet scans: vectorized reader + filter/column pushdown are defaults,
        # pinned here so a config drift can't silently disable them.
        # Footers carry Iceberg field ids for EXTERNAL readers
        # (writer._with_field_ids), and schema inference round-trips that
        # metadata into the read schema — which then REFUSES id-less files
        # (direct appends, streaming staging) unless missing ids fall back
        # to by-name resolution. ignoreMissing is that fallback.
        .config("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # Whole-stage-codegen compile cache: the 100-entry default thrashes on
        # a >22-query workload (each query compiles several codegen units), so
        # every cold statement re-pays ~0.5 s of Janino compilation. 2000
        # entries hold the whole working set; measured effect: 22-query
        # cold-statement suite 21.7 s -> 8.0 s at SF0.1 (see bench.py
        # cold_sequential_sec). Static conf — must be set before first use.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # Long-running-server hygiene: shuffle files and broadcasts from
        # discarded Datasets are reclaimed by the ContextCleaner, which only
        # learns of dead references via driver GC; the 30-minute default
        # periodicGC lets tens of GB of dead shuffle state pile up between
        # full GCs, and the eventual collection stalls whole query passes
        # (measured: alternating 7 s / 39 s suite passes at sf0.1). A 2-min
        # floor keeps the backlog bounded and the pause off the query path.
        .config("spark.cleaner.periodicGC.interval", "2min")
        # …but a periodic System.gc() on a 24g heap is a stop-the-world
        # full collection under G1's default handling — landing mid-query it
        # stalls a whole pass (the episodic 12-120 s reexec outliers: pass
        # time = suite + full-GC pause). ExplicitGCInvokesConcurrent turns
        # every System.gc() (the ContextCleaner's and the benchmark's) into
        # a concurrent G1 cycle: same reclamation, no stop-the-world stall
        # on the query path.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+ExplicitGCInvokesConcurrent",
        )
        # Console progress bars interleave with benchmark/gate output and
        # cost driver cycles on sub-second stages; the UI is off anyway.
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


# Below ~1 GB of total input, AQE's stage-by-stage scheduling barriers (each
# query stage is its own job, materialized before the next is planned) cost
# more wall-clock than runtime re-planning can possibly save, and 32 shuffle
# partitions make every exchange a spray of near-empty tasks. Above it, the
# scale defaults (AQE on, per-core partitions) are the right call and the
# policy is a no-op.
SMALL_INPUT_BYTES = int(
    os.environ.get("SPARK_GRAFT_SMALL_INPUT_BYTES", str(1 << 30))
)


def apply_input_size_policy(spark: SparkSession, paths: list[str]) -> bool:
    """Size-aware execution policy: adapt session knobs to the bound dataset.

    The engine equivalent of an interactive-vs-batch profile switch: when the
    data a session is bound to is small (sum of file sizes under
    ``SMALL_INPUT_BYTES``), adaptive execution is disabled and shuffle
    parallelism reduced — runtime-conf settings only (session-scoped,
    reversible, no restart). Both the wire server's session binding and
    bench.py apply this, so benchmark numbers reflect exactly what a pg
    client experiences. Returns True when the small profile was applied.
    """
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    if total >= SMALL_INPUT_BYTES:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(int(spark.conf.get("spark.default.parallelism", "32"))),
        )
        # Constraint propagation pays for itself at scale (inferred
        # IsNotNull/range filters prune whole shuffles); keep the default.
        spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
        return False
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # Constraint propagation is O(plan²) optimizer work per (re)plan; at
    # sub-GB inputs the filters it infers prune nothing worth the planning
    # time. Disabling it is semantics-neutral (it only *adds* derived
    # predicates for the optimizer) and measured -0.4 s on the 22-query
    # honest re-execution suite at sf0.1 (tools/reexec_tune.py sweep:
    # 6.05 -> 5.65 median; partitions 8/4/2 within noise, AQE-on and
    # minPartitionNum=1 regressions).
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    return True


def reexecute(df):
    """Re-run a cached (prepared) DataFrame with full execution.

    Wraps the Dataset's ANALYZED logical plan in a fresh Dataset — skipping
    parse/analysis exactly like a pg prepared statement, but re-optimizing
    and re-executing every stage (collect() on the original object would
    instead reuse its already-materialized shuffle map outputs). Used by the
    benchmark's honest re-execution pass; falls back to the same object if
    the internal constructor is unavailable.
    """
    from pyspark.sql import DataFrame as PyDF

    spark = df.sparkSession
    try:
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, df._jdf.queryExecution().analyzed()
        )
        return PyDF(jdf, spark)
    except Exception:  # noqa: BLE001 — internal API; degrade to cached object
        return df
