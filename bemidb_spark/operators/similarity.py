"""Similarity search over the `embeddings` table (array<float> column).

Two paths, both pure DataFrame/SQL plans:

- **brute-force top-k** (`ann_cosine_topk`): a small, broadcastable query set
  against all candidates; cosine via sequential folds (see _xengine), ranked by
  a window per query. At 100 TB the candidate scan is partition-parallel, the
  query side broadcasts, and the window is per-query-key — no global sort.
- **IVF top-k** (`ann_ivf_topk`): the scale path. Vectors are assigned to
  coarse cells (deterministic bucketing here, k-means centroids in a real
  index); each cell's centroid is the *decimal-exact* mean of its members
  (order-independent sums → cross-engine reproducible). A query probes the
  NPROBE nearest centroids and scans only those cells — the classic
  inverted-file pruning that replaces a full scan with a ~NPROBE/NCELLS slice.

Both have bit-identical DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.operators._xengine import cosine, dot_fold
from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

N_QUERIES = 5  # vec_id < 5 are the probe vectors
TOP_K = 5
DIM = 64
N_CELLS = 8
NPROBE = 2


def _register(name: str, spark_sql: str, duck_sql: str) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql


# ---------------------------------------------------------------------------
# brute-force cosine top-k
# ---------------------------------------------------------------------------
def _topk_sql(spark: bool) -> str:
    cos = cosine("q.embedding", "c.embedding", spark=spark)
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos} AS cos_sim
      FROM embeddings q
      JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, cand_id) AS rk
      FROM scored
    )
    SELECT query_id, cand_id, cos_sim, CAST(rk AS INT) AS rk
    FROM ranked
    WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """


_register("ann_cosine_topk", _topk_sql(True), _topk_sql(False))


# ---------------------------------------------------------------------------
# IVF top-k: coarse cells -> decimal-exact centroids -> probe NPROBE cells
# ---------------------------------------------------------------------------
def _ivf_sql(spark: bool) -> str:
    # Decimal-exact centroid components: SUM(DECIMAL)/COUNT, back to DOUBLE.
    if spark:
        comp = ", ".join(
            f"CAST(CAST(SUM(CAST(embedding[{i}] AS DECIMAL(20,10))) / COUNT(*) AS DECIMAL(20,10)) AS DOUBLE)"
            for i in range(DIM)
        )
        centroid = f"array({comp})"
    else:
        comp = ", ".join(
            f"CAST(CAST(SUM(CAST(embedding[{i + 1}] AS DECIMAL(20,10))) / COUNT(*) AS DECIMAL(20,10)) AS DOUBLE)"
            for i in range(DIM)
        )
        centroid = f"[{comp}]"
    cos_centroid = dot_fold("q.embedding", "ct.centroid", spark=spark)
    cos = cosine("q.embedding", "c.embedding", spark=spark)
    return f"""
    WITH cells AS (
      SELECT vec_id, embedding, vec_id % {N_CELLS} AS cell
      FROM embeddings
    ),
    centroids AS (
      SELECT cell, {centroid} AS centroid
      FROM cells
      GROUP BY cell
    ),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, ct.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos_centroid} DESC, ct.cell) AS prk
        FROM embeddings q
        JOIN centroids ct ON q.vec_id < {N_QUERIES}
      ) p WHERE prk <= {NPROBE}
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS cand_id, {cos} AS cos_sim
      FROM probes p
      JOIN cells c ON c.cell = p.cell
      JOIN embeddings q ON q.vec_id = p.query_id
      WHERE c.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, cand_id) AS rk
      FROM scored
    )
    SELECT query_id, cand_id, cos_sim, CAST(rk AS INT) AS rk
    FROM ranked
    WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """


_register("ann_ivf_topk", _ivf_sql(True), _ivf_sql(False))


# ---------------------------------------------------------------------------
# embedding preprocessing: L2-normalize + int8 quantization + per-vector stats
# (training-data prep: quantized vectors are what a 100 TB corpus actually
# ships to an ANN index; all per-row expressions, no shuffle at all)
# ---------------------------------------------------------------------------
def _embed_prep_sql(spark: bool) -> str:
    norm = dot_fold("embedding", "embedding", spark=spark)
    if spark:
        quant = (
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 + 0.5) AS INT))"
        )
        vmin = "array_min(embedding)"
        vmax = "array_max(embedding)"
    else:
        quant = (
            "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 + 0.5) AS INT))"
        )
        vmin = "list_min(embedding)"
        vmax = "list_max(embedding)"
    # q_int8 is serialized to a JSON string at the contract boundary: the
    # driver's pandas canonicalizer cannot hash raw list columns, and the
    # compact `[1,-2,...]` rendering is byte-identical across both engines.
    return f"""
    SELECT vec_id,
           CAST(sqrt({norm}) AS DOUBLE) AS l2_norm,
           to_json({quant}) AS q_int8,
           CAST({vmin} AS FLOAT) AS v_min,
           CAST({vmax} AS FLOAT) AS v_max
    FROM embeddings
    ORDER BY vec_id
    """


_register("embedding_quantize_int8", _embed_prep_sql(True), _embed_prep_sql(False))
