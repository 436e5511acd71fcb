"""bemidb_spark — a PySpark-native analytics engine with the capabilities of BemiDB.

BemiDB (reference at /root/reference, BemiHQ/BemiDB) is a Postgres-wire-compatible
analytics server that stores data as Iceberg/Parquet and delegates execution to an
embedded DuckDB. This package re-expresses the same capability surface Spark-first:

- Storage: Parquet (and Iceberg-ready table identifiers) read through Spark DSv2 scans.
- Execution: Catalyst/Tungsten via the DataFrame API and ``spark.sql`` — the role
  DuckDB plays in the reference (reference src/server/main.go:31).
- SQL compatibility: a Postgres→Spark SQL transpile layer mirroring the reference's
  AST rewrite rules (reference src/server/query_remapper*.go) in ``plans/``.
- pg_catalog / information_schema emulation (reference query_remapper_table.go:275-775)
  in ``catalog_emulation``.
- Ingestion (syncers), materialized views, and MERGE-based upsert/delete in ``sources/``.
- Large-scale training-data pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) in ``operators/`` — the parity-plus surface.
"""

from bemidb_spark.session import build_session, stop_session
from bemidb_spark.tables import TABLES, load_tables, register_views

__all__ = ["build_session", "stop_session", "TABLES", "load_tables", "register_views"]

__version__ = "0.1.0"
