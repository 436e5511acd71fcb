"""Compatibility shim: MiniPgClient moved into the package (ADVICE r4 —
the shipped bench must not import from the test tree)."""

from bemidb_spark.server.minipg import MiniPgClient  # noqa: F401
