"""Warehouse catalog: schema.table → storage location + column metadata.

Plays the role of the reference's Postgres-backed Iceberg catalog (two tables:
``iceberg_tables(table_namespace, table_name, metadata_location, columns)`` and
``iceberg_materialized_views(schema_name, table_name, definition)`` — reference
scripts/catalog.sql:1-15, common/iceberg_catalog.go:59-82). Without an Iceberg
runtime in this environment, the catalog is a JSON file beside the data and
tables are parquet directories with **versioned locations + atomic pointer
swap** (the same commit model Iceberg metadata files implement, and the same
visibility guarantee the reference's `-bemidb-syncing` rename dance provides —
iceberg_table.go:46-70): readers resolve the catalog pointer at query time and
never observe a half-written table.

On a cluster this module is replaced 1:1 by an Iceberg JDBC/REST catalog;
every caller goes through ``location()`` / ``commit_table()`` so the swap is
the only thing that changes.
"""

from __future__ import annotations

import threading
import time

from bemidb_spark.sources import fs

_LOCK = threading.Lock()


class Catalog:
    # Every commit also emits spec-shaped Iceberg v2 metadata.json for the
    # table (sources/iceberg_meta.py) — the reference's headline contract
    # (storage_utils.go:371-496). Advisory for external readers: engine-side
    # reads always resolve through this catalog, so metadata emission is
    # best-effort and can be disabled for bulk test setup.
    EMIT_ICEBERG_METADATA = True

    def __init__(self, root: str) -> None:
        # root may be a plain path or a file:// URI; all path math goes
        # through the fs adapter, so an object-store root only needs the
        # adapter's scheme hooks (reference storage_s3.go role).
        self.root = root
        fs.makedirs(root)
        self._path = fs.join(root, "_catalog.json")
        if not fs.exists(self._path):
            self._write({"tables": {}, "matviews": {}})

    # -- storage ------------------------------------------------------------
    def version(self) -> int:
        """Monotonic-enough catalog version: the state file's mtime_ns.

        Every committed change rewrites the file via atomic rename, so any
        table swap bumps this; sessions use it to invalidate prepared plans.
        """
        return fs.mtime_ns(self._path)

    def _read(self) -> dict:
        return fs.read_json(self._path)

    def _write(self, state: dict) -> None:
        # atomic pointer swap: temp file + rename
        fs.write_json_atomic(self._path, state)

    # -- transactions --------------------------------------------------------
    def snapshot_state(self) -> dict:
        """The full catalog state (tables + matviews), for BEGIN to pin."""
        with _LOCK:
            return self._read()

    def restore_state(self, state: dict) -> None:
        """Atomically restore a previously-pinned state (ROLLBACK). The write
        is the same atomic rename as any commit, so the catalog version bumps
        and sessions drop their cached plans."""
        with _LOCK:
            self._write(state)

    # -- tables -------------------------------------------------------------
    @staticmethod
    def _key(schema: str, table: str) -> str:
        return f"{schema}.{table}"

    def new_location(self, schema: str, table: str) -> str:
        """A fresh versioned data directory for a table rewrite."""
        return fs.join(self.root, "data", schema, fs.fresh_name(table))

    def commit_table(
        self, schema: str, table: str, location: str, columns: list[dict],
        props: dict | None = None,
    ) -> str | None:
        """Atomically point schema.table at location; return the old location.

        ``props`` carries table layout metadata (e.g. key-bucket partitioning
        for pruned MERGE); omitted -> the previous entry's props are kept.
        """
        with _LOCK:
            state = self._read()
            prev = state["tables"].get(self._key(schema, table), {})
            old = prev.get("location")
            entry = {"location": location, "columns": columns}
            # snapshot log (reference keeps a snapshot history in its table
            # metadata, storage_utils.go:371-496): superseded locations stay
            # readable until expired, giving time travel + safe in-flight
            # reads across a swap
            snapshots = list(prev.get("snapshots", []))
            if old and old != location:
                snapshots.append({"location": old, "at": time.time()})
            entry["snapshots"] = snapshots
            carried = props if props is not None else prev.get("props")
            if carried:
                entry["props"] = carried
            state["tables"][self._key(schema, table)] = entry
            self._write(state)
        if self.EMIT_ICEBERG_METADATA:
            try:
                from bemidb_spark.sources.iceberg_meta import write_metadata_file

                write_metadata_file(self, schema, table)
            except Exception:  # noqa: BLE001 — advisory artifact; a failed
                pass  # emission must never fail the committed table swap
        return old

    def snapshots(self, schema: str, table: str) -> list[dict]:
        """Superseded locations, oldest first (live location not included)."""
        entry = self._read()["tables"].get(self._key(schema, table)) or {}
        return list(entry.get("snapshots", []))

    def prune_snapshots(self, schema: str, table: str, keep: int) -> list[str]:
        """Drop all but the newest ``keep`` snapshots from the log; returns
        the expired locations (caller deletes the files)."""
        with _LOCK:
            state = self._read()
            entry = state["tables"].get(self._key(schema, table))
            if entry is None:
                return []
            snaps = entry.get("snapshots", [])
            expired = snaps[: max(0, len(snaps) - keep)]
            entry["snapshots"] = snaps[len(expired):]
            self._write(state)
        return [s["location"] for s in expired]

    def table_props(self, schema: str, table: str) -> dict:
        entry = self._read()["tables"].get(self._key(schema, table)) or {}
        return entry.get("props", {})

    def set_table_props(self, schema: str, table: str, props: dict) -> None:
        """Replace a table's props without moving its data (sync watermarks)."""
        with _LOCK:
            state = self._read()
            entry = state["tables"].get(self._key(schema, table))
            if entry is None:
                raise KeyError(f"table not found in catalog: {schema}.{table}")
            entry["props"] = props
            self._write(state)

    def location(self, schema: str, table: str) -> str:
        entry = self._read()["tables"].get(self._key(schema, table))
        if entry is None:
            raise KeyError(f"table not found in catalog: {schema}.{table}")
        return entry["location"]

    def columns(self, schema: str, table: str) -> list[dict]:
        entry = self._read()["tables"].get(self._key(schema, table))
        if entry is None:
            raise KeyError(f"table not found in catalog: {schema}.{table}")
        return entry["columns"]

    def tables(self) -> dict[str, dict]:
        return self._read()["tables"]

    def drop_table(self, schema: str, table: str) -> str | None:
        with _LOCK:
            state = self._read()
            entry = state["tables"].pop(self._key(schema, table), None)
            self._write(state)
        return entry["location"] if entry else None

    def drop_table_locations(self, schema: str, table: str) -> list[str]:
        """Drop the table; return EVERY location (live + snapshots + the
        Iceberg metadata dir) so the caller can delete the files."""
        with _LOCK:
            state = self._read()
            entry = state["tables"].pop(self._key(schema, table), None)
            self._write(state)
        if not entry:
            return []
        return (
            [s["location"] for s in entry.get("snapshots", [])]
            + [entry["location"]]
            + [fs.join(self.root, "_iceberg", self._key(schema, table))]
        )

    def rename_table(self, schema: str, table: str, new_table: str) -> None:
        with _LOCK:
            state = self._read()
            entry = state["tables"].pop(self._key(schema, table))
            state["tables"][self._key(schema, new_table)] = entry
            self._write(state)

    # -- materialized views --------------------------------------------------
    # -- plain (non-materialized) views --------------------------------------
    def put_view(self, schema: str, name: str, definition: str) -> None:
        with _LOCK:
            state = self._read()
            state.setdefault("views", {})[self._key(schema, name)] = {
                "definition": definition
            }
            self._write(state)

    def views(self) -> dict[str, dict]:
        return self._read().get("views", {})

    def drop_view(self, schema: str, name: str) -> bool:
        with _LOCK:
            state = self._read()
            existed = state.get("views", {}).pop(self._key(schema, name), None)
            self._write(state)
        return existed is not None

    def put_matview(self, schema: str, name: str, definition: str) -> None:
        with _LOCK:
            state = self._read()
            state["matviews"][self._key(schema, name)] = {"definition": definition}
            self._write(state)

    def matview_definition(self, schema: str, name: str) -> str:
        entry = self._read()["matviews"].get(self._key(schema, name))
        if entry is None:
            raise KeyError(f"materialized view not found: {schema}.{name}")
        return entry["definition"]

    def matviews(self) -> dict[str, dict]:
        return self._read()["matviews"]

    def drop_matview(self, schema: str, name: str) -> None:
        with _LOCK:
            state = self._read()
            state["matviews"].pop(self._key(schema, name), None)
            self._write(state)
