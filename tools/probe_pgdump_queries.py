"""Offline probe: run captured pg_dump/psql catalog queries through PgSession."""
import sys
import traceback

from bemidb_spark.session import build_session
from bemidb_spark.sources.catalog import Catalog
from bemidb_spark.sources.writer import replace_table
from bemidb_spark.pgcompat.session import PgSession
from bemidb_spark.tables import register_views

GETTABLES = """SELECT c.tableoid, c.oid, c.relname, c.relnamespace, c.relkind, c.reltype, c.relowner, c.relchecks, c.relhasindex, c.relhasrules, c.relpages, c.relhastriggers, c.relpersistence, c.reloftype, c.relacl, acldefault(CASE WHEN c.relkind = 'S' THEN 's'::"char" ELSE 'r'::"char" END, c.relowner) AS acldefault, CASE WHEN c.relkind = 'f' THEN (SELECT ftserver FROM pg_catalog.pg_foreign_table WHERE ftrelid = c.oid) ELSE 0 END AS foreignserver, c.relfrozenxid, tc.relfrozenxid AS tfrozenxid, tc.oid AS toid, tc.relpages AS toastpages, tc.reloptions AS toast_reloptions, d.refobjid AS owning_tab, d.refobjsubid AS owning_col, tsp.spcname AS reltablespace, false AS relhasoids, c.relispopulated, c.relreplident, c.relrowsecurity, c.relforcerowsecurity, c.relminmxid, tc.relminmxid AS tminmxid, array_remove(array_remove(c.reloptions,'check_option=local'),'check_option=cascaded') AS reloptions, CASE WHEN 'check_option=local' = ANY (c.reloptions) THEN 'LOCAL'::text WHEN 'check_option=cascaded' = ANY (c.reloptions) THEN 'CASCADED'::text ELSE NULL END AS checkoption, am.amname, (d.deptype = 'i') IS TRUE AS is_identity_sequence, c.relispartition AS ispartition
FROM pg_class c
LEFT JOIN pg_depend d ON (c.relkind = 'S' AND d.classid = 'pg_class'::regclass AND d.objid = c.oid AND d.objsubid = 0 AND d.refclassid = 'pg_class'::regclass AND d.deptype IN ('a', 'i'))
LEFT JOIN pg_tablespace tsp ON (tsp.oid = c.reltablespace)
LEFT JOIN pg_am am ON (c.relam = am.oid)
LEFT JOIN pg_class tc ON (c.reltoastrelid = tc.oid AND tc.relkind = 't' AND c.relkind <> 'p')
WHERE c.relkind IN ('r', 'S', 'v', 'c', 'm', 'f', 'p')
ORDER BY c.oid"""

GETTYPES = """SELECT tableoid, oid, typname, typnamespace, typacl, acldefault('T', typowner) AS acldefault, typowner, typelem, typrelid, CASE WHEN typrelid = 0 THEN ' '::"char" ELSE (SELECT relkind FROM pg_class WHERE oid = typrelid) END AS typrelkind, typtype, typisdefined, typname[0] = '_' AND typelem != 0 AND (SELECT typarray FROM pg_type te WHERE oid = pg_type.typelem) = oid AS isarray FROM pg_type"""

QUERIES = {"gettables": GETTABLES, "gettypes": GETTYPES}


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, "/root/testdata/sf0.001")
    import tempfile

    cat = Catalog(tempfile.mkdtemp(prefix="probe_pgdump_"))
    replace_table(cat, "public", "accounts", spark.createDataFrame(
        [(1, "alice", 10.5)], "id bigint, name string, balance double"))
    pg = PgSession(spark, cat)
    extra = sys.argv[1:]
    for name, q in QUERIES.items():
        try:
            rows = pg.execute(q).collect()
            print(f"OK {name}: {len(rows)} rows")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:600]}")
            traceback.print_exc(limit=0)
    for path in extra:
        q = open(path).read()
        try:
            rows = pg.execute(q).collect()
            print(f"OK {path}: {len(rows)} rows")
        except Exception as e:
            print(f"FAIL {path}: {type(e).__name__}: {str(e)[:600]}")


if __name__ == "__main__":
    main()
