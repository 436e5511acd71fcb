"""Boot a WireServer for interactive real-client probing (psql/pg_dump).

Usage: python tools/serve_live.py [--version 15.18] [--port N]
Prints "LISTENING host port" once ready, then blocks.
"""
import argparse
import sys
import time

from bemidb_spark.session import build_session
from bemidb_spark.sources.catalog import Catalog
from bemidb_spark.sources.writer import replace_table
from bemidb_spark.server.wire import WireServer
from bemidb_spark.tables import register_views


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--version", default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--catalog", default=None,
                    help="existing catalog root; default: temp 2-table demo")
    args = ap.parse_args()

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, args.sf_dir)
    if args.catalog:
        cat = Catalog(args.catalog)
    else:
        import tempfile

        cat = Catalog(tempfile.mkdtemp(prefix="serve_live_"))
        replace_table(cat, "public", "accounts", spark.createDataFrame(
            [(1, "alice", 10.5), (2, "bob", None)],
            "id bigint, name string, balance double"))
        replace_table(cat, "public", "events_log", spark.sql(
            "SELECT event_id, user_id, event_type, ts FROM events LIMIT 100"))
    srv = WireServer(spark, cat, port=args.port, server_version=args.version)
    srv.start()
    print(f"LISTENING {srv.host} {srv.port}", flush=True)
    while True:
        time.sleep(60)


if __name__ == "__main__":
    sys.exit(main())
