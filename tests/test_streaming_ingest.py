"""Streaming ingest (streaming/ingest.py): exactly-once incremental append.

Drives the real operating mode: a file drop-box source, two separate
AvailableNow runs against the same checkpoint — the second run must pick up
ONLY the files dropped after the first, and a re-run with nothing new must
append nothing (no duplicates, the exactly-once property)."""

from __future__ import annotations

import json
import os

import pytest

from bemidb_spark.sources.catalog import Catalog
from bemidb_spark.sources.writer import read_table
from bemidb_spark.streaming.ingest import stream_append


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _drop(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_append_incremental_exactly_once(spark, cat, tmp_path):
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    _drop(inbox, "a.json", [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])

    def stream():
        return (
            spark.readStream.schema("id bigint, v string").json(inbox)
            .withColumn("v", __import__("pyspark").sql.functions.upper("v"))
        )

    stream_append(spark, cat, "public", "inbox_t", stream(), ckpt)
    got = {(r.id, r.v) for r in read_table(spark, cat, "public", "inbox_t").collect()}
    assert got == {(1, "A"), (2, "B")}

    # second drop: only the new file is processed
    _drop(inbox, "b.json", [{"id": 3, "v": "c"}])
    stream_append(spark, cat, "public", "inbox_t", stream(), ckpt)
    got = {(r.id, r.v) for r in read_table(spark, cat, "public", "inbox_t").collect()}
    assert got == {(1, "A"), (2, "B"), (3, "C")}

    # nothing new: no duplicates appear (exactly-once)
    stream_append(spark, cat, "public", "inbox_t", stream(), ckpt)
    rows = read_table(spark, cat, "public", "inbox_t").collect()
    assert len(rows) == 3


def test_stream_append_rejects_batch_df(spark, cat):
    with pytest.raises(ValueError, match="streaming"):
        stream_append(spark, cat, "public", "x",
                      spark.range(3), "/tmp/unused-ckpt")
