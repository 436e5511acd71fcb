"""Multimodal-column operators: opaque binary payloads + Pandas-UDF plumbing.

A 100 TB training pipeline carries images/audio/video as opaque ``binary``
columns with typed metadata, decoded by vectorized Python UDFs. The media
libraries are not in this container, so the *decode* steps are stubbed
(deterministic fakes / NotImplementedError), but everything Spark-side is real
and oracle-tested: schema, Arrow batch transfer, ``mapInPandas`` signatures,
1→1 and 1→N batch shapes, and partition-parallel execution.

The corpus has no binary column, so ``media_table`` derives one
deterministically (payload = UTF-8 bytes of `text`; media_type from doc_id) —
the plumbing downstream treats it as opaque bytes.

Oracle story: the Pandas UDFs compute md5 / byte-sums with hashlib/ints, the
DuckDB oracle computes the same values in SQL over the same bytes — proving
the Python batch path produces engine-grade, reproducible values (the
Arrow boundary does not perturb data).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bemidb_spark.tables import load_tables

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

FRAME_BYTES = 64  # one fake "frame" per 64 payload bytes
FRAME_STRIDE = 8  # sample every 8th frame

_MEDIA_TYPES = ["image", "audio", "video"]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → opaque media rows: (doc_id, media_type, payload, meta)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.length(F.col("text")).alias("n_bytes"),
            F.lit("utf-8-fake").alias("codec"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decode/feature-extract: 1→1 mapInPandas over Arrow batches
# ---------------------------------------------------------------------------
_FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, payload_md5 string, "
    "head_bytesum bigint"
)


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch feature extraction (the real decode would run here)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len),
                "payload_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "head_bytesum": payloads.map(lambda b: sum(bytes(b)[:16])),
            }
        )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        media.mapInPandas(_decode_features, schema=_FEATURES_SCHEMA)
        .orderBy("doc_id")
    )


QUERIES["mm_decode_features"] = mm_decode_features
ORACLES["mm_decode_features"] = f"""
    SELECT doc_id,
           ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(list_sum([ord(substr(text, i, 1))
                          for i in generate_series(1, least(length(text), 16))])
                AS BIGINT) AS head_bytesum
    FROM documents
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# frame sampling: 1→N mapInPandas (each media row explodes into frames)
# ---------------------------------------------------------------------------
_FRAMES_SCHEMA = "doc_id bigint, frame_no int, frame_md5 string"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            n_frames = len(raw) // FRAME_BYTES
            for frame_no in range(0, n_frames, FRAME_STRIDE):
                chunk = raw[frame_no * FRAME_BYTES:(frame_no + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_no"].append(frame_no)
                out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        media.mapInPandas(_sample_frames, schema=_FRAMES_SCHEMA)
        .orderBy("doc_id", "frame_no")
    )


QUERIES["mm_frame_sample"] = mm_frame_sample
ORACLES["mm_frame_sample"] = f"""
    WITH frames AS (
      SELECT doc_id, text,
             unnest(generate_series(0, length(text) // {FRAME_BYTES} - 1,
                                    {FRAME_STRIDE})) AS f
      FROM documents
      WHERE length(text) >= {FRAME_BYTES}
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_no,
           md5(substr(text, f * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM frames
    ORDER BY doc_id, frame_no
"""


# ---------------------------------------------------------------------------
# audio chunking: overlapping windows (hop < chunk), the spectrogram shape
# ---------------------------------------------------------------------------
CHUNK_BYTES = 128  # fake "samples" per analysis window
HOP_BYTES = 96  # 25% overlap between consecutive windows

_CHUNKS_SCHEMA = "doc_id bigint, chunk_no int, chunk_md5 string, energy bigint"


def _audio_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1→N with OVERLAP: unlike frame sampling, consecutive output rows share
    payload bytes (hop < window), the shape every audio featurizer
    (spectrogram / fbank) needs. Energy = exact integer byte-sum standing in
    for the RMS a real decoder would compute."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "chunk_no": [], "chunk_md5": [], "energy": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            chunk_no = 0
            start = 0
            while start + CHUNK_BYTES <= len(raw):
                chunk = raw[start:start + CHUNK_BYTES]
                out["doc_id"].append(doc_id)
                out["chunk_no"].append(chunk_no)
                out["chunk_md5"].append(hashlib.md5(chunk).hexdigest())
                out["energy"].append(sum(chunk))
                chunk_no += 1
                start += HOP_BYTES
        yield pd.DataFrame(out)


def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        media.mapInPandas(_audio_chunks, schema=_CHUNKS_SCHEMA)
        .orderBy("doc_id", "chunk_no")
    )


QUERIES["mm_audio_chunks"] = mm_audio_chunks
ORACLES["mm_audio_chunks"] = f"""
    WITH chunks AS (
      SELECT doc_id, text,
             unnest(generate_series(0, (length(text) - {CHUNK_BYTES}) // {HOP_BYTES})) AS c
      FROM documents
      WHERE length(text) >= {CHUNK_BYTES}
    )
    SELECT doc_id,
           CAST(c AS INT) AS chunk_no,
           md5(substr(text, c * {HOP_BYTES} + 1, {CHUNK_BYTES})) AS chunk_md5,
           CAST(list_sum([ord(substr(text, c * {HOP_BYTES} + i, 1))
                          for i in generate_series(1, {CHUNK_BYTES})])
                AS BIGINT) AS energy
    FROM chunks
    ORDER BY doc_id, chunk_no
"""


# ---------------------------------------------------------------------------
# resize: deterministic fake decode + REAL nearest-neighbor resize math.
# The *decode* is the stubbed part (no media libs in this container): payload
# bytes are read as a 16-wide grayscale pixel grid. Everything after decode
# is the genuine resize kernel a production pipeline runs — vectorized numpy
# index mapping inside an Arrow-batched mapInPandas, per-row, no shuffle —
# and swapping in a real decoder changes one line, not the plan.
# ---------------------------------------------------------------------------
SRC_W = 16  # fake-decode source width (pixels per byte row)
OUT_W = 8
OUT_H = 8

_RESIZE_SCHEMA = (
    "doc_id bigint, src_h int, resized_md5 string, pixel_sum bigint"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Nearest-neighbor OUT_H x OUT_W resize of the fake-decoded grid.

    src pixel for out (y, x) = (y*src_h // OUT_H, x*SRC_W // OUT_W) — the
    standard floor-mapped nearest-neighbor kernel, computed as two numpy
    index vectors (real vectorized resize, not a stand-in)."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "src_h": [], "resized_md5": [], "pixel_sum": [],
        }
        cols = (np.arange(OUT_W) * SRC_W) // OUT_W
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            src_h = len(raw) // SRC_W
            if src_h < 1:
                continue
            grid = np.frombuffer(
                raw[: src_h * SRC_W], dtype=np.uint8
            ).reshape(src_h, SRC_W)
            rows = (np.arange(OUT_H) * src_h) // OUT_H
            resized = grid[np.ix_(rows, cols)]
            out["doc_id"].append(doc_id)
            out["src_h"].append(src_h)
            out["resized_md5"].append(hashlib.md5(resized.tobytes()).hexdigest())
            out["pixel_sum"].append(int(resized.sum()))
        yield pd.DataFrame(out)


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA).orderBy(
        "doc_id"
    )


QUERIES["mm_resize"] = mm_resize
# The oracle replays the same floor-mapped index math over the text bytes
# (corpus text is pure ASCII, so substr-by-character == byte addressing).
ORACLES["mm_resize"] = f"""
    SELECT doc_id,
           CAST(length(text) // {SRC_W} AS INT) AS src_h,
           md5(array_to_string(
             [substr(text,
                     CAST(((i // {OUT_W}) * (length(text) // {SRC_W})) // {OUT_H} AS INT) * {SRC_W}
                       + CAST(((i % {OUT_W}) * {SRC_W}) // {OUT_W} AS INT) + 1,
                     1)
              for i in generate_series(0, {OUT_H * OUT_W} - 1)], '')) AS resized_md5,
           CAST(list_sum(
             [ord(substr(text,
                         CAST(((i // {OUT_W}) * (length(text) // {SRC_W})) // {OUT_H} AS INT) * {SRC_W}
                           + CAST(((i % {OUT_W}) * {SRC_W}) // {OUT_W} AS INT) + 1,
                         1))
              for i in generate_series(0, {OUT_H * OUT_W} - 1)]) AS BIGINT) AS pixel_sum
    FROM documents
    WHERE length(text) >= {SRC_W}
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# cross-document duplicate frames: Python feature extraction feeding a
# relational dedup — the full multimodal-pipeline shape in one plan
# ---------------------------------------------------------------------------
def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frames that appear in more than one place across the corpus.

    The standard near-duplicate-media sweep: fingerprint every sampled frame
    (here: the same 1→N ``mapInPandas`` expansion as `mm_frame_sample`), then
    hash-groupBy the fingerprints — identical frames collide regardless of
    which video/doc they came from. At 100 TB this is mapInPandas (no
    shuffle, Arrow-batched) followed by ONE map-side-combinable aggregation
    on the 16-byte fingerprint — the same scale shape as `dedup_exact`, with
    the Python boundary before the shuffle shrinking each frame to a hash.
    """
    media = media_table(spark, sf_dir)
    frames = media.mapInPandas(_sample_frames, schema=_FRAMES_SCHEMA)
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_frames") > 1)
        .orderBy("frame_md5")
    )


QUERIES["mm_frame_dedup"] = mm_frame_dedup
ORACLES["mm_frame_dedup"] = f"""
    WITH frames AS (
      SELECT doc_id, text,
             unnest(generate_series(0, length(text) // {FRAME_BYTES} - 1,
                                    {FRAME_STRIDE})) AS f
      FROM documents
      WHERE length(text) >= {FRAME_BYTES}
    ),
    fps AS (
      SELECT doc_id,
             md5(substr(text, f * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
      FROM frames
    )
    SELECT frame_md5,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM fps
    GROUP BY frame_md5
    HAVING COUNT(*) > 1
    ORDER BY frame_md5
"""
