"""Minimal Avro Object Container File writer + independent reader.

The reference emits its Iceberg manifests as Avro OCF via goavro
(src/common/storage_utils.go:252-286). The sandbox ships no Avro library, so
this module implements the small subset of the Avro 1.11 spec the Iceberg
manifest schemas need, straight from the specification:

- binary encoding: zig-zag varint int/long, length-prefixed bytes/string,
  1-byte boolean, unions as ``branch-index + value``, arrays/maps as counted
  blocks terminated by a 0 count, records as concatenated fields;
- the object container format: ``Obj\\x01`` magic, a file-metadata map
  (``avro.schema``, ``avro.codec`` = null, plus caller extras — Iceberg puts
  its table schema / partition-spec / format-version here), a 16-byte sync
  marker, then data blocks of ``(record count, byte size, records, sync)``.

``read_ocf`` is a from-spec decoder kept deliberately independent of the
writer (it shares no encode tables) so round-trip tests are a real check of
the binary format, not of one function against itself.

Unsupported on purpose (Iceberg manifests don't use them): enums, fixed,
float/double encoding of NaN payload edge cases beyond struct.pack, codecs
other than ``null``, schema resolution/evolution on read.
"""

from __future__ import annotations

import json
import struct
from hashlib import md5
from typing import Any


# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------
def _encode_varint(out: bytearray, n: int) -> None:
    """Unsigned LEB128, the wire form both int and long share post-zigzag."""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _encode_long(out: bytearray, n: int) -> None:
    _encode_varint(out, (n << 1) ^ (n >> 63) if n < 0 else n << 1)


def _encode_bytes(out: bytearray, b: bytes) -> None:
    _encode_long(out, len(b))
    out.extend(b)


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch: null for None, else the first non-null type."""
    for i, branch in enumerate(schema):
        if (branch == "null") == (value is None):
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def encode_value(out: bytearray, schema: Any, value: Any) -> None:
    """Encode ``value`` per the (parsed-JSON) Avro ``schema``."""
    if isinstance(schema, list):  # union
        branch = _union_branch(schema, value)
        _encode_long(out, branch)
        encode_value(out, schema[branch], value)
        return
    if isinstance(schema, dict):
        kind = schema["type"]
        if kind == "record":
            for field in schema["fields"]:
                encode_value(out, field["type"], value[field["name"]])
            return
        if kind == "array":
            items = value or []
            if items:
                _encode_long(out, len(items))
                for item in items:
                    encode_value(out, schema["items"], item)
            _encode_long(out, 0)
            return
        if kind == "map":
            entries = value or {}
            if entries:
                _encode_long(out, len(entries))
                for k, v in entries.items():
                    _encode_bytes(out, k.encode("utf-8"))
                    encode_value(out, schema["values"], v)
            _encode_long(out, 0)
            return
        # {"type": "long"}-style wrapping of a primitive
        encode_value(out, kind, value)
        return
    if schema in ("long", "int"):
        _encode_long(out, int(value))
    elif schema == "string":
        _encode_bytes(out, value.encode("utf-8"))
    elif schema == "bytes":
        _encode_bytes(out, bytes(value))
    elif schema == "boolean":
        out.append(1 if value else 0)
    elif schema == "null":
        pass
    elif schema == "float":
        out.extend(struct.pack("<f", float(value)))
    elif schema == "double":
        out.extend(struct.pack("<d", float(value)))
    else:
        raise ValueError(f"unsupported Avro type: {schema!r}")


_MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
) -> int:
    """Write an Avro object container file; returns its byte size.

    The sync marker is derived deterministically from the schema + metadata
    (not random) so repeated commits of identical state are byte-identical —
    the same reproducibility policy as the rest of the warehouse layer.
    """
    schema_json = json.dumps(schema, separators=(",", ":"), sort_keys=False)
    meta = {"avro.schema": schema_json, "avro.codec": "null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    sync = md5(
        (schema_json + json.dumps(meta, sort_keys=True)).encode()
    ).digest()

    out = bytearray()
    out.extend(_MAGIC)
    encode_value(
        out, _META_SCHEMA, {k: v.encode("utf-8") for k, v in meta.items()}
    )
    out.extend(sync)
    if records:
        block = bytearray()
        for rec in records:
            encode_value(block, schema, rec)
        _encode_long(out, len(records))
        _encode_long(out, len(block))
        out.extend(block)
        out.extend(sync)
    data = bytes(out)
    local = path[len("file://"):] if path.startswith("file://") else path
    with open(local, "wb") as f:
        f.write(data)
    return len(data)


# ---------------------------------------------------------------------------
# independent from-spec decoder (for round-trip tests)
# ---------------------------------------------------------------------------
class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        chunk = self.data[self.pos : self.pos + n]
        if len(chunk) != n:
            raise EOFError("truncated Avro file")
        self.pos += n
        return chunk

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.take(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def sized_bytes(self) -> bytes:
        return self.take(self.long())

    def value(self, schema: Any) -> Any:
        if isinstance(schema, list):
            return self.value(schema[self.long()])
        if isinstance(schema, dict):
            kind = schema["type"]
            if kind == "record":
                return {
                    f["name"]: self.value(f["type"]) for f in schema["fields"]
                }
            if kind == "array":
                items = []
                while True:
                    count = self.long()
                    if count == 0:
                        return items
                    if count < 0:  # block with byte-size prefix
                        self.long()
                        count = -count
                    for _ in range(count):
                        items.append(self.value(schema["items"]))
            if kind == "map":
                entries: dict[str, Any] = {}
                while True:
                    count = self.long()
                    if count == 0:
                        return entries
                    if count < 0:
                        self.long()
                        count = -count
                    for _ in range(count):
                        key = self.sized_bytes().decode("utf-8")
                        entries[key] = self.value(schema["values"])
            return self.value(kind)
        if schema in ("long", "int"):
            return self.long()
        if schema == "string":
            return self.sized_bytes().decode("utf-8")
        if schema == "bytes":
            return self.sized_bytes()
        if schema == "boolean":
            return self.take(1) == b"\x01"
        if schema == "null":
            return None
        if schema == "float":
            return struct.unpack("<f", self.take(4))[0]
        if schema == "double":
            return struct.unpack("<d", self.take(8))[0]
        raise ValueError(f"unsupported Avro type: {schema!r}")


def read_ocf(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """Decode an OCF file -> (schema, records, file metadata)."""
    local = path[len("file://"):] if path.startswith("file://") else path
    with open(local, "rb") as f:
        reader = _Reader(f.read())
    if reader.take(4) != _MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    meta = reader.value(_META_SCHEMA)
    if meta.get("avro.codec", b"null") not in (b"null", None):
        raise ValueError("only the null codec is supported")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = reader.take(16)
    records: list[dict] = []
    while reader.pos < len(reader.data):
        count = reader.long()
        reader.long()  # block byte size (unused: null codec)
        for _ in range(count):
            records.append(reader.value(schema))
        if reader.take(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records, meta
