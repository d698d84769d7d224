"""Minimal pure-stdlib Apache Avro object-container-file writer/reader.

Exists so the lakehouse can emit **real Iceberg metadata** (manifest and
manifest-list files are Avro per the Iceberg spec) in an environment that
ships no Avro library. Implements exactly the subset the Iceberg v2
metadata schemas need:

  types:  null, boolean, int, long, float, double, bytes, string,
          record, array, map, union, fixed
  codec:  ``null`` (uncompressed) and ``deflate`` (zlib raw, stdlib)
  file:   Avro 1.x object container format — magic ``Obj\\x01``, file
          metadata map (``avro.schema``, ``avro.codec`` + arbitrary
          extra keys, which Iceberg requires: ``schema``,
          ``partition-spec``, ``format-version``, ...), 16-byte sync
          marker, then blocks of ``<count><byte-size><payload><sync>``.

Encoding rules (Avro spec "Binary encoding"):
  - int/long: zigzag varint
  - float/double: little-endian IEEE 4/8 bytes
  - bytes/string: long(length) + raw/UTF-8 bytes
  - array/map: blocks of long(count) + items, terminated by count 0
    (negative block counts with byte sizes are accepted on read)
  - union: long(branch index) + value
  - record: fields in schema order; fixed: raw bytes

The writer and reader are inverses; tests round-trip nested Iceberg
manifest schemas through both. This is original code written from the
public Avro 1.11 specification.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ----------------------------------------------------------- primitive codec
def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        u |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _encode_bytes(b: bytes) -> bytes:
    return _zigzag_encode(len(b)) + b


def _decode_bytes(buf: io.BytesIO) -> bytes:
    n = _zigzag_decode(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


# ----------------------------------------------------------------- schema ops
def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _union_branch_index(schema: list, value) -> int:
    """Pick the union branch for a python value. Iceberg unions are always
    ``["null", X]`` (or ``[X, "null"]``) so null-vs-not resolves them."""
    for i, branch in enumerate(schema):
        if value is None and _type_name(branch) == "null":
            return i
        if value is not None and _type_name(branch) != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def encode_value(schema, value, out: bytearray) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out.extend(_zigzag_encode(int(value)))
    elif t == "float":
        out.extend(struct.pack("<f", float(value)))
    elif t == "double":
        out.extend(struct.pack("<d", float(value)))
    elif t == "bytes":
        out.extend(_encode_bytes(bytes(value)))
    elif t == "string":
        out.extend(_encode_bytes(value.encode("utf-8")))
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(
                f"fixed {schema.get('name')}: {len(b)} != {schema['size']}"
            )
        out.extend(b)
    elif t == "union":
        idx = _union_branch_index(schema, value)
        out.extend(_zigzag_encode(idx))
        encode_value(schema[idx], value, out)
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                encode_value(f["type"], f["default"], out)
            else:
                encode_value(f["type"], value[f["name"]], out)
    elif t == "array":
        items = list(value)
        if items:
            out.extend(_zigzag_encode(len(items)))
            for item in items:
                encode_value(schema["items"], item, out)
        out.extend(_zigzag_encode(0))
    elif t == "map":
        entries = dict(value)
        if entries:
            out.extend(_zigzag_encode(len(entries)))
            for k, v in entries.items():
                out.extend(_encode_bytes(str(k).encode("utf-8")))
                encode_value(schema["values"], v, out)
        out.extend(_zigzag_encode(0))
    else:
        raise NotImplementedError(f"avro type {t!r}")


def decode_value(schema, buf: io.BytesIO):
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) != b"\x00"
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _decode_bytes(buf)
    if t == "string":
        return _decode_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "union":
        idx = _zigzag_decode(buf)
        return decode_value(schema[idx], buf)
    if t == "record":
        return {f["name"]: decode_value(f["type"], buf) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            count = _zigzag_decode(buf)
            if count == 0:
                return out
            if count < 0:  # block with byte size prefix
                _zigzag_decode(buf)
                count = -count
            for _ in range(count):
                out.append(decode_value(schema["items"], buf))
    if t == "map":
        out = {}
        while True:
            count = _zigzag_decode(buf)
            if count == 0:
                return out
            if count < 0:
                _zigzag_decode(buf)
                count = -count
            for _ in range(count):
                k = _decode_bytes(buf).decode("utf-8")
                out[k] = decode_value(schema["values"], buf)
    raise NotImplementedError(f"avro type {t!r}")


# --------------------------------------------------------------- file format
def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    *,
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
) -> int:
    """Write one Avro object container file; returns its byte length.

    ``metadata``: extra file-metadata keys (Iceberg requires ``schema``,
    ``partition-spec``, ``format-version``, ... on manifests)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    # deterministic sync marker derived from content location (stable
    # re-exports produce byte-identical files; no Date/random dependency)
    import hashlib

    sync = hashlib.md5(path.encode("utf-8")).digest()

    meta = {
        "avro.schema": json.dumps(schema),
        "avro.codec": codec,
    }
    for k, v in (metadata or {}).items():
        meta[k] = v

    body = bytearray()
    for rec in records:
        encode_value(schema, rec, body)
    payload = bytes(body)
    if codec == "deflate":
        # raw deflate (no zlib header/checksum) per the Avro spec
        compressor = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = compressor.compress(payload) + compressor.flush()

    out = bytearray()
    out.extend(_MAGIC)
    header_meta = bytearray()
    if meta:
        header_meta.extend(_zigzag_encode(len(meta)))
        for k, v in meta.items():
            header_meta.extend(_encode_bytes(k.encode("utf-8")))
            header_meta.extend(_encode_bytes(v.encode("utf-8")))
    header_meta.extend(_zigzag_encode(0))
    out.extend(header_meta)
    out.extend(sync)
    if records:
        out.extend(_zigzag_encode(len(records)))
        out.extend(_zigzag_encode(len(payload)))
        out.extend(payload)
        out.extend(sync)

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    os.replace(tmp, path)
    return len(out)


def read_container(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """Read an Avro object container file -> (schema, metadata, records)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        count = _zigzag_decode(buf)
        if count == 0:
            break
        if count < 0:
            _zigzag_decode(buf)
            count = -count
        for _ in range(count):
            k = _decode_bytes(buf).decode("utf-8")
            meta[k] = _decode_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(decode_value(schema, block))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: bad sync marker (corrupt block)")
    str_meta = {
        k: v.decode("utf-8", errors="replace")
        for k, v in meta.items()
        if k != "avro.schema"
    }
    return schema, str_meta, records
