"""Minimal Avro Object Container File codec + DataFrame bridges.

GeoMesa ships Avro ingest converters and an Avro export format
(public tree: geomesa-convert-avro/, geomesa-tools export — mount empty
at survey time, SURVEY.md §0).  No Avro library ships in this container
(the spark-avro jar is an external module and fastavro is absent), so
this module implements the public Avro 1.x container spec directly for
FLAT record schemas — null codec, zigzag-varint primitives — which is
all the converter surface needs:

- supported field types: long, int, double, float, boolean, string,
  bytes, and nullable unions thereof (``["null", T]``);
- :func:`write_avro` — distributed: each Spark partition writes one
  ``part-NNNNN.avro`` container via ``mapInPandas`` (executor-direct
  files; same shared-POSIX contract as plans/lineage.py);
- :func:`read_avro` — distributed: ``binaryFile`` source + Arrow-batched
  decode, so ingest parallelism follows the file count exactly like the
  reference's converter ingest.

Not a general Avro implementation (no nested records/arrays/maps, no
deflate codec, no schema evolution) — documented narrowing; flat tables
are what the GeoMesa converter framework maps Avro records onto anyway.
"""

from __future__ import annotations

import io
import json
import os
import struct

import numpy as np
import pandas as pd

MAGIC = b"Obj\x01"
SYNC = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"

_SPARK_TO_AVRO = {
    "bigint": "long", "long": "long", "int": "int", "double": "double",
    "float": "float", "boolean": "boolean", "string": "string", "binary": "bytes",
}


# -- varint primitives -------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = _zigzag_encode(int(n)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(mv: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = mv[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc), pos
        shift += 7


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(mv: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(mv, pos)
    return bytes(mv[pos : pos + n]), pos + n


# -- schema mapping -----------------------------------------------------------

def schema_from_spark(df) -> dict:
    fields = []
    for f in df.schema.fields:
        t = _SPARK_TO_AVRO.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(
                f"unsupported Avro export type: {f.name}:{f.dataType.simpleString()} "
                "(flat primitive columns only — cast/flatten first)"
            )
        fields.append({"name": f.name, "type": ["null", t] if f.nullable else t})
    return {"type": "record", "name": "row", "fields": fields}


def _field_types(schema: dict) -> list[tuple[str, str, bool]]:
    out = []
    for f in schema["fields"]:
        t = f["type"]
        nullable = isinstance(t, list)
        base = [x for x in t if x != "null"][0] if nullable else t
        out.append((f["name"], base, nullable))
    return out


# -- encode/decode ------------------------------------------------------------

def _encode_value(buf: io.BytesIO, v, base: str) -> None:
    if base in ("long", "int"):
        _write_long(buf, int(v))
    elif base == "double":
        buf.write(struct.pack("<d", float(v)))
    elif base == "float":
        buf.write(struct.pack("<f", float(v)))
    elif base == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif base == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif base == "bytes":
        _write_bytes(buf, bytes(v))
    else:
        raise ValueError(base)


def _decode_value(mv: memoryview, pos: int, base: str):
    if base in ("long", "int"):
        return _read_long(mv, pos)
    if base == "double":
        return struct.unpack_from("<d", mv, pos)[0], pos + 8
    if base == "float":
        return struct.unpack_from("<f", mv, pos)[0], pos + 4
    if base == "boolean":
        return bool(mv[pos]), pos + 1
    if base == "string":
        b, pos = _read_bytes(mv, pos)
        return b.decode("utf-8"), pos
    if base == "bytes":
        return _read_bytes(mv, pos)
    raise ValueError(base)


def encode_container(pdf: pd.DataFrame, schema: dict) -> bytes:
    """pandas frame → one Avro Object Container File (null codec)."""
    ftypes = _field_types(schema)
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    _write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode())
        _write_bytes(buf, v)
    _write_long(buf, 0)  # end of metadata map
    buf.write(SYNC)

    block = io.BytesIO()
    cols = {name: pdf[name].to_numpy(object) for name, _, _ in ftypes}
    for i in range(len(pdf)):
        for name, base, nullable in ftypes:
            v = cols[name][i]
            is_null = v is None or (isinstance(v, float) and np.isnan(v))
            if nullable:
                if is_null:
                    _write_long(block, 0)  # union branch: null
                    continue
                _write_long(block, 1)
            elif is_null:
                raise ValueError(f"null in non-nullable field {name}")
            _encode_value(block, v, base)
    payload = block.getvalue()
    if len(pdf):
        _write_long(buf, len(pdf))
        _write_bytes(buf, payload)
        buf.write(SYNC)
    return buf.getvalue()


def decode_container(data: bytes) -> tuple[pd.DataFrame, dict]:
    mv = memoryview(data)
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("not an Avro container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(mv, pos)
        if n == 0:
            break
        if n < 0:  # blocks may carry a byte size (spec); skip it
            _, pos = _read_long(mv, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(mv, pos)
            v, pos = _read_bytes(mv, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"].decode())
    if meta.get("avro.codec", b"null") not in (b"null", b""):
        raise ValueError("only the null codec is supported")
    ftypes = _field_types(schema)
    pos += 16  # sync marker
    rows: dict[str, list] = {name: [] for name, _, _ in ftypes}
    while pos < len(mv):
        count, pos = _read_long(mv, pos)
        payload, pos = _read_bytes(mv, pos)
        pmv = memoryview(payload)
        p = 0
        for _ in range(count):
            for name, base, nullable in ftypes:
                if nullable:
                    branch, p = _read_long(pmv, p)
                    if branch == 0:
                        rows[name].append(None)
                        continue
                v, p = _decode_value(pmv, p, base)
                rows[name].append(v)
        pos += 16  # sync marker
    return pd.DataFrame(rows), schema


# -- DataFrame bridges ---------------------------------------------------------

def write_avro(df, path: str, mode: str = "overwrite") -> None:
    """Distributed Avro export: one container file per Spark partition
    (executor-direct writes — shared-POSIX contract, see plans/lineage)."""
    import pyspark.sql.functions as F  # noqa: F401

    schema = schema_from_spark(df)
    if mode not in ("overwrite", "error", "errorifexists"):
        # append would clobber same-numbered part files -> corrupt mix
        raise ValueError(f"write_avro supports mode='overwrite' or 'error', got {mode!r}")
    if os.path.isdir(path):
        if mode in ("error", "errorifexists"):
            raise FileExistsError(path)
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        frames = [b for b in batches if len(b)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            tmp = os.path.join(path, f"part-{pid:05d}.avro.tmp")
            with open(tmp, "wb") as f:
                f.write(encode_container(pdf, schema))
            os.replace(tmp, os.path.join(path, f"part-{pid:05d}.avro"))
        yield pd.DataFrame({"n": [len(pdf) if frames else 0]})

    df.mapInPandas(write_part, schema="n long").collect()


def read_avro(spark, path: str):
    """Distributed Avro ingest: binaryFile source → Arrow-batched decode.
    The schema comes from the first file (all parts share it)."""
    import glob as _glob

    import pyspark.sql.functions as F

    first = sorted(_glob.glob(os.path.join(path, "*.avro")))
    if not first:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(first[0], "rb") as f:
        _, schema = decode_container(f.read())
    spark_fields = []
    back = {"long": "bigint", "int": "int", "double": "double", "float": "float",
            "boolean": "boolean", "string": "string", "bytes": "binary"}
    for name, base, _ in _field_types(schema):
        spark_fields.append(f"{name} {back[base]}")
    out_schema = ", ".join(spark_fields)

    files = spark.read.format("binaryFile").load(os.path.join(path, "*.avro"))

    def decode(batches):
        for b in batches:
            for data in b["content"]:
                pdf, _ = decode_container(bytes(data))
                yield pdf

    return files.select("content").mapInPandas(decode, schema=out_schema)
