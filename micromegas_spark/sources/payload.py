"""Raw block payload path: encode / store / fetch / parse.

Reference (SURVEY §2.1 S4/S5):
- ``get_payload(process_id, stream_id, block_id) → Binary`` async scalar UDF
  reading object storage (lakehouse/get_payload_function.rs).
- ``parse_block(block_id)`` UDTF → rows ``(object_index BIGINT,
  type_name STRING, value JSON)`` decoding the block's payload, stopping
  early under a bare LIMIT (parse_block_table_function.rs:37-42; early-stop
  note functions-reference.md:245).

The reference's wire format is its own transit/CBOR encoding — proprietary
to its SDK, so this engine defines a public equivalent: MMSB ("micromegas-
spark block"), a length-prefixed JSON-lines binary framing:

    [4-byte big-endian length][utf-8 json object]...   per event object

where each object carries ``__type`` (the reference's transit type tag,
transit_value_to_jsonb keeps the same convention) plus the event members.
Any producer can write it; the decode path is what's under test.

Spark-first shapes:
- payload storage = a ``block_payloads`` table (block_id, payload BINARY) —
  a pre-joined binary column is the idiomatic object-store stand-in
  (SURVEY §2.1 S4 'binary column + join');
- ``get_payload`` = broadcast-able lookup join;
- ``parse_block`` = an Arrow-batched mapInPandas fan-out (1 block row →
  N object rows) with an iterator inside, so a downstream LIMIT stops
  decoding via batch back-pressure — the early-stop contract.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PARSED_SCHEMA = StructType(
    [
        StructField("block_id", StringType()),
        StructField("object_index", LongType()),
        StructField("type_name", StringType()),
        StructField("value", StringType()),  # JSON (reference: JSONB Binary)
    ]
)


def encode_block(objects: list[dict]) -> bytes:
    """Encode event objects into an MMSB payload. Each dict must include
    ``__type``."""
    out = bytearray()
    for obj in objects:
        b = json.dumps(obj, separators=(",", ":"), sort_keys=True).encode()
        out += struct.pack(">I", len(b)) + b
    return bytes(out)


#: RFC 8949 §3.4.6 self-described-CBOR magic — the prefix that
#: distinguishes a CBOR block envelope from MMSB length-prefix framing.
CBOR_MAGIC = b"\xd9\xd9\xf7"


def encode_block_cbor(objects: list[dict], compress: bool = True) -> bytes:
    """Encode event objects as a CBOR block envelope, mirroring the
    reference's wire shape (payload.rs:33-37: a CBOR-decoded BlockPayload
    struct of compressed `dependencies` + `objects` buffers). The
    envelope is tag 55799 (self-described CBOR, so the magic prefix is
    spec-blessed) over {"dependencies", "objects"}; the objects buffer is
    a CBOR Sequence (RFC 8742) of the event maps so decode can stream
    item-by-item, zlib-compressed when ``compress``."""
    import zlib

    from micromegas_spark.sources import cbor

    objs = b"".join(cbor.dumps(o) for o in objects)
    deps = b""
    if compress:
        objs, deps = zlib.compress(objs), zlib.compress(deps)
    env = {
        "dependencies": deps,
        "objects": objs,
        "compression": "zlib" if compress else "none",
    }
    return cbor.dumps(cbor.Tagged(cbor.SELF_DESCRIBED_TAG, env))


def decode_block(payload: bytes) -> Iterator[dict]:
    """Lazily decode a block payload — iterator so callers (and the
    parse_block UDTF) can stop early. The wire format is auto-detected:
    CBOR envelopes (reference-parity outer framing) by the tag-55799
    magic prefix, MMSB length-prefixed JSON lines otherwise."""
    if payload[:3] == CBOR_MAGIC:
        import zlib

        from micromegas_spark.sources import cbor

        env = cbor.loads(payload)
        objs = env["objects"]
        if env.get("compression", "zlib") == "zlib":
            objs = zlib.decompress(objs)
        for obj in cbor.iter_items(objs):
            if not isinstance(obj, dict):
                raise ValueError("CBOR block objects must be maps")
            yield obj
        return
    pos = 0
    while pos + 4 <= len(payload):
        (n,) = struct.unpack(">I", payload[pos : pos + 4])
        pos += 4
        yield json.loads(payload[pos : pos + n].decode())
        pos += n


def get_payload(blocks_meta: DataFrame, payloads: DataFrame, block_id: str | None = None) -> DataFrame:
    """get_payload as a join: block metadata ⨝ payload store. With a
    block_id the payload table side prunes to one row (broadcast)."""
    p = payloads
    if block_id is not None:
        p = p.where(F.col("block_id") == block_id)
    return blocks_meta.join(F.broadcast(p) if block_id else p, "block_id")


def _jsonable(v):
    """Normalize a decoded block object for the JSON `value` column: CBOR
    maps may carry binary members and non-string keys JSON can't —
    bytes become hex strings (values and keys), other foreign types
    stringify, recursively. Doing this up front (not via a dumps
    ``default=`` hook, which never sees dict KEYS) keeps one malformed
    foreign object from killing the whole mapInPandas task."""
    if isinstance(v, dict):
        return {
            (
                k
                if isinstance(k, str)
                else k.hex() if isinstance(k, (bytes, bytearray)) else str(k)
            ): _jsonable(x)
            for k, x in v.items()
        }
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if v is None or isinstance(v, (str, int, float, bool)):
        return v
    return str(v)


def parse_block(payloads: DataFrame, limit: int | None = None) -> DataFrame:
    """parse_block UDTF analogue: (block_id, payload) rows → one row per
    decoded object. ``limit`` caps objects decoded *per block* — combined
    with iterator laziness this is the reference's early-stop under bare
    LIMIT (functions-reference.md:245)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"block_id": [], "object_index": [], "type_name": [], "value": []}
            for bid, payload in zip(pdf["block_id"], pdf["payload"]):
                for i, obj in enumerate(decode_block(bytes(payload))):
                    if limit is not None and i >= limit:
                        break
                    rows["block_id"].append(bid)
                    rows["object_index"].append(i)
                    rows["type_name"].append(obj.get("__type", "?"))
                    rows["value"].append(
                        json.dumps(
                            _jsonable(obj), separators=(",", ":"), sort_keys=True
                        )
                    )
            yield pd.DataFrame(rows)

    return payloads.select("block_id", "payload").mapInPandas(run, schema=PARSED_SCHEMA)


def make_payload_table(
    spark, blocks_events: dict[str, list[dict]], wire: str = "mmsb"
) -> DataFrame:
    """Build a block_payloads DataFrame from {block_id: [event dicts]}.
    ``wire`` picks the framing per block: 'mmsb' or 'cbor' (decode
    auto-detects, so mixed tables parse fine)."""
    enc = encode_block_cbor if wire == "cbor" else encode_block
    rows = [(bid, bytearray(enc(evs))) for bid, evs in blocks_events.items()]
    return spark.createDataFrame(
        rows, StructType([StructField("block_id", StringType()), StructField("payload", BinaryType())])
    )
