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


def decode_block(payload: bytes) -> Iterator[dict]:
    """Lazily decode an MMSB payload — iterator so callers (and the
    parse_block UDTF) can stop early."""
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
                    rows["value"].append(json.dumps(obj, separators=(",", ":"), sort_keys=True))
            yield pd.DataFrame(rows)

    return payloads.select("block_id", "payload").mapInPandas(run, schema=PARSED_SCHEMA)


def make_payload_table(spark, blocks_events: dict[str, list[dict]]) -> DataFrame:
    """Build a block_payloads DataFrame from {block_id: [event dicts]}."""
    rows = [(bid, bytearray(encode_block(evs))) for bid, evs in blocks_events.items()]
    return spark.createDataFrame(
        rows, StructType([StructField("block_id", StringType()), StructField("payload", BinaryType())])
    )
