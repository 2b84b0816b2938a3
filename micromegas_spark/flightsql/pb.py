"""Minimal Arrow FlightSQL protobuf wire codec.

Hand-rolled encoder/decoder for the few ``arrow.flight.protocol.sql``
messages the wire surface needs — this container has no ``protobuf`` wheel,
and the messages are tiny (every field is bytes/string/bool/int64, so only
varint and length-delimited wire types appear). Field numbers come from the
public Apache Arrow ``FlightSql.proto``; the reference exercises exactly
these messages in python/micromegas/micromegas/flightsql/client.py:92-119
(make_query_ticket / make_prepared_statement_action /
make_ingest_flight_desc) and serves them in
rust/public/src/servers/flight_sql_service_impl.rs:757-1160, so tickets and
action payloads produced by the reference's Python client parse here
byte-for-byte (tests/test_flightsql.py pins the framing).
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

_VARINT = 0
_LEN = 2

# google.protobuf.Any wraps every FlightSQL command/ticket/action payload;
# the type_url prefix is fixed by the Arrow implementations.
ANY_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."


def _varint(value: int) -> bytes:
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, _VARINT) + _varint(value)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _LEN) + _varint(len(payload)) + payload


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        # bounds + shift cap as ValueError: the wire-facing callers (raw-SQL
        # ticket fallback, DoPut command parse) treat ValueError as "not
        # protobuf" — a truncated varint must not escape as IndexError, and
        # 10 continuation bytes (shift 63) is the uint64 maximum, anything
        # longer is adversarial
        if pos >= len(data):
            raise InvalidArgument("truncated varint")
        if shift > 63:
            raise InvalidArgument("varint exceeds 64 bits")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def decode_fields(data: bytes) -> dict[int, list]:
    """Wire-format decode → {field_number: [values]}; length-delimited
    values stay ``bytes`` (the caller knows which fields are submessages).
    Raises on wire types these messages never carry (fixed32/64, groups) —
    that doubles as the "is this actually protobuf?" validity check the
    raw-SQL ticket fallback relies on."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire_type = key >> 3, key & 0x7
        if field == 0:
            raise InvalidArgument("field number 0 is invalid")
        if wire_type == _VARINT:
            val, pos = _read_varint(data, pos)
        elif wire_type == _LEN:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise InvalidArgument("length-delimited field overruns buffer")
            val = data[pos : pos + ln]
            pos += ln
        else:
            raise InvalidArgument(f"unsupported wire type {wire_type}")
        fields.setdefault(field, []).append(val)
    return fields


def _first(fields: dict[int, list], number: int, default: bytes = b"") -> bytes:
    vals = fields.get(number)
    return vals[0] if vals else default


# -- google.protobuf.Any ----------------------------------------------------


def pack_any(type_name: str, value: bytes) -> bytes:
    """Any{type_url=1 string, value=2 bytes} around a FlightSQL message."""
    return _len_field(1, (ANY_PREFIX + type_name).encode()) + _len_field(2, value)


def unpack_any(data: bytes) -> tuple[str, bytes]:
    """→ (bare message name, serialized value). Raises ValueError if the
    bytes aren't a plausible Any (no type_url field)."""
    fields = decode_fields(data)
    url_raw = _first(fields, 1)
    if not url_raw:
        raise InvalidArgument("not a google.protobuf.Any: no type_url")
    url = url_raw.decode("utf-8")
    return url.rsplit(".", 1)[-1], _first(fields, 2)


# -- tickets / commands / actions ------------------------------------------
# TicketStatementQuery        { bytes statement_handle = 1; }
# CommandStatementQuery       { string query = 1; }
# CommandPreparedStatementQuery { bytes prepared_statement_handle = 1; }
# ActionCreatePreparedStatementRequest { string query = 1; }
# ActionCreatePreparedStatementResult  { bytes prepared_statement_handle = 1;
#                                        bytes dataset_schema = 2;
#                                        bytes parameter_schema = 3; }
# ActionClosePreparedStatementRequest  { bytes prepared_statement_handle = 1; }
# CommandStatementIngest      { string table = 2; bool temporary = 5; ... }
# DoPutUpdateResult           { int64 record_count = 1; }  (not Any-wrapped:
#   it rides PutResult.app_metadata directly, client.py:600-603)


def ticket_statement_query(sql: str) -> bytes:
    return pack_any("TicketStatementQuery", _len_field(1, sql.encode()))


def command_statement_query(sql: str) -> bytes:
    return pack_any("CommandStatementQuery", _len_field(1, sql.encode()))


def command_prepared_statement_query(handle: bytes) -> bytes:
    return pack_any("CommandPreparedStatementQuery", _len_field(1, handle))


def create_prepared_statement_request(sql: str) -> bytes:
    return pack_any("ActionCreatePreparedStatementRequest", _len_field(1, sql.encode()))


def create_prepared_statement_result(handle: bytes, dataset_schema: bytes) -> bytes:
    return pack_any(
        "ActionCreatePreparedStatementResult",
        _len_field(1, handle) + _len_field(2, dataset_schema),
    )


def close_prepared_statement_request(handle: bytes) -> bytes:
    return pack_any("ActionClosePreparedStatementRequest", _len_field(1, handle))


def command_statement_ingest(table: str, temporary: bool = False) -> bytes:
    body = _len_field(2, table.encode())
    if temporary:
        body += _varint_field(5, 1)
    return pack_any("CommandStatementIngest", body)


def do_put_update_result(record_count: int) -> bytes:
    return _varint_field(1, record_count)


def parse_do_put_update_result(data: bytes) -> int:
    vals = decode_fields(data).get(1)
    return int(vals[0]) if vals else 0
