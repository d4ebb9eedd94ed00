"""Arrow Flight SQL endpoint — wire-protocol parity with the reference's
FlightSQL gateway (reference ``docs/source/user-guide/flightsql.md``: the
scheduler serves Arrow Flight SQL so "you can connect with any JDBC client"
— there via the arrow-flight-sql JDBC driver).

This serves the same protocol from the Spark session: a
:class:`pyarrow.flight.FlightServerBase` that understands the FlightSQL
command set an ADBC / flight-sql-jdbc client issues —

- ``CommandStatementQuery``     → GetFlightInfo: plan via ``spark.sql``,
  return the result schema + a ``TicketStatementQuery`` endpoint;
- ``TicketStatementQuery``      → DoGet: execute, stream Arrow batches;
- ``ActionCreatePreparedStatementRequest`` / Close → DoAction;
- ``CommandPreparedStatementQuery`` → GetFlightInfo/DoGet for prepared
  statements;
- ``CommandGetCatalogs`` / ``CommandGetDbSchemas`` / ``CommandGetTables`` /
  ``CommandGetTableTypes`` — catalog metadata with the spec-fixed schemas.

The FlightSQL messages are protobufs wrapped in ``google.protobuf.Any``;
the codec below speaks the protobuf wire format directly (varint +
length-delimited fields — the only wire types these messages use), so no
protobuf runtime or generated stubs are needed.

Statement handles are STATELESS: the handle is the UTF-8 query text
itself.  Any server replica (or a restarted server) can serve a DoGet for
a ticket minted by another — the property that lets the endpoint scale
horizontally behind a load balancer at 100 TB, where a sticky
handle→session map would pin every client to one gateway.

Execution is the full Catalyst/AQE engine; the gateway only moves Arrow
batches (``df.toArrow`` — zero row-wise conversion).
"""

from __future__ import annotations

import re
import threading
from typing import Iterator, Optional

import pyarrow as pa

try:  # pyarrow built without flight is possible; gate imports
    import pyarrow.flight as flight
except ImportError:  # pragma: no cover
    flight = None

from pyspark.sql import SparkSession

from .errors import BallistaError

# ---------------------------------------------------------------------------
# protobuf wire codec (varint + length-delimited only)
# ---------------------------------------------------------------------------

_TYPE_PREFIX = "type.googleapis.com/"
_SQL_NS = "arrow.flight.protocol.sql."


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    """Varint field (wire type 0)."""
    return _varint(field << 3) + _varint(value)


def _parse(buf: bytes) -> dict[int, list]:
    """Parse a message into {field_number: [values]} — bytes for
    length-delimited fields, int for varints; fixed32/64 skipped."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:  # groups (3/4) do not occur in FlightSQL messages
            raise BallistaError(f"unsupported protobuf wire type {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def pack_any(type_name: str, payload: bytes) -> bytes:
    """google.protobuf.Any{type_url: 1, value: 2}."""
    return _ld(1, (_TYPE_PREFIX + type_name).encode()) + _ld(2, payload)


def unpack_any(buf: bytes) -> tuple[str, bytes]:
    fields = _parse(bytes(buf))
    url = fields.get(1, [b""])[0].decode()
    value = fields.get(2, [b""])[0]
    return url.rsplit("/", 1)[-1], bytes(value)


def _str_field(fields: dict[int, list], num: int) -> Optional[str]:
    vals = fields.get(num)
    return bytes(vals[0]).decode() if vals else None


# ---------------------------------------------------------------------------
# FlightSQL fixed metadata schemas (per the protocol spec)
# ---------------------------------------------------------------------------

_GET_CATALOGS_SCHEMA = pa.schema([pa.field("catalog_name", pa.utf8(), nullable=False)])
_GET_DB_SCHEMAS_SCHEMA = pa.schema(
    [
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8(), nullable=False),
    ]
)
_GET_TABLE_TYPES_SCHEMA = pa.schema([pa.field("table_type", pa.utf8(), nullable=False)])


def _get_tables_schema(include_schema: bool) -> pa.Schema:
    fields = [
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8()),
        pa.field("table_name", pa.utf8(), nullable=False),
        pa.field("table_type", pa.utf8(), nullable=False),
    ]
    if include_schema:
        fields.append(pa.field("table_schema", pa.binary(), nullable=False))
    return pa.schema(fields)


def _like_to_regex(pattern: str) -> re.Pattern:
    """SQL LIKE pattern (%, _) → anchored regex."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$")


def _serialized_schema(schema: pa.Schema) -> bytes:
    """Schema as an Arrow IPC stream (what GetTables' table_schema and
    ActionCreatePreparedStatementResult.dataset_schema carry)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, schema):
        pass
    return sink.getvalue().to_pybytes()


def _spark_result_schema(spark: SparkSession, query: str) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark.sql(query).schema)


# ---------------------------------------------------------------------------
# the server
# ---------------------------------------------------------------------------


class FlightSqlServer(flight.FlightServerBase if flight else object):
    """Arrow Flight SQL front-end for a SparkSession's catalog."""

    def __init__(self, spark: SparkSession, location: str = "grpc://127.0.0.1:0"):
        if flight is None:  # pragma: no cover
            raise BallistaError("pyarrow was built without flight support")
        super().__init__(location)
        self.spark = spark

    # -- helpers -----------------------------------------------------------

    def _statement_info(
        self, descriptor, query: str, ticket_type: str, handle: bytes
    ) -> "flight.FlightInfo":
        schema = _spark_result_schema(self.spark, query)
        ticket = flight.Ticket(pack_any(_SQL_NS + ticket_type, _ld(1, handle)))
        endpoint = flight.FlightEndpoint(ticket, [])
        return flight.FlightInfo(schema, descriptor, [endpoint], -1, -1)

    def _metadata_info(self, descriptor, schema: pa.Schema) -> "flight.FlightInfo":
        # metadata tickets round-trip the command itself
        ticket = flight.Ticket(bytes(descriptor.command))
        return flight.FlightInfo(schema, descriptor, [flight.FlightEndpoint(ticket, [])], -1, -1)

    # -- catalog metadata --------------------------------------------------

    def _catalogs_table(self) -> pa.Table:
        names = [c.name for c in self.spark.catalog.listCatalogs()]
        return pa.table({"catalog_name": pa.array(names, pa.utf8())}).cast(
            _GET_CATALOGS_SCHEMA
        )

    def _db_schemas_table(self, fields: dict[int, list]) -> pa.Table:
        pattern = _str_field(fields, 2)
        current = self.spark.catalog.currentCatalog()
        names = [d.name for d in self.spark.catalog.listDatabases()]
        if pattern is not None:
            rx = _like_to_regex(pattern)
            names = [n for n in names if rx.match(n)]
        return pa.table(
            {
                "catalog_name": pa.array([current] * len(names), pa.utf8()),
                "db_schema_name": pa.array(names, pa.utf8()),
            }
        ).cast(_GET_DB_SCHEMAS_SCHEMA)

    def _tables_table(self, fields: dict[int, list]) -> pa.Table:
        name_pattern = _str_field(fields, 3)
        table_types = [bytes(v).decode() for v in fields.get(4, [])]
        include_schema = bool(fields.get(5, [0])[0])
        current = self.spark.catalog.currentCatalog()
        rows = []
        for t in self.spark.catalog.listTables():
            ttype = "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "TABLE"
            if table_types and ttype not in table_types:
                continue
            if name_pattern is not None and not _like_to_regex(name_pattern).match(t.name):
                continue
            rows.append((current, t.namespace[0] if t.namespace else None, t.name, ttype))
        data = {
            "catalog_name": pa.array([r[0] for r in rows], pa.utf8()),
            "db_schema_name": pa.array([r[1] for r in rows], pa.utf8()),
            "table_name": pa.array([r[2] for r in rows], pa.utf8()),
            "table_type": pa.array([r[3] for r in rows], pa.utf8()),
        }
        if include_schema:
            from pyspark.sql.pandas.types import to_arrow_schema

            blobs = [
                _serialized_schema(to_arrow_schema(self.spark.table(r[2]).schema))
                for r in rows
            ]
            data["table_schema"] = pa.array(blobs, pa.binary())
        return pa.table(data).cast(_get_tables_schema(include_schema))

    # -- Flight RPCs -------------------------------------------------------

    def get_flight_info(self, context, descriptor):
        type_name, payload = unpack_any(bytes(descriptor.command))
        fields = _parse(payload)
        if type_name == _SQL_NS + "CommandStatementQuery":
            query = _str_field(fields, 1) or ""
            return self._statement_info(
                descriptor, query, "TicketStatementQuery", query.encode()
            )
        if type_name == _SQL_NS + "CommandPreparedStatementQuery":
            handle = bytes(fields.get(1, [b""])[0])
            return self._statement_info(
                descriptor,
                handle.decode(),
                "CommandPreparedStatementQuery",
                handle,
            )
        if type_name == _SQL_NS + "CommandGetCatalogs":
            return self._metadata_info(descriptor, _GET_CATALOGS_SCHEMA)
        if type_name == _SQL_NS + "CommandGetDbSchemas":
            return self._metadata_info(descriptor, _GET_DB_SCHEMAS_SCHEMA)
        if type_name == _SQL_NS + "CommandGetTables":
            include_schema = bool(fields.get(5, [0])[0])
            return self._metadata_info(descriptor, _get_tables_schema(include_schema))
        if type_name == _SQL_NS + "CommandGetTableTypes":
            return self._metadata_info(descriptor, _GET_TABLE_TYPES_SCHEMA)
        raise BallistaError(f"unsupported FlightSQL command: {type_name or 'empty'}")

    def get_schema(self, context, descriptor):
        return flight.SchemaResult(self.get_flight_info(context, descriptor).schema)

    def do_get(self, context, ticket):
        type_name, payload = unpack_any(bytes(ticket.ticket))
        fields = _parse(payload)
        if type_name in (
            _SQL_NS + "TicketStatementQuery",
            _SQL_NS + "CommandPreparedStatementQuery",
        ):
            query = bytes(fields.get(1, [b""])[0]).decode()
            # executed on the full distributed engine; Arrow end to end
            table = self.spark.sql(query).toArrow()
            return flight.RecordBatchStream(table)
        if type_name == _SQL_NS + "CommandGetCatalogs":
            return flight.RecordBatchStream(self._catalogs_table())
        if type_name == _SQL_NS + "CommandGetDbSchemas":
            return flight.RecordBatchStream(self._db_schemas_table(fields))
        if type_name == _SQL_NS + "CommandGetTables":
            return flight.RecordBatchStream(self._tables_table(fields))
        if type_name == _SQL_NS + "CommandGetTableTypes":
            return flight.RecordBatchStream(
                pa.table({"table_type": pa.array(["TABLE", "VIEW"], pa.utf8())}).cast(
                    _GET_TABLE_TYPES_SCHEMA
                )
            )
        raise BallistaError(f"unsupported FlightSQL ticket: {type_name or 'empty'}")

    def do_action(self, context, action) -> Iterator[bytes]:
        body = bytes(action.body.to_pybytes()) if action.body else b""
        if action.type == "CreatePreparedStatement":
            type_name, payload = unpack_any(body)
            fields = _parse(payload)
            query = _str_field(fields, 1) or ""
            schema = _spark_result_schema(self.spark, query)
            result = pack_any(
                _SQL_NS + "ActionCreatePreparedStatementResult",
                _ld(1, query.encode()) + _ld(2, _serialized_schema(schema)),
            )
            yield result
            return
        if action.type == "ClosePreparedStatement":
            # stateless handles: nothing to release
            return
        raise BallistaError(f"unsupported FlightSQL action: {action.type}")

    def list_actions(self, context):
        return [
            ("CreatePreparedStatement", "Create a prepared statement"),
            ("ClosePreparedStatement", "Close a prepared statement"),
        ]


# ---------------------------------------------------------------------------
# client-side helpers (what an ADBC driver does under the hood) — used by
# tests and the CLI to drive the endpoint without external dependencies
# ---------------------------------------------------------------------------


def statement_query_descriptor(query: str) -> "flight.FlightDescriptor":
    """FlightDescriptor an ADBC/JDBC flight-sql client sends for a query."""
    return flight.FlightDescriptor.for_command(
        pack_any(_SQL_NS + "CommandStatementQuery", _ld(1, query.encode()))
    )


def metadata_descriptor(command: str, **kwargs) -> "flight.FlightDescriptor":
    """Descriptor for CommandGetCatalogs / CommandGetDbSchemas /
    CommandGetTables / CommandGetTableTypes."""
    payload = b""
    if command == "CommandGetTables":
        if kwargs.get("table_name_filter_pattern"):
            payload += _ld(3, kwargs["table_name_filter_pattern"].encode())
        for tt in kwargs.get("table_types", []):
            payload += _ld(4, tt.encode())
        if kwargs.get("include_schema"):
            payload += _vi(5, 1)
    elif command == "CommandGetDbSchemas" and kwargs.get("db_schema_filter_pattern"):
        payload += _ld(2, kwargs["db_schema_filter_pattern"].encode())
    return flight.FlightDescriptor.for_command(pack_any(_SQL_NS + command, payload))


def execute_query(client: "flight.FlightClient", query: str) -> pa.Table:
    """Full client round-trip: GetFlightInfo(CommandStatementQuery) →
    DoGet(endpoint ticket) → Arrow table."""
    info = client.get_flight_info(statement_query_descriptor(query))
    return client.do_get(info.endpoints[0].ticket).read_all()


def prepare_and_execute(client: "flight.FlightClient", query: str) -> pa.Table:
    """Prepared-statement round-trip via DoAction."""
    req = pack_any(
        _SQL_NS + "ActionCreatePreparedStatementRequest", _ld(1, query.encode())
    )
    results = list(client.do_action(flight.Action("CreatePreparedStatement", req)))
    type_name, payload = unpack_any(results[0].body.to_pybytes())
    handle = bytes(_parse(payload).get(1, [b""])[0])
    desc = flight.FlightDescriptor.for_command(
        pack_any(_SQL_NS + "CommandPreparedStatementQuery", _ld(1, handle))
    )
    info = client.get_flight_info(desc)
    table = client.do_get(info.endpoints[0].ticket).read_all()
    client.do_action(
        flight.Action(
            "ClosePreparedStatement",
            pack_any(_SQL_NS + "ActionClosePreparedStatementRequest", _ld(1, handle)),
        )
    )
    return table


def start_flightsql_endpoint(
    spark: SparkSession, port: int = 0, host: str = "127.0.0.1"
) -> FlightSqlServer:
    """Start the Flight SQL endpoint on a background thread; returns the
    server (``server.port`` is the bound port; ``server.shutdown()`` stops
    it)."""
    server = FlightSqlServer(spark, f"grpc://{host}:{port}")
    thread = threading.Thread(target=server.serve, daemon=True, name="flightsql-serve")
    thread.start()
    return server
