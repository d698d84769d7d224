"""Arrow Flight as a Spark source (batch + streaming Python Data Source).

Parity target: the reference's actual ingress path
(``/root/reference/pkg/ingestor/flight_reader.go``): discovery via
``ListFlights`` (:77-117), schema fetch via ``GetFlightInfo`` +
schema deserialization (:119-150), and per-endpoint ``DoGet`` ->
RecordReader batch streaming (:152-221). Re-expressed Spark-first:

- ``spark.read.format("crest_flight")`` — one-shot read of every
  currently listed flight (the reference's ReadBatches pass);
- ``spark.readStream.format("crest_flight")`` — continuous consumption:
  each micro-batch ingests the flights that appeared since the last
  checkpointed offset. The reference's 500 ms re-poll loop
  (``ingestor.go:131-152``) re-reads data at-least-once; here offsets
  are engine-checkpointed so each flight is consumed exactly once even
  across restarts.

Options:
  ``location``  grpc://host:port (required)
  ``prefix``    only consume flights whose '/'-joined descriptor path
                starts with this (the reference's per-view selection)

Offset model: flights are consumed in SORTED descriptor-path order and
the offset is the last path consumed (``{"last": "events/tick-0007"}``).
A producer must publish successive batches under increasing names
(tick-0001, tick-0002, ... — what changelog Flight servers do); names
sorting BELOW the consumed watermark are assumed already consumed, so
expiring old flights server-side never shifts the offset.

Executor side: each Flight endpoint ticket becomes one input partition;
``read()`` opens its own Flight client and yields the ``DoGet`` stream's
Arrow record batches directly — no row-at-a-time Python, and N endpoints
scan in parallel across the cluster exactly like the reference's
per-endpoint loop, minus the single-process ceiling.

Process-model constraint (same as table_stream.py): the class is
unpickled in dedicated Python workers with no sys.path/addPyFile — this
module stays self-contained (stdlib + pyspark + pyarrow) and registers
itself for cloudpickle pickle-by-value.

Register once per session: ``register_flight_source(spark)``.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


def _connect(location: str):
    import pyarrow.flight as fl

    return fl.connect(location)


def _list_paths(location: str, prefix: str) -> list[str]:
    """Sorted '/'-joined descriptor paths currently listed by the server."""
    with _connect(location) as client:
        paths = []
        for info in client.list_flights():
            path = "/".join(p.decode() for p in info.descriptor.path)
            if path.startswith(prefix):
                paths.append(path)
    return sorted(paths)


def _list_endpoints(location: str, prefix: str) -> dict[str, list[bytes]]:
    """One ``ListFlights`` pass -> ``{path: [ticket, ...]}`` for every
    matching flight. The listing's FlightInfo objects already carry each
    flight's endpoints, so planning needs NO per-flight GetFlightInfo
    roundtrip — the reference re-fetches info per flight
    (flight_reader.go:119-150), an O(flights) serial driver loop at tens
    of thousands of flights. Servers that omit endpoints from listings
    get an individual resolution over the SAME connection (rare path)."""
    import pyarrow.flight as fl

    out: dict[str, list[bytes]] = {}
    with _connect(location) as client:
        for info in client.list_flights():
            path = "/".join(p.decode() for p in info.descriptor.path)
            if not path.startswith(prefix):
                continue
            tickets = [ep.ticket.ticket for ep in info.endpoints]
            if not tickets:
                full = client.get_flight_info(
                    fl.FlightDescriptor.for_path(*path.split("/"))
                )
                tickets = [ep.ticket.ticket for ep in full.endpoints]
            out[path] = tickets
    return out


class _TicketPartition(InputPartition):
    def __init__(self, location: str, ticket: bytes):
        self.location = location
        self.ticket = ticket


def _read_ticket(location: str, ticket: bytes) -> Iterator:
    import pyarrow.flight as fl

    with _connect(location) as client:
        reader = client.do_get(fl.Ticket(ticket))
        for chunk in reader:
            if chunk.data is not None and chunk.data.num_rows:
                yield chunk.data


class CrestFlightStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.location = options["location"]
        self.prefix = options.get("prefix", "")
        # backpressure knob (the file source's maxFilesPerTrigger analog):
        # cap how many NEW flights one micro-batch may ingest, so a large
        # backlog at stream start drains in bounded batches instead of one
        # giant catch-up batch. 0 / unset = unlimited.
        self.max_per_trigger = int(options.get("maxFlightsPerTrigger", "0"))
        self._last_end: str | None = None  # last offset this reader emitted
        # Highest engine position this reader KNOWS about. A restarted
        # reader can't see the checkpointed offset until the engine's
        # first partitions(start, end) call reveals it (the engine even
        # calls latestOffset() BEFORE initialOffset() on a fresh
        # stream), so a capped latestOffset may emit an end that sorts
        # below the checkpoint and land in the offset log. The floor
        # makes that harmless: partitions() clamps its effective start
        # to it, so the later sweep batch (regressed_end, position]
        # plans empty instead of re-ingesting committed flights.
        self._floor: str | None = None
        # last (start, end) -> partitions, so a re-plan of the identical
        # range (engine-side re-execution) returns the same partitions
        # rather than being clamped empty by the floor
        self._plan_cache: tuple[tuple[str, str], list] | None = None

    def initialOffset(self) -> dict:
        # consume the server's whole backlog from the start: listed
        # flights ARE the data (unlike the table stream, where history
        # is served better by a batch read). Only called when no
        # checkpoint exists, so '' is the engine's true position.
        if self._floor is None:
            self._floor = ""
        return {"last": ""}

    def latestOffset(self) -> dict:
        floor = max(self._last_end or "", self._floor or "")
        paths = _list_paths(self.location, self.prefix)
        if not paths:
            # an empty listing (server GC'd everything) must not reset
            # the watermark below what was already consumed
            end = floor
        else:
            end = paths[-1]
            if self.max_per_trigger > 0:
                # advance at most N names past the watermark, so a
                # large backlog drains in bounded batches
                pending = [p for p in paths if p > floor]
                if pending:
                    end = pending[: self.max_per_trigger][-1]
                else:
                    end = floor
            if end < floor:
                end = floor  # expired listing: never regress
        self._last_end = end
        return {"last": end}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        key = (start["last"], end["last"])
        if self._plan_cache is not None and self._plan_cache[0] == key:
            return self._plan_cache[1]
        # never re-read below the engine's highest known position (see
        # _floor above); on the very first call the floor is unknown
        # and start IS the engine's checkpoint — replay verbatim
        lo = max(start["last"], self._floor or "")
        parts: list[InputPartition] = []
        if lo < end["last"]:
            endpoints = _list_endpoints(self.location, self.prefix)
            for path in sorted(endpoints):
                if lo < path <= end["last"]:
                    parts.extend(
                        _TicketPartition(self.location, t)
                        for t in endpoints[path]
                    )
        self._floor = max(self._floor or "", start["last"], end["last"])
        parts = parts or [_TicketPartition(self.location, b"")]
        self._plan_cache = (key, parts)
        return parts

    def read(self, partition: _TicketPartition) -> Iterator:  # executor-side
        if not partition.ticket:
            return
        yield from _read_ticket(partition.location, partition.ticket)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint


class CrestFlightBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.location = options["location"]
        self.prefix = options.get("prefix", "")

    def partitions(self) -> Sequence[InputPartition]:
        endpoints = _list_endpoints(self.location, self.prefix)
        parts: list[InputPartition] = [
            _TicketPartition(self.location, t)
            for path in sorted(endpoints)
            for t in endpoints[path]
        ]
        return parts or [_TicketPartition(self.location, b"")]

    def read(self, partition: _TicketPartition) -> Iterator:  # executor-side
        if not partition.ticket:
            return
        yield from _read_ticket(partition.location, partition.ticket)


class CrestFlightDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crest_flight"

    def schema(self) -> StructType:
        """GetFlightInfo schema fetch (flight_reader.go:119-150): the
        schema of the first listed flight, deserialized then converted
        to Spark types. Callers that know the schema up front can skip
        this roundtrip entirely with ``.schema(ddl)`` on the reader
        (letting a stream start against a server that has not published
        its first flight yet); this method only runs when no
        user-provided schema exists."""
        from pyspark.sql.pandas.types import from_arrow_schema

        location = self.options["location"]
        prefix = self.options.get("prefix", "")
        paths = _list_paths(location, prefix)
        if not paths:
            raise FileNotFoundError(
                f"no flights at {location} matching prefix {prefix!r}"
            )
        import pyarrow.flight as fl

        with _connect(location) as client:
            info = client.get_flight_info(
                fl.FlightDescriptor.for_path(*paths[0].split("/"))
            )
            return from_arrow_schema(info.schema)

    def reader(self, schema: StructType) -> CrestFlightBatchReader:
        return CrestFlightBatchReader(self.options)

    def streamReader(self, schema: StructType) -> CrestFlightStreamReader:
        return CrestFlightStreamReader(self.options)


def register_flight_source(spark) -> None:
    """Register the ``crest_flight`` format on this session.

    Pickle-by-value is REQUIRED: the class is unpickled in dedicated
    Python workers that can't import this package."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(CrestFlightDataSource)
