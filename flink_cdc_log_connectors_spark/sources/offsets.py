"""Offset model + startup modes for the CDC-log source.

Mirrors the reference's offset/startup machinery:

- ``LogOffset`` ≈ ``BinlogOffset`` (file + position, lexicographic compare —
  reference ``flink-connector-mysql-cdc-log/.../source/offset/BinlogOffset.java``)
  and the generic ``Offset`` (``flink-cdc-log-base/.../meta/offset/Offset.java``).
- ``StartupOptions`` ≈ ``StartupOptions.java:39-79`` factory methods:
  ``initial`` (snapshot + log, default), ``earliest``, ``latest``,
  ``specific_offset(file, pos)``, ``timestamp(ms)``.
- Offsets serialize to/from plain JSON dicts — the Structured Streaming
  offset log replaces the reference's versioned state serializers (C3/C4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any


@dataclass(frozen=True, order=True)
class LogOffset:
    """Position in the change log: (file, pos), totally ordered.

    The optional fields mirror the reference ``BinlogOffset.java``'s full
    state (gtid set, events/rows-to-skip past a not-row-granular position,
    and an offset ``kind`` discriminator) so a future live-MySQL dialect
    can carry them WITHOUT an offset-format migration: they serialize only
    when set, deserialize when present, and are ``compare=False`` — so
    ordering AND equality/hash are consistently (file, pos), exactly the
    reference's ``BinlogOffset.compareTo`` fallback when gtid sets are
    absent.  (Equality deliberately matches the ordering key: two offsets
    at the same log position ARE the same position for stop-offset and
    dedup checks, regardless of carried skip-state.)"""

    file: str
    pos: int
    gtid_set: str | None = field(default=None, compare=False)
    events_to_skip: int = field(default=0, compare=False)
    rows_to_skip: int = field(default=0, compare=False)
    kind: str | None = field(default=None, compare=False)

    def to_json(self) -> dict[str, Any]:
        d: dict[str, Any] = {"file": self.file, "pos": self.pos}
        if self.gtid_set is not None:
            d["gtid_set"] = self.gtid_set
        if self.events_to_skip:
            d["events_to_skip"] = self.events_to_skip
        if self.rows_to_skip:
            d["rows_to_skip"] = self.rows_to_skip
        if self.kind is not None:
            d["kind"] = self.kind
        return d

    @staticmethod
    def from_json(d: dict[str, Any]) -> "LogOffset":
        return LogOffset(
            file=d["file"],
            pos=int(d["pos"]),
            gtid_set=d.get("gtid_set"),
            events_to_skip=int(d.get("events_to_skip", 0)),
            rows_to_skip=int(d.get("rows_to_skip", 0)),
            kind=d.get("kind"),
        )


#: sentinel offsets (BinlogOffset.INITIAL_OFFSET / NO_STOPPING_OFFSET analogues)
EARLIEST = LogOffset(file="", pos=-1)


class StartupMode(str, Enum):
    INITIAL = "initial"
    EARLIEST = "earliest-offset"
    LATEST = "latest-offset"
    SPECIFIC = "specific-offset"
    TIMESTAMP = "timestamp"


@dataclass(frozen=True)
class StartupOptions:
    mode: StartupMode
    specific_offset: LogOffset | None = None
    timestamp_ms: int | None = None

    @staticmethod
    def initial() -> "StartupOptions":
        return StartupOptions(StartupMode.INITIAL)

    @staticmethod
    def earliest() -> "StartupOptions":
        return StartupOptions(StartupMode.EARLIEST)

    @staticmethod
    def latest() -> "StartupOptions":
        return StartupOptions(StartupMode.LATEST)

    @staticmethod
    def specific(file: str, pos: int) -> "StartupOptions":
        return StartupOptions(StartupMode.SPECIFIC, specific_offset=LogOffset(file, pos))

    @staticmethod
    def timestamp(ts_ms: int) -> "StartupOptions":
        return StartupOptions(StartupMode.TIMESTAMP, timestamp_ms=ts_ms)

    @staticmethod
    def parse(value: str) -> "StartupOptions":
        """Parse the ``startingOffsets`` option string (Kafka-source-style):
        ``initial`` | ``earliest`` | ``latest`` | ``timestamp:<ms>`` |
        ``file:<name>:<pos>``."""
        v = value.strip().lower()
        if v in ("initial", ""):
            return StartupOptions.initial()
        if v in ("earliest", "earliest-offset"):
            return StartupOptions.earliest()
        if v in ("latest", "latest-offset"):
            return StartupOptions.latest()
        if v.startswith("timestamp:"):
            return StartupOptions.timestamp(int(v.split(":", 1)[1]))
        if v.startswith("file:"):
            # the position is the LAST colon-separated field, so file
            # names containing colons (paths, windows drives) survive
            rest = value.strip().split(":", 1)[1]
            file, _, pos = rest.rpartition(":")
            if not file:
                raise ValueError(
                    f"startingOffsets file form needs file:<name>:<pos>: "
                    f"{value!r}"
                )
            return StartupOptions.specific(file, int(pos))
        raise ValueError(f"unsupported startingOffsets: {value!r}")
