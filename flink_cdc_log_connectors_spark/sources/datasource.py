"""``cdclog`` — a Python DataSource exposing a change log to Spark, batch and
streaming.

This is the engine's leaf source, the analogue of the reference's
``MySqlSource`` (S1) / ``DebeziumSourceFunction`` (S2) specialized to the
file-backed dialect (Debezium-JSON lines): a directory of ``*.jsonl`` files
in lexicographic order IS the log (file, line) ≡ (binlog file, position).
Live-DB dialects plug in behind the same offset/startup surface (S3's
dialect SPI) — see ``sources/offsets.py``.

Layering (Spark-first): the Python reader stays THIN — it ships raw
envelope JSON strings plus their (file, pos) offsets; all deserialization
happens JVM-side via ``parse_debezium`` (``from_json``).  Python touches
each line only to frame it, never to parse it (except the timestamp-seek
filter, which must inspect ``ts_ms`` — reference L4,
``SeekBinlogToTimestampFilter.java``).

Semantics mirrored from the reference:

- **Hybrid snapshot→log phases** (P9, ``MySqlHybridSplitAssigner``):
  ``initial`` startup serves the snapshot files first (as synthesized
  ``op='r'`` envelopes), then tails the log from the snapshot's pinned
  position.  The offset JSON carries the phase.
- **Startup modes** (§2.6): initial / earliest / latest / timestamp /
  specific offset.
- **Exactly-once replay** (C3/C4): offsets are pure JSON in the Structured
  Streaming offset log; ``readBetweenOffsets`` re-serves any committed
  range deterministically.
- **Single-reader log phase**: the simple stream reader is driver-side,
  parallelism 1 — the reference makes the same choice for ordering
  (``docs/content/connectors/mysql-cdc.md:408``); downstream stages
  repartition freely.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

from .offsets import StartupMode, StartupOptions

#: raw schema shipped by the reader; parse_debezium turns it into change rows
RAW_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
    ]
)

DEFAULT_BATCH_LINES = 10_000


def _log_files(path: str) -> list[str]:
    log_dir = os.path.join(path, "log")
    if not os.path.isdir(log_dir):
        log_dir = path
    return sorted(
        f for f in os.listdir(log_dir) if f.endswith(".jsonl")
    )


def _log_dir(path: str) -> str:
    log_dir = os.path.join(path, "log")
    return log_dir if os.path.isdir(log_dir) else path


def _snapshot_files(snapshot_path: str | None) -> list[str]:
    if not snapshot_path:
        return []
    if os.path.isfile(snapshot_path):
        return [snapshot_path]
    return sorted(
        os.path.join(snapshot_path, f)
        for f in os.listdir(snapshot_path)
        if f.endswith(".jsonl")
    )


def _wrap_snapshot_row(line: str) -> str:
    """Plain row JSON → synthesized snapshot envelope (op='r')."""
    return (
        '{"after": ' + line.rstrip("\n")
        + ', "op": "r", "source": {"snapshot": "true"}}'
    )


class CdcLogStreamReader(SimpleDataSourceStreamReader):
    """Driver-side log tailer with snapshot→log phase handoff."""

    def __init__(self, options: dict[str, str]) -> None:
        self.path = options["path"]
        self.snapshot_path = options.get("snapshotpath") or options.get(
            "snapshotPath"
        )
        self.startup = StartupOptions.parse(options.get("startingoffsets", "initial"))
        self.max_lines = int(options.get("maxlinesperbatch", DEFAULT_BATCH_LINES))

    def _wrap_snapshot_row(self, line: str) -> str:
        """Envelope synthesized for a snapshot/initial-load row; dialect
        subclasses override (e.g. Mongo wraps as a change-stream insert)."""
        return _wrap_snapshot_row(line)

    def _snapshot_file_list(self) -> list[str]:
        """Files served in the snapshot phase, in order.  Dialects with
        their own discovery (e.g. Mongo collection-regex matching)
        override this; the index into this list is what the snapshot
        offset's ``snap_idx`` pins, so the list must be deterministic."""
        return _snapshot_files(self.snapshot_path)

    def _wrap_snapshot_row_for(self, path: str, line: str) -> str:
        """Per-file wrap hook: ``path`` identifies which snapshot file the
        row came from (Mongo derives the (db, collection) namespace from
        it).  Default ignores the path."""
        return self._wrap_snapshot_row(line)

    def _post_snapshot_log_start(self, start: dict) -> dict:
        """Log cursor to hand off to when the snapshot phase completes.
        The file dialect replays the WHOLE log (its log lines carry the
        deltas the snapshot predates); dialects that capture a resume
        token before the copy override this to start there."""
        return {"phase": "log", "file": "", "pos": 0}

    # -- offset helpers ----------------------------------------------------
    def _end_of_log(self) -> dict[str, Any]:
        files = _log_files(self.path)
        if not files:
            return {"phase": "log", "file": "", "pos": 0}
        last = files[-1]
        with open(os.path.join(_log_dir(self.path), last)) as fh:
            n = sum(1 for _ in fh)
        return {"phase": "log", "file": last, "pos": n}

    def initialOffset(self) -> dict:
        mode = self.startup.mode
        if mode == StartupMode.INITIAL and self.snapshot_path:
            return {"phase": "snapshot", "snap_idx": 0, "snap_line": 0}
        if mode == StartupMode.LATEST:
            return self._end_of_log()
        if mode == StartupMode.SPECIFIC:
            off = self.startup.specific_offset
            return {"phase": "log", "file": off.file, "pos": off.pos}
        # earliest / timestamp / initial-without-snapshot: log from begin
        return {"phase": "log", "file": "", "pos": 0}

    # -- reading -----------------------------------------------------------
    def _read_snapshot(self, start: dict) -> Tuple[list[tuple], dict]:
        files = self._snapshot_file_list()
        rows: list[tuple] = []
        idx, line_no = start["snap_idx"], start["snap_line"]
        while idx < len(files) and len(rows) < self.max_lines:
            with open(files[idx]) as fh:
                for i, line in enumerate(fh):
                    if i < line_no or not line.strip():
                        continue
                    rows.append((self._wrap_snapshot_row_for(files[idx], line), None, None))
                    line_no = i + 1
                    if len(rows) >= self.max_lines:
                        break
            if len(rows) < self.max_lines:
                idx, line_no = idx + 1, 0
        if idx >= len(files):
            # snapshot complete → transition to log phase (P9 handoff) and
            # keep serving from the log within the same batch if room remains
            # (the single assigner thread of MySqlHybridSplitAssigner.getNext
            # does exactly this switch)
            log_start = self._post_snapshot_log_start(start)
            if len(rows) < self.max_lines:
                # budget-limited: the log cursor must advance EXACTLY as far
                # as the rows actually emitted in this batch (a larger read
                # + truncation would silently drop rows on replay)
                more, nxt = self._read_log(log_start, limit=self.max_lines - len(rows))
                rows.extend(more)
                return rows, nxt
            return rows, log_start
        nxt = dict(start)
        nxt.update({"phase": "snapshot", "snap_idx": idx, "snap_line": line_no})
        return rows, nxt

    def _ts_filter(self, line: str) -> bool:
        """Timestamp-seek (L4): drop events before the target ts."""
        if self.startup.mode != StartupMode.TIMESTAMP:
            return True
        try:
            env = json.loads(line)
        except json.JSONDecodeError:
            return True
        ts = env.get("ts_ms") or (env.get("source") or {}).get("ts_ms") or 0
        return ts >= (self.startup.timestamp_ms or 0)

    def _read_log(self, start: dict, limit: int | None = None) -> Tuple[list[tuple], dict]:
        limit = self.max_lines if limit is None else limit
        rows: list[tuple] = []
        cur_file, cur_pos = start.get("file", ""), int(start.get("pos", 0))
        log_dir = _log_dir(self.path)
        for fname in _log_files(self.path):
            if fname < cur_file:
                continue
            start_line = cur_pos if fname == cur_file else 0
            with open(os.path.join(log_dir, fname)) as fh:
                for i, line in enumerate(fh):
                    if i < start_line or not line.strip():
                        continue
                    if self._ts_filter(line):
                        rows.append((line.rstrip("\n"), fname, i))
                    cur_file, cur_pos = fname, i + 1
                    if len(rows) >= limit:
                        return rows, {"phase": "log", "file": cur_file, "pos": cur_pos}
        return rows, {"phase": "log", "file": cur_file, "pos": cur_pos}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        if start.get("phase") == "snapshot":
            rows, nxt = self._read_snapshot(start)
        else:
            rows, nxt = self._read_log(start)
        return iter(rows), nxt

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Deterministic replay of a committed range (exactly-once recovery)."""
        rows, cursor = self.read(start)
        out = list(rows)
        # keep reading until we reach `end` (ranges are small per microbatch)
        while cursor != end and cursor.get("phase") == "snapshot":
            more, cursor = self.read(cursor)
            out.extend(more)
        if end.get("phase") == "log":
            limit = (end.get("file", ""), int(end.get("pos", 0)))
            out = [
                r
                for r in out
                if r[1] is None or (r[1], r[2] + 1) <= limit
            ]
        return iter(out)

    def commit(self, end: dict) -> None:
        # File log needs no source-side ack (the reference's C8 commits
        # offsets back to the DB engine; SS's offset log already has them).
        pass


class _FilePartition(InputPartition):
    def __init__(self, kind: str, path: str, fname: str | None) -> None:
        self.kind = kind
        self.path = path
        self.fname = fname


class CdcLogBatchReader(DataSourceReader):
    """Bounded read of snapshot + full log — one partition per file
    (executor-parallel, the moral equivalent of snapshot split assignment)."""

    def __init__(self, options: dict[str, str]) -> None:
        self.path = options["path"]
        self.snapshot_path = options.get("snapshotpath") or options.get(
            "snapshotPath"
        )

    def _wrap_snapshot_row(self, line: str) -> str:
        return _wrap_snapshot_row(line)

    def partitions(self) -> list[InputPartition]:
        parts: list[InputPartition] = [
            _FilePartition("snapshot", p, None)
            for p in _snapshot_files(self.snapshot_path)
        ]
        parts.extend(
            _FilePartition("log", os.path.join(_log_dir(self.path), f), f)
            for f in _log_files(self.path)
        )
        return parts or [_FilePartition("empty", "", None)]

    #: lines per Arrow batch handed to the JVM
    _ARROW_BATCH = 1 << 16

    def read(self, partition: _FilePartition) -> Iterator:
        """Yield ``pyarrow.RecordBatch``es, not row tuples: the Python
        data-source row path pickles tuple-at-a-time, Arrow batches move
        the same lines in one columnar buffer (~10× on wide logs).  JSON
        decoding still happens JVM-side (``from_json``) — Python only
        ships raw lines."""
        if partition.kind == "empty":
            return
        import pyarrow as pa

        snapshot = partition.kind == "snapshot"

        def batch(vals, fnames, idxs):
            return pa.record_batch(
                [
                    pa.array(vals, type=pa.string()),
                    pa.array(fnames, type=pa.string()),
                    pa.array(idxs, type=pa.int64()),
                ],
                names=["value", "file", "pos"],
            )

        vals: list[str] = []
        fnames: list[str | None] = []
        idxs: list[int | None] = []
        with open(partition.path) as fh:
            for i, line in enumerate(fh):
                if not line.strip():
                    continue
                if snapshot:
                    vals.append(self._wrap_snapshot_row(line))
                    fnames.append(None)
                    idxs.append(None)
                else:
                    vals.append(line.rstrip("\n"))
                    fnames.append(partition.fname)
                    idxs.append(i)
                if len(vals) >= self._ARROW_BATCH:
                    yield batch(vals, fnames, idxs)
                    vals, fnames, idxs = [], [], []
        if vals:
            yield batch(vals, fnames, idxs)


class CdcLogDataSource(DataSource):
    """``spark.readStream.format("cdclog")`` / ``spark.read.format("cdclog")``.

    Options: ``path`` (log dir), ``snapshotPath`` (initial state, op='r'),
    ``startingOffsets`` (initial|earliest|latest|timestamp:<ms>|file:<f>:<pos>),
    ``maxLinesPerBatch``.
    """

    @classmethod
    def name(cls) -> str:
        return "cdclog"

    def schema(self) -> T.StructType:
        return RAW_SCHEMA

    def _preflight(self) -> None:
        # C10 pre-flight: submission-time errors with fixes, not
        # first-microbatch stack traces (MySqlValidator's contract)
        if str(self.options.get("validatepreflight", "true")).lower() != "false":
            from .validators import validate_file_dialect

            validate_file_dialect(self.options)

    def reader(self, schema: T.StructType) -> DataSourceReader:
        self._preflight()
        return CdcLogBatchReader(self.options)

    def simpleStreamReader(self, schema: T.StructType) -> SimpleDataSourceStreamReader:
        self._preflight()
        return CdcLogStreamReader(self.options)


def register(spark) -> None:
    """Register the cdclog source on a session (idempotent)."""
    spark.dataSource.register(CdcLogDataSource)
