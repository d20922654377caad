"""Persisted database schema history (C5) — the engine's analogue of the
reference's ``FlinkDatabaseHistory`` / Debezium's file database history.

The DDL side channel (``schema_change_events``) tells a consumer that a
table's shape changed, but that knowledge must SURVIVE restarts: a
restarted stream re-parses history from its committed offset and needs
the schema each envelope was written under.  The reference keeps these
records in operator state (``FlinkDatabaseSchemaHistory``); Structured
Streaming checkpoints don't carry user state for sources, so this module
persists them next to the checkpoint as an append-only JSONL record log:

    {"seq": n, "table": t, "schema": <StructType.json()>,
     "ddl": "...", "offset": {...}, "ts_ms": ...}

Append-only + line-atomic recovery (a torn final line from a crash is
ignored) — the same durability contract as Debezium's
``FileDatabaseHistory``.  Restore is "latest record per table", and
``restore_schemas`` hands back live ``StructType``s ready to feed
``plan_schema_evolution`` / ``parse_debezium`` on restart.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T


class SchemaHistory:
    """Append-only schema-change record log under ``path``."""

    FILENAME = "schema-history.jsonl"

    def __init__(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self.file = os.path.join(path, self.FILENAME)
        recs, torn = self._scan()
        if torn:
            # a crash mid-append left a torn tail: truncate it NOW (atomic
            # rewrite), otherwise later appends would land after garbage
            # and be unreachable to recovery; the lost DDL is re-recorded
            # when its envelope is replayed from the committed offset
            tmp = self.file + ".tmp"
            with open(tmp, "w") as fh:
                for rec in recs:
                    fh.write(json.dumps(rec) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self.file)
        self._seq = len(recs)

    def _scan(self) -> tuple[list[dict], bool]:
        if not os.path.exists(self.file):
            return [], False
        out: list[dict] = []
        torn = False
        with open(self.file) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    torn = True
                    break
        return out, torn

    def _records(self) -> list[dict]:
        return self._scan()[0]

    def record(
        self,
        table: str,
        schema: T.StructType,
        ddl: str | None = None,
        offset: dict | None = None,
        ts_ms: int | None = None,
    ) -> int:
        """Durably append one schema-change record; returns its seq."""
        rec = {
            "seq": self._seq,
            "table": table,
            "schema": schema.json(),
            "ddl": ddl,
            "offset": offset or {},
            "ts_ms": ts_ms,
        }
        with open(self.file, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        self._seq += 1
        return rec["seq"]

    def restore_schemas(self) -> dict[str, T.StructType]:
        """Latest tracked schema per table (empty dict on first start)."""
        latest: dict[str, T.StructType] = {}
        for rec in self._records():
            latest[rec["table"]] = T.StructType.fromJson(json.loads(rec["schema"]))
        return latest

    def restore_offsets(self) -> dict[str, dict]:
        """Offset at which each table's latest schema became effective."""
        latest: dict[str, dict] = {}
        for rec in self._records():
            latest[rec["table"]] = rec.get("offset") or {}
        return latest

    def replay(self) -> list[dict]:
        """Full record list in append order (diagnostics / audits)."""
        return self._records()
