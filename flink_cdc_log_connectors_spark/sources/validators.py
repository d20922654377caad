"""Pre-flight validators (C10) — fail fast at job submission with
actionable errors, before any stream starts.

The reference runs ``MySqlValidator`` (``MySqlValidator.java:162``) at
source construction: version gates (MySQL ≥ 5.6), ``binlog_format=ROW``,
``binlog_row_image=FULL`` — each failure tells the user exactly which
server setting to change.  The same contract here, per dialect:

- **file dialect** — path layout, envelope JSON sanity, option ranges;
- **sqlite live dialect** — engine version gate (WAL needs ≥ 3.7.0),
  capture installed (log table + triggers — the "binlog enabled" check),
  ``journal_mode=WAL`` (the ``binlog_format=ROW`` analogue: without it a
  chunk scan blocks the writer and the watermark bracket is meaningless),
  key-column existence for chunking;
- **jdbc snapshot** — static option checks (url scheme, ranges).

All problems are collected and reported TOGETHER (the reference throws
one ``ValidationException`` listing everything) so a misconfigured job
surfaces every fix in one round trip.
"""

from __future__ import annotations

import json
import os
import sqlite3


class ValidationError(Exception):
    """One or more pre-flight checks failed; message lists all of them."""

    def __init__(self, problems: list[str]) -> None:
        self.problems = problems
        super().__init__(
            "CDC source pre-flight validation failed:\n"
            + "\n".join(f"  - {p}" for p in problems)
        )


def _raise_if(problems: list[str]) -> None:
    if problems:
        raise ValidationError(problems)


# ---------------------------------------------------------------------------
# file dialect
# ---------------------------------------------------------------------------


def validate_file_dialect(options: dict[str, str]) -> None:
    """Path layout + envelope sanity for the Debezium-JSON file dialect."""
    problems: list[str] = []
    path = options.get("path")
    if not path:
        problems.append("option 'path' is required (directory of *.jsonl log files)")
    elif not os.path.isdir(path):
        problems.append(
            f"log path {path!r} does not exist or is not a directory; "
            "point 'path' at the directory holding the change-log *.jsonl files"
        )
    snap = options.get("snapshotpath") or options.get("snapshotPath")
    if snap and not os.path.exists(snap):
        problems.append(
            f"snapshotPath {snap!r} does not exist; remove the option for a "
            "log-only stream or point it at the initial-state *.jsonl file/dir"
        )
    max_lines = options.get("maxlinesperbatch") or options.get("maxLinesPerBatch")
    if max_lines is not None:
        try:
            if int(max_lines) <= 0:
                problems.append(
                    f"maxLinesPerBatch must be positive, got {max_lines}"
                )
        except ValueError:
            problems.append(f"maxLinesPerBatch must be an integer, got {max_lines!r}")
    # sample the first log line: catching a wrong-format file at submit
    # time beats a NULL-row surprise three stages downstream.  The
    # discriminator key depends on the declared wire format (Flink
    # 'format' DDL key, default debezium-json).
    fmt = (options.get("format") or "debezium-json").lower()
    discriminator = {
        "debezium-json": "op",
        "canal-json": "type",
        "maxwell-json": "type",
        "ogg-json": "op_type",
    }.get(fmt, "op")
    if path and os.path.isdir(path):
        log_dir = os.path.join(path, "log")
        if not os.path.isdir(log_dir):
            log_dir = path
        for fname in sorted(os.listdir(log_dir)):
            if not fname.endswith(".jsonl"):
                continue
            with open(os.path.join(log_dir, fname)) as fh:
                line = fh.readline().strip()
            if line:
                try:
                    env = json.loads(line)
                    if not isinstance(env, dict) or discriminator not in env:
                        problems.append(
                            f"first line of {fname} is not a {fmt} envelope "
                            f"(missing {discriminator!r}); is this directory "
                            "really a CDC log in the declared format?"
                        )
                except json.JSONDecodeError:
                    problems.append(
                        f"first line of {fname} is not valid JSON; the file "
                        "dialect expects one envelope object per line"
                    )
            break
    _raise_if(problems)


# ---------------------------------------------------------------------------
# sqlite live dialect
# ---------------------------------------------------------------------------

#: WAL journaling shipped in sqlite 3.7.0 — the hard floor for a
#: lock-free snapshot against a live writer
MIN_SQLITE_VERSION = (3, 7, 0)


def validate_sqlite_dialect(options: dict[str, str]) -> None:
    """Engine + capture-installation checks against the LIVE database —
    the direct analogue of MySqlValidator's server-side checks."""
    problems: list[str] = []
    ver = tuple(int(x) for x in sqlite3.sqlite_version.split("."))
    if ver < MIN_SQLITE_VERSION:
        problems.append(
            f"sqlite {sqlite3.sqlite_version} < "
            f"{'.'.join(map(str, MIN_SQLITE_VERSION))}: WAL journaling "
            "(required for lock-free snapshots) is unavailable; upgrade sqlite"
        )
    db_path = options.get("path")
    table = options.get("table")
    if not db_path:
        problems.append("option 'path' is required (the sqlite database file)")
    if not table:
        problems.append("option 'table' is required (the captured table)")
    # §2.8 connection/chunk-meta option ranges (MySqlSourceOptions parity)
    for lower, camel, kind in [
        ("connecttimeout", "connectTimeout", float),
        ("connectmaxretries", "connectMaxRetries", int),
        ("connectionpoolsize", "connectionPoolSize", int),
        ("chunkmetagroupsize", "chunkMetaGroupSize", int),
        ("chunksize", "chunkSize", int),
        ("maxeventsperbatch", "maxEventsPerBatch", int),
        ("heartbeatinterval", "heartbeatInterval", int),
    ]:
        raw = options.get(lower) or options.get(camel)
        if raw is None:
            continue
        try:
            v = kind(raw)
            positive_required = lower != "heartbeatinterval"  # 0 = disabled
            if v < 0 or (positive_required and v == 0):
                problems.append(
                    f"{camel} must be {'positive' if positive_required else '>= 0'}, got {raw}"
                )
        except (TypeError, ValueError):
            problems.append(f"{camel} must be a number, got {raw!r}")
    if not db_path or not table:
        _raise_if(problems)
        return
    if not os.path.exists(db_path):
        problems.append(f"database file {db_path!r} does not exist")
        _raise_if(problems)
        return
    conn = sqlite3.connect(db_path, timeout=30.0)
    try:
        cols = [r[1] for r in conn.execute(f"PRAGMA table_info({table})")]
        if not cols:
            problems.append(
                f"table {table!r} does not exist in {db_path}; create it "
                "before starting capture"
            )
        else:
            key_col = (
                options.get("keycolumn") or options.get("keyColumn") or "id"
            )
            if key_col not in cols:
                problems.append(
                    f"key column {key_col!r} not found in {table!r} "
                    f"(columns: {', '.join(cols)}); set the keyColumn option "
                    "to the chunking key"
                )
        # "binlog enabled": the audit log table + all three triggers
        have_log = conn.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name='_cdc_log'"
        ).fetchone()
        if not have_log:
            problems.append(
                "change capture is not installed (no _cdc_log table); run "
                f"install_cdc({db_path!r}, {table!r}) before streaming — the "
                "moral equivalent of enabling the binlog"
            )
        elif cols:
            trig = {
                r[0]
                for r in conn.execute(
                    "SELECT name FROM sqlite_master WHERE type='trigger' "
                    "AND tbl_name=?",
                    (table,),
                )
            }
            missing = {
                f"_cdc_{table}_{sfx}" for sfx in ("ins", "upd", "del")
            } - trig
            if missing:
                problems.append(
                    f"capture triggers missing on {table!r}: "
                    f"{', '.join(sorted(missing))}; re-run install_cdc — "
                    "without them writes bypass the log (binlog_format=ROW's "
                    "'some statements are not logged' failure mode)"
                )
        # binlog_format=ROW analogue: WAL so chunk scans never block writers
        mode = conn.execute("PRAGMA journal_mode").fetchone()[0]
        if str(mode).lower() != "wal":
            problems.append(
                f"journal_mode={mode} but WAL is required: without WAL a "
                "snapshot chunk scan takes a read lock that stalls the "
                "writer and watermark brackets lose their meaning; run "
                "PRAGMA journal_mode=WAL (install_cdc does this)"
            )
    finally:
        conn.close()
    _raise_if(problems)


# ---------------------------------------------------------------------------
# jdbc snapshot path
# ---------------------------------------------------------------------------


def validate_jdbc_options(
    url: str | None,
    table: str | None,
    num_chunks: int | None = None,
    fetch_size: int | None = None,
) -> None:
    """Static option checks for the JDBC snapshot reader (the live-server
    probes of the reference's per-DB validators belong to its deployment
    dialects; these are the checks that need no connection)."""
    problems: list[str] = []
    if not url or not url.startswith("jdbc:"):
        problems.append(
            f"jdbc url must start with 'jdbc:', got {url!r}"
        )
    if not table:
        problems.append("table name is required for a jdbc snapshot")
    if num_chunks is not None and num_chunks <= 0:
        problems.append(f"number of chunks must be positive, got {num_chunks}")
    if fetch_size is not None and fetch_size <= 0:
        problems.append(f"fetch size must be positive, got {fetch_size}")
    _raise_if(problems)
