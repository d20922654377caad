"""C10 pre-flight validators: actionable submission-time rejection
(the MySqlValidator.java:162 contract — every problem listed at once,
each with its fix)."""

from __future__ import annotations

import sqlite3

import pytest

from flink_cdc_log_connectors_spark.sources.validators import (
    ValidationError,
    validate_file_dialect,
    validate_jdbc_options,
    validate_sqlite_dialect,
)


def test_file_dialect_missing_path_and_bad_batch_size_reported_together(tmp_path):
    with pytest.raises(ValidationError) as e:
        validate_file_dialect(
            {"path": str(tmp_path / "nope"), "maxlinesperbatch": "0"}
        )
    msg = str(e.value)
    assert "does not exist" in msg and "must be positive" in msg
    assert len(e.value.problems) == 2


def test_file_dialect_rejects_non_envelope_log(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    (log / "a.jsonl").write_text('{"no_op_key": 1}\n')
    with pytest.raises(ValidationError) as e:
        validate_file_dialect({"path": str(tmp_path)})
    assert "debezium-json envelope" in str(e.value)

    (log / "a.jsonl").write_text("not json at all\n")
    with pytest.raises(ValidationError) as e:
        validate_file_dialect({"path": str(tmp_path)})
    assert "not valid JSON" in str(e.value)


def test_file_dialect_accepts_valid_layout(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    (log / "a.jsonl").write_text('{"op": "c", "after": {"id": 1}}\n')
    validate_file_dialect({"path": str(tmp_path)})  # no raise


def test_file_dialect_missing_snapshot_path(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    with pytest.raises(ValidationError) as e:
        validate_file_dialect(
            {"path": str(tmp_path), "snapshotPath": str(tmp_path / "snap")}
        )
    assert "snapshotPath" in str(e.value)


def _make_db(path, with_capture=True):
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import install_cdc

    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE items (id INTEGER PRIMARY KEY, name TEXT)")
    conn.commit()
    conn.close()
    if with_capture:
        install_cdc(path, "items")


def test_sqlite_capture_not_installed(tmp_path):
    db = str(tmp_path / "a.db")
    _make_db(db, with_capture=False)
    with pytest.raises(ValidationError) as e:
        validate_sqlite_dialect({"path": db, "table": "items"})
    assert "install_cdc" in str(e.value)


def test_sqlite_missing_table_and_key_column(tmp_path):
    db = str(tmp_path / "a.db")
    _make_db(db)
    with pytest.raises(ValidationError) as e:
        validate_sqlite_dialect({"path": db, "table": "ghost"})
    assert "does not exist" in str(e.value)

    with pytest.raises(ValidationError) as e:
        validate_sqlite_dialect(
            {"path": db, "table": "items", "keyColumn": "uuid"}
        )
    assert "keyColumn" in str(e.value) and "uuid" in str(e.value)


def test_sqlite_missing_trigger_detected(tmp_path):
    db = str(tmp_path / "a.db")
    _make_db(db)
    conn = sqlite3.connect(db)
    conn.execute("DROP TRIGGER _cdc_items_del")
    conn.commit()
    conn.close()
    with pytest.raises(ValidationError) as e:
        validate_sqlite_dialect({"path": db, "table": "items"})
    assert "_cdc_items_del" in str(e.value)


def test_sqlite_valid_setup_passes(tmp_path):
    db = str(tmp_path / "a.db")
    _make_db(db)
    validate_sqlite_dialect({"path": db, "table": "items"})  # no raise


def test_sqlite_datasource_runs_preflight(spark, tmp_path):
    """The check fires at submission via the DataSource, not mid-stream."""
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        SqliteCdcDataSource,
    )

    db = str(tmp_path / "a.db")
    _make_db(db, with_capture=False)
    ds = SqliteCdcDataSource({"path": db, "table": "items"})
    with pytest.raises(ValidationError):
        ds.simpleStreamReader(ds.schema())
    # opt-out knob for harnesses that install capture later
    ds2 = SqliteCdcDataSource(
        {"path": db, "table": "items", "validatepreflight": "false"}
    )
    ds2.simpleStreamReader(ds2.schema())  # no raise


def test_jdbc_option_rejects():
    with pytest.raises(ValidationError) as e:
        validate_jdbc_options("http://not-jdbc", None, num_chunks=0, fetch_size=-1)
    msg = str(e.value)
    assert "jdbc:" in msg and "table" in msg
    assert len(e.value.problems) == 4
    validate_jdbc_options("jdbc:derby:memory:x", "t", 8, 1024)  # no raise


def test_sqlite_connection_pooling(tmp_path):
    """C9: same (path, thread) reuses one underlying connection; close()
    on the proxy is a no-op; close_pool really closes."""
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        _connect,
        close_pool,
    )

    db = str(tmp_path / "p.db")
    _make_db(db)
    c1 = _connect(db)
    c1.close()  # returns to pool
    c2 = _connect(db)
    assert c2._conn is c1._conn
    assert c2.execute("SELECT count(*) FROM items").fetchone()[0] == 0
    assert close_pool(db) == 1
    # fresh connection after a real close
    c3 = _connect(db)
    assert c3._conn is not c1._conn
    close_pool(db)


def test_file_dialect_format_aware_discriminator(tmp_path):
    """The preflight first-line sample keys its envelope discriminator to
    the declared wire format: a canal log passes under format=canal-json
    and fails under the debezium default."""
    import json as _json

    log = tmp_path / "log"
    log.mkdir()
    canal_line = _json.dumps({
        "data": [{"id": 1}], "old": None, "type": "INSERT",
        "database": "d", "table": "t", "es": 1, "ts": 2, "pkNames": ["id"],
    })
    (log / "a.jsonl").write_text(canal_line + "\n")
    validate_file_dialect({"path": str(tmp_path), "format": "canal-json"})
    with pytest.raises(ValidationError, match="debezium-json envelope"):
        validate_file_dialect({"path": str(tmp_path)})
    ogg_line = _json.dumps({
        "table": "D.T", "op_type": "I", "op_ts": "x", "current_ts": "x",
        "pos": "1", "before": None, "after": {"id": 1},
    })
    (log / "a.jsonl").write_text(ogg_line + "\n")
    validate_file_dialect({"path": str(tmp_path), "format": "ogg-json"})
    with pytest.raises(ValidationError, match="canal-json envelope"):
        validate_file_dialect({"path": str(tmp_path),
                               "format": "canal-json"})
