"""Oracle result-type lint (driver-comparator safety).

The driver compares Spark and DuckDB results via stringified cells; DuckDB
HUGEINT (the default type of SUM over BIGINT) stringifies differently
depending on the fetch path (native client int vs pandas float64), which
made `sessionize_events` hash-red for three rounds on byte-identical
values.  The lint DESCRIBEs every registered oracle and rejects int128
output columns, enforcing the repo-wide CAST(... AS BIGINT) discipline.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.selfcheck import lint_oracle_types

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    from flink_cdc_log_connectors_spark.io import TABLES

    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_lint_fires_on_uncast_sum(con):
    # SUM over BIGINT is HUGEINT in DuckDB — the exact sessionize bug class.
    bad = lint_oracle_types(
        con, "SELECT o_custkey, SUM(o_orderkey) AS s FROM orders GROUP BY 1"
    )
    assert bad == ["s HUGEINT"]


def test_lint_clean_on_cast_sum(con):
    assert (
        lint_oracle_types(
            con,
            "SELECT o_custkey, CAST(SUM(o_orderkey) AS BIGINT) AS s"
            " FROM orders GROUP BY 1",
        )
        == []
    )


def test_lint_fires_on_decimal_output(con):
    # DECIMAL outputs stringify "1.20" natively vs 1.2 via pandas — the
    # same ambiguity class; intermediates are fine, outputs must cast
    bad = lint_oracle_types(
        con, "SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders"
    )
    assert bad == ["p DECIMAL(18,2)"]
    assert (
        lint_oracle_types(
            con,
            "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)"
            " AS p FROM orders",
        )
        == []
    )


def test_lint_fires_inside_nested_types(con):
    bad = lint_oracle_types(
        con, "SELECT LIST_VALUE(SUM(o_orderkey)) AS l FROM orders"
    )
    assert bad and bad[0].startswith("l ")
    # STRUCT- and MAP-nested int128/decimal outputs are the same
    # ambiguity class and must fire too (pre-r6 the matcher only caught
    # leading/list positions)
    assert lint_oracle_types(
        con, "SELECT {'n': SUM(o_orderkey)} AS st FROM orders"
    )
    assert lint_oracle_types(
        con, "SELECT MAP([1], [SUM(o_orderkey)]) AS m FROM orders"
    )
    assert lint_oracle_types(
        con,
        "SELECT {'p': CAST(o_totalprice AS DECIMAL(18,2))} AS st FROM orders",
    )


def test_every_registered_oracle_is_int128_free(con):
    from flink_cdc_log_connectors_spark.registry import all_queries

    offenders = {}
    for name, (_fn, sql) in sorted(all_queries().items()):
        if sql is None:
            continue
        bad = lint_oracle_types(con, sql)
        if bad:
            offenders[name] = bad
    assert offenders == {}, f"uncast int128 oracle outputs: {offenders}"
