"""Relational query surface vs DuckDB at sf0.001 — a fast in-tree mirror
of the driver's t2 gate (full run: scripts/selfcheck.py)."""

from __future__ import annotations

import duckdb
import pytest

from flink_cdc_log_connectors_spark.io import TABLES
from flink_cdc_log_connectors_spark.registry import all_queries

from scripts.selfcheck import hash_rows


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


SMOKE = [
    "q03_group_agg",
    "q08_wide_agg",
    "q10a_topk_window",
    "q14_changelog_materialize",
    "q16_tumbling_window",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_token_stats",
]


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = all_queries()[name]
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert hash_rows(list(sdf.columns), srows) == hash_rows(dcols, drows)
