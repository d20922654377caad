"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name).

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
       python scripts/selfcheck.py --json SELFCHECK_r3.json [sf_dir]

``--json OUT`` additionally writes one record per query (match status +
row counts) so the FULL registry's correctness lands on the committed
record even when the driver's own file holds a bounded row window.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flink_cdc_log_connectors_spark.io import TABLES
from flink_cdc_log_connectors_spark.registry import all_queries
from flink_cdc_log_connectors_spark.session import get_spark


# DuckDB result types whose stringification differs between fetch paths
# (native client vs pandas .df()): HUGEINT/UHUGEINT map to float64/object in
# pandas, so "57" becomes "57.0" under a pandas-based comparator even when
# the values are identical.  Every oracle must CAST sums of integer columns
# to BIGINT (the repo-wide discipline; sessionize_events was red for three
# rounds on exactly this).  DECIMAL is the same class ("1.20" native vs
# 1.2 float64) — intermediate DECIMAL arithmetic is fine (and used for
# 2-decimal exactness), but every output column must cast to DOUBLE/BIGINT;
# verified repo-wide clean before adding it here.
AMBIGUOUS_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


# Known latent stringification hazard (documented, not lint-able): Spark
# round(-1e-9, 6) returns +0.0 while DuckDB/Python return -0.0, whose
# reprs differ ("0.0" vs "-0.0").  Only outputs that can round to
# EXACTLY zero from below are exposed (ulp-class); if an entry ever goes
# hash-red with identical-looking values, check for -0.0 first and
# normalize BOTH sides with `+ 0.0` (IEEE: -0.0 + 0.0 = +0.0).


def lint_oracle_types(con, sql: str) -> list[str]:
    """DESCRIBE the oracle in DuckDB and return ``"col TYPE"`` strings for
    any output column whose type stringifies differently across DuckDB
    fetch paths (currently the int128 family).  Empty list = clean."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for col, typ, *_ in rows:
        base = typ.upper()
        # plain substring match: catches the bare types AND any nesting
        # (HUGEINT[], STRUCT(n HUGEINT), MAP(INTEGER, DECIMAL(18,2)), ...)
        # — no DuckDB type name contains these words otherwise
        if any(t in base for t in AMBIGUOUS_ORACLE_TYPES):
            bad.append(f"{col} {typ}")
    return bad


def normalize_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("selfcheck")
    failures = []
    for name, (fn, sql) in sorted(all_queries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        t_spark = time.time() - t0
        if sql is None:
            print(f"  {name}: rows-only rows={len(srows)} ({t_spark:.1f}s)")
            records[name] = {
                "check": "rows_only",
                "spark_rows": len(srows),
                "ok": len(srows) > 0,
            }
            if len(srows) == 0:
                failures.append((name, "zero rows (rows-only check)"))
            continue
        type_lint = lint_oracle_types(con, sql)
        t0 = time.time()
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        problems = []
        if type_lint:
            problems.append(f"oracle type lint: {type_lint}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            hs, hd = hash_rows(scols, srows), hash_rows(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = {tuple(normalize_cell(r[i]) for i in order_s) for r in srows}
                set_d = {tuple(normalize_cell(r[i]) for i in order_d) for r in drows}
                for x in list(set_s - set_d)[:3]:
                    print(f"    spark-only: {x}")
                for x in list(set_d - set_s)[:3]:
                    print(f"    duck-only:  {x}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"  {name}: FAIL {problems} ({t_spark:.1f}s/{t_duck:.1f}s)")
        else:
            print(f"  {name}: OK rows={len(srows)} ({t_spark:.1f}s/{t_duck:.1f}s)")
        records[name] = {
            "check": "full_oracle",
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "ok": not problems,
            "problems": problems,
        }

    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(records), "queries": records},
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out} ({len(records)} queries)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
