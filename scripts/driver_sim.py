"""Simulate the DRIVER's verify path: vanilla SparkSession (none of our
engine confs), import __spark_entry__, run entry() + queries() vs oracle_sql()
at sf0.01 — the same row-count/columns/value-hash gate the driver applies."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e
from scripts.selfcheck import hash_rows

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# Vanilla session, as the driver would build it (no engine-tuned confs).
# DRIVER_SIM_TZ probes non-UTC driver sessions (catches NTZ/LTZ leaks).
builder = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
)
tz = os.environ.get("DRIVER_SIM_TZ")
if tz:
    builder = builder.config("spark.sql.session.timeZone", tz)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

print("== entry() smoke ==")
df = e.entry(spark)
rows = df.collect()
print(f"entry rows={len(rows)} schema={df.schema.simpleString()}")
assert len(rows) >= 0

con = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = e.queries(), e.oracle_sql()
fail = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if name not in oracles:
        status = "rows-only"
        ok = len(srows) >= 0
        print(f"{name}: {status} rows={len(srows)}")
        continue
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok = (
        sorted(scols) == sorted(dcols)
        and len(srows) == len(drows)
        and hash_rows(scols, srows) == hash_rows(dcols, drows)
    )
    print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(srows)}/{len(drows)}")
    if not ok:
        fail.append(name)

print("RESULT:", "FAIL " + ",".join(fail) if fail else "ALL MATCH")
sys.exit(1 if fail else 0)
