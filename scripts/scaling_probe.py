"""Core-count scaling probe at an amplified scale (VERDICT r12 #8).

At the bench SF (sf0.1, cached inputs) every query is overhead/driver
bound, so 8-core vs 32-core ratios sit near 1 and the bench cannot
demonstrate parallel scale-out.  This probe builds a DETERMINISTIC
amplified copy of the data-bound tables (k unioned copies of
events/lineitem/orders/documents, other tables copied as-is) and times
a data-bound query subset through bench_subset's exact protocol at two
core counts.  Run it twice:

    SPARK_GRAFT_CPUS=32 python scripts/scaling_probe.py build+run
    SPARK_GRAFT_CPUS=8  python scripts/scaling_probe.py run

and compare the two JSON lines (committed as SCALING_r13.json by the
round record).  Amplification is volume-only (duplicated rows), so only
aggregation/join/window/text-count families are probed — pair-quadratic
operators (dedup/similarity) are excluded by design.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

AMPLIFY = int(os.environ.get("SPARK_GRAFT_SCALE_AMPLIFY", "64"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = f"/tmp/spark_graft_scale_probe_x{AMPLIFY}"
QUERIES = [
    "q03_group_agg",
    "q05_join_agg",
    "q08_wide_agg",
    "q21_token_freq",
    "events_hop_window",
    "events_session_window_tvf",
    "lm_stupid_backoff",
    "text_token_stats",
]
BIG = ("events", "lineitem", "orders", "documents")


def build() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flink_cdc_log_connectors_spark.io import TABLES
    from flink_cdc_log_connectors_spark.session import get_spark

    if os.path.exists(os.path.join(DST, "_READY")):
        return
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    spark = get_spark("scale-probe-build")
    for name in TABLES:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        if name in BIG:
            df = spark.read.parquet(src)
            out = df
            for _ in range(AMPLIFY - 1):
                out = out.unionAll(df)
            # split like a real large input (one ~file per 8 MB)
            n = max(8, min(64, AMPLIFY * 4))
            out.repartition(n).write.mode("overwrite").parquet(dst)
        else:
            shutil.copyfile(src, dst)
    open(os.path.join(DST, "_READY"), "w").close()
    spark.stop()


def run() -> None:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = DST
    env.setdefault("SPARK_GRAFT_BENCH_RUNS", "2")
    here = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "bench_subset.py"), *QUERIES],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    timings = json.loads(out.stdout.strip().splitlines()[-1])
    print(
        json.dumps(
            {
                "cpus": int(env.get("SPARK_GRAFT_CPUS", "0") or 0),
                "amplify": AMPLIFY,
                "queries": timings,
                "total": round(sum(timings.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build+run"
    if "build" in mode:
        build()
    if "run" in mode:
        run()
