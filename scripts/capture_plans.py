"""Capture `.explain("formatted")` of named registry queries to
plans/<tag>/<query>_<suffix>.txt — the judge-checkable before/after plan
record for an optimization round.

Usage: python scripts/capture_plans.py <tag> <suffix> q1 [q2 ...]
       (e.g. capture_plans.py r13 before changelog_join_replay)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_log_connectors_spark.registry import all_queries
from flink_cdc_log_connectors_spark.session import get_spark


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    qmap = all_queries()
    for name in names:
        fn, _sql = qmap[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
