"""Inventory changelog fixture — FIXTURES.md A1 (reference
``flink-connector-mysql-cdc-log/src/test/resources/ddl/inventory.sql:21-38``
seed + the MySqlConnectorITCase.java:193-206 change script)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

PRODUCTS_PHYSICAL = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("weight", T.DoubleType(), True),
    ]
)

SEED = [
    (101, "scooter", "Small 2-wheel scooter", 3.14),
    (102, "car battery", "12V car battery", 8.1),
    (103, "12-pack drill bits", "12-pack of drill bits", 0.8),
    (104, "hammer", "12oz carpenter's hammer", 0.75),
    (105, "hammer", "14oz carpenter's hammer", 0.875),
    (106, "hammer", "16oz carpenter's hammer", 1.0),
    (107, "rocks", "box of assorted rocks", 5.3),
    (108, "jacket", "water resistent black wind breaker", 0.1),
    (109, "spare tire", "24 inch spare tire", 22.2),
]


def _row(t):
    return {"id": t[0], "name": t[1], "description": t[2], "weight": t[3]}


#: ITCase change script: 2 updates, 2 inserts, 2 updates, 1 delete
CHANGES = [
    ("u", _row((106, "hammer", "18oz carpenter hammer", 1.0)), _row(SEED[5])),
    ("u", _row((107, "rocks", "box of assorted rocks", 5.1)), _row(SEED[6])),
    ("c", _row((110, "jacket", "new water resistent white wind breaker", 0.5)), None),
    ("c", _row((111, "scooter", "Big 2-wheel scooter", 5.18)), None),
    ("u", _row((110, "jacket", "new water resistent white wind breaker", 0.5)),
     _row((110, "jacket", "water resistent white wind breaker", 0.2))),
    ("u", _row((111, "scooter", "Big 2-wheel scooter", 5.17)),
     _row((111, "scooter", "Big 2-wheel scooter", 5.18))),
    ("d", None, _row((111, "scooter", "Big 2-wheel scooter", 5.17))),
]

#: expected materialized state after snapshot + all changes
EXPECTED_FINAL = {
    101: 3.14, 102: 8.1, 103: 0.8, 104: 0.75, 105: 0.875,
    106: 1.0, 107: 5.1, 108: 0.1, 109: 22.2, 110: 0.5,
}


def write_fixture(base_dir: str, log_files: int = 2) -> tuple[str, str]:
    """Write snapshot jsonl + change-log jsonl files; returns (log_path,
    snapshot_path).  The log is split across ``log_files`` files to
    exercise multi-file offsets."""
    snap_dir = os.path.join(base_dir, "snapshot")
    log_dir = os.path.join(base_dir, "log")
    os.makedirs(snap_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(snap_dir, "state-000.jsonl"), "w") as fh:
        for t in SEED:
            fh.write(json.dumps(_row(t)) + "\n")
    envs = []
    for i, (op, after, before) in enumerate(CHANGES):
        envs.append(
            json.dumps(
                {
                    "before": before,
                    "after": after,
                    "op": op,
                    "ts_ms": 1_700_000_000_000 + i * 1000,
                    "source": {
                        "db": "inventory",
                        "table": "products",
                        "ts_ms": 1_700_000_000_000 + i * 1000,
                        "file": f"binlog.{i // max(len(CHANGES)//log_files,1):06d}",
                        "pos": i,
                    },
                }
            )
        )
    per = max(len(envs) // log_files, 1)
    for k in range(0, len(envs), per):
        with open(os.path.join(log_dir, f"log-{k//per:06d}.jsonl"), "w") as fh:
            fh.write("\n".join(envs[k : k + per]) + "\n")
    return base_dir, snap_dir
