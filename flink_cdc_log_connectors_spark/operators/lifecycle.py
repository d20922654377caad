"""§3.1 lifecycle as the USER runs it: Flink-SQL DDL → view → spark.sql.

The reference's primary entry point is two steps — declare a CDC table in
SQL DDL (``CREATE TABLE ... WITH ('connector'=...)``), then query it with
plain SQL (reference ``README.md:40-60``; SURVEY §3.1).  The other
registry entries exercise the engine's pieces individually; this one runs
the COMPOSED user path end-to-end, oracle-checked:

1. a deterministic change log (create/update/delete envelopes derived
   from the orders table) is materialized once per (process, sf_dir);
2. ``create_table`` parses the DDL — physical schema, a METADATA VIRTUAL
   column, a computed column, PRIMARY KEY — builds the ``cdclog`` batch
   source, and registers the result as a temp view;
3. ``spark.sql`` materializes the latest state per key (changelog
   semantics over the envelope offsets) and aggregates over the
   DDL-declared metadata + computed columns — so the driver-checked plan
   contains them, not just the parser tests.

The DuckDB oracle replays the same mutations arithmetically on the plain
``orders`` view — the engine must reconstruct exactly that state from the
envelope log.

Scale: fixture generation is one distributed ``to_json`` write; the query
itself is one hash shuffle (window by key) + one aggregation — identical
shape to q14_changelog_materialize, which is the scalable changelog-
materialization formulation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

#: mutation classes keyed off o_orderkey (disjoint: 51 is odd, updates even)
_UPDATED = "o_orderkey % 10 = 0"
_DELETED = "o_orderkey % 100 = 51"


def _fixture_dir(sf_dir: str) -> str:
    import hashlib

    # basename for readability + full-path hash for identity: two corpora
    # that share a directory name (/a/sf0.1 vs /b/sf0.1) must not share a
    # fixture
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    digest = hashlib.md5(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:8]
    return os.path.join("/tmp", f"spark_graft_ddl_fixture_{tag}_{digest}")


def _orders_mutation_base(spark, sf_dir: str, repartition: bool = False):
    """Shared scaffolding for the three changelog generators (file
    fixture, canal roundtrip, OGG roundtrip): the projected orders scan
    and the row/updated-row/null-row structs keyed to the _UPDATED /
    _DELETED mutation classes.  One definition, so a schema or
    mutation-class change is a single edit (plus the oracle SQLs)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    if repartition:
        orders = orders.repartition(spark.sparkContext.defaultParallelism)
    row = F.struct("o_orderkey", "o_custkey", "o_orderpriority",
                   "o_totalprice")
    row_updated = F.struct(
        F.col("o_orderkey"), F.col("o_custkey"), F.col("o_orderpriority"),
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
    )
    null_row = F.lit(None).cast(
        orders.select(row.alias("r")).schema["r"].dataType
    )
    return orders, row, row_updated, null_row


def ensure_changelog_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the orders change log (idempotent, atomic).

    Every order arrives as a ``c`` envelope at pos 2·key; updated keys
    (key % 10 = 0) get a ``u`` envelope at pos 2·key+1 raising
    o_totalprice by 1; deleted keys (key % 100 = 51) get a ``d`` envelope
    at pos 2·key+1.  Envelope offsets — not file layout — define the
    per-key order, so the distributed text write needs no coordination.
    """
    root = _fixture_dir(sf_dir)
    done = os.path.join(root, "_SUCCESS")
    if os.path.exists(done):
        return root
    orders, row, row_updated, null_row = _orders_mutation_base(spark, sf_dir)

    def env(op: str, before, after, pos):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                F.struct(
                    F.lit("tpch").alias("db"),
                    F.lit("orders").alias("table"),
                    (F.col("o_orderkey") + F.lit(1_700_000_000_000)).alias(
                        "ts_ms"
                    ),
                    F.lit("000").alias("file"),
                    pos.alias("pos"),
                ).alias("source"),
            )
        )

    k2 = F.col("o_orderkey") * 2
    creates = orders.select(env("c", null_row, row, k2).alias("value"))
    updates = orders.filter(_UPDATED).select(
        env("u", row, row_updated, k2 + 1).alias("value")
    )
    deletes = orders.filter(_DELETED).select(
        env("d", row, null_row, k2 + 1).alias("value")
    )
    # staging is unique per writer (pid + random suffix): two concurrent
    # processes that both miss the _SUCCESS check must not write into the
    # same directory, or one can gut the other's files mid-publish and
    # the corrupted fixture would then be cached forever by the marker
    import uuid

    staging = f"{root}.staging.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    # Split the log over ~cores files (r13): the cdclog reader assigns
    # one partition per file, so the 3-file layout pinned the envelope
    # parse to 3 tasks regardless of session size (profiled 1.6 s
    # single-stage at 32 cores).  Per-key ordering is carried by the
    # envelopes' own source.pos offsets, so file layout is free.
    n_files = max(4, min(32, spark.sparkContext.defaultParallelism))
    (
        creates.unionAll(updates).unionAll(deletes).repartition(n_files)
        .write.mode("overwrite").text(os.path.join(staging, "log"))
    )
    # the cdclog reader serves *.jsonl — rename the text parts
    log_dir = os.path.join(staging, "log")
    for f in os.listdir(log_dir):
        if f.startswith("part-") and f.endswith(".txt"):
            os.rename(os.path.join(log_dir, f),
                      os.path.join(log_dir, f[:-4] + ".jsonl"))
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    try:
        os.replace(staging, root)  # atomic publish; loser keeps staging
    except OSError:
        import shutil

        if not os.path.exists(done):
            raise
        shutil.rmtree(staging, ignore_errors=True)
    return root


_DDL = """
CREATE TABLE orders_cdc (
  o_orderkey BIGINT,
  o_custkey BIGINT,
  o_orderpriority STRING,
  o_totalprice DOUBLE,
  db STRING METADATA FROM 'database_name' VIRTUAL,
  double_price AS o_totalprice * 2,
  PRIMARY KEY (o_orderkey) NOT ENFORCED
) WITH (
  'connector' = 'cdclog',
  'path' = '{path}'
)
"""


def ddl_lifecycle_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL → view → SQL, materializing the changelog's latest state and
    aggregating over the DDL-declared metadata + computed columns."""
    from ..sources.datasource import register
    from ..sources.sql_ddl import create_table

    path = ensure_changelog_fixture(spark, sf_dir)
    register(spark)
    create_table(spark, _DDL.format(path=path), streaming=False)
    return spark.sql(
        """
        WITH ranked AS (
          SELECT o_orderkey, o_orderpriority, db, double_price, op,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_orderkey
                   ORDER BY _src.pos DESC, _src.img_seq DESC) AS rn
          FROM orders_cdc
        )
        SELECT o_orderpriority, db,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(double_price AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_double_price
        FROM ranked
        WHERE rn = 1 AND op <> 'd'
        GROUP BY o_orderpriority, db
        ORDER BY o_orderpriority
        """
    )


#: replay the same mutations arithmetically on the plain table
DDL_LIFECYCLE_SQL = """
SELECT o_orderpriority, 'tpch' AS db,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0
                          THEN (o_totalprice + 1) * 2
                          ELSE o_totalprice * 2 END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_double_price
FROM orders
WHERE o_orderkey % 100 <> 51
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

def canal_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal-JSON ingestion end-to-end, driver-checked: orders → canal
    envelopes (same c/u/d mutation classes as the DDL fixture, generated
    with ``to_json`` in-plan — no disk round trip) → ``parse_canal_json``
    → ``apply_changelog`` materialization → aggregate.  The oracle
    replays the mutations arithmetically, so a parser regression (op
    mapping, old-overlay before-images, image explosion order) flips the
    hash.

    Plan: ONE scan of orders — each row emits its envelope variants via
    a 3-slot array explode (insert always; update/delete when its
    mutation class matches) instead of a 3-branch union, so the JSON
    encode/decode pipeline is compiled and run once, not three times
    (unions re-generate the whole codegen'd pipeline per branch —
    measured ~1 s of pure janino per extra branch at sf0.1).  Then the
    key window + aggregation — q14's materialization shape with the
    format parser in the measured path.  The early round-robin
    repartition spreads the encode+parse pipeline across all cores (the
    sf parquet is a single split; at real scale the scan has native
    parallelism and the repartition is a no-op to remove)."""
    from ..sources.formats import parse_canal_json
    from .changelog import apply_changelog
    from pyspark.sql import types as T

    orders, row, row_updated, _ = _orders_mutation_base(
        spark, sf_dir, repartition=True
    )
    old_t = "array<struct<o_totalprice:double>>"
    k2 = (F.col("o_orderkey") * 2).cast("long")

    def variant(typ: str, data, old, es):
        return F.struct(
            F.lit(typ).alias("typ"),
            data.alias("data"),
            old.alias("old"),
            es.alias("es"),
        )

    null_old = F.lit(None).cast(old_t)
    variants = F.array(
        variant("INSERT", row, null_old, k2),
        F.when(
            F.expr(_UPDATED),
            variant("UPDATE", row_updated,
                    F.array(F.struct(F.col("o_totalprice"))), k2 + 1),
        ),
        F.when(F.expr(_DELETED), variant("DELETE", row, null_old, k2 + 1)),
    )
    v = F.col("v")
    lines = (
        orders.select(F.explode(variants).alias("v"))
        .filter(v.isNotNull())
        .select(
            F.to_json(
                F.struct(
                    F.array(v["data"]).alias("data"),
                    v["old"].alias("old"),
                    v["typ"].alias("type"),
                    F.lit("tpch").alias("database"),
                    F.lit("orders").alias("table"),
                    v["es"].alias("es"),
                    (v["es"] + 1).alias("ts"),
                )
            ).alias("value")
        )
    )
    physical = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    parsed = parse_canal_json(lines, physical)
    latest = apply_changelog(
        parsed, keys=["o_orderkey"],
        order_by=["_src.op_ts_ms", "_src.img_seq"],
    )
    return (
        latest.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


CANAL_ROUNDTRIP_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 100 <> 51
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def ogg_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGG-JSON (GoldenGate trail) ingestion end-to-end, driver-checked:
    orders → OGG envelopes generated in-plan (full before/after images,
    ``DB.TABLE`` qualified name, wall-clock NTZ trail timestamps derived
    from the key, zero-padded trail positions) → ``parse_ogg_json`` →
    ``apply_changelog`` → aggregate.  The checked result carries the
    PARSED metadata — ``table_name`` from the ``DB.TABLE`` split and
    ``max(op_ts_ms)`` from the NTZ timestamp parse — so a regression in
    either (not just the image explosion) flips the hash.

    Plan: ONE scan of orders with the same 3-slot variant-array explode
    as the canal roundtrip (single codegen'd encode/decode pipeline, no
    per-branch recompilation), one key window, one aggregation."""
    from ..sources.formats import parse_ogg_json
    from .changelog import apply_changelog
    from pyspark.sql import types as T

    orders, row, row_updated, null_row = _orders_mutation_base(
        spark, sf_dir, repartition=True
    )

    def ts_str(extra_s: int):
        # deterministic per-key wall-clock trail time; updates land 60 s
        # after the insert so the parsed op_ts is observable in the agg
        return F.date_format(
            F.expr(
                "timestampadd(SECOND, CAST(o_orderkey % 86400 AS INT) + "
                f"{extra_s}, timestamp_ntz'2020-01-01 00:00:00')"
            ),
            "yyyy-MM-dd HH:mm:ss.SSSSSS",
        )

    # GoldenGate positions are strings; zero-pad so lexicographic order is
    # the numeric trail order
    def pos(expr):
        return F.lpad(expr.cast("string"), 20, "0")

    k2 = F.col("o_orderkey") * 2

    def variant(op_type: str, before, after, p, ts):
        return F.struct(
            F.lit(op_type).alias("typ"),
            before.alias("before"),
            after.alias("after"),
            p.alias("pos"),
            ts.alias("ts"),
        )

    variants = F.array(
        variant("I", null_row, row, pos(k2), ts_str(0)),
        F.when(
            F.expr(_UPDATED),
            variant("U", row, row_updated, pos(k2 + 1), ts_str(60)),
        ),
        F.when(
            F.expr(_DELETED),
            variant("D", row, null_row, pos(k2 + 1), ts_str(60)),
        ),
    )
    v = F.col("v")
    lines = (
        orders.select(F.explode(variants).alias("v"))
        .filter(v.isNotNull())
        .select(
            F.to_json(
                F.struct(
                    v["before"].alias("before"),
                    v["after"].alias("after"),
                    v["typ"].alias("op_type"),
                    v["ts"].alias("op_ts"),
                    v["ts"].alias("current_ts"),
                    F.lit("TPCH.ORDERS").alias("table"),
                    F.array(F.lit("o_orderkey")).alias("primary_keys"),
                    v["pos"].alias("pos"),
                )
            ).alias("value")
        )
    )
    physical = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    parsed = parse_ogg_json(lines, physical)
    # the OGG trail position string rides in _src.file (pos slot is the
    # numeric binlog offset, null for trails)
    latest = apply_changelog(
        parsed, keys=["o_orderkey"], order_by=["_src.file", "_src.img_seq"]
    )
    return (
        latest.groupBy("o_orderpriority", F.col("_src.table_name").alias("tbl"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
            F.max("_src.op_ts_ms").alias("max_op_ts_ms"),
        )
        .orderBy("o_orderpriority")
    )


OGG_ROUNDTRIP_SQL = """
SELECT o_orderpriority,
       'ORDERS' AS tbl,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_price,
       MAX(1577836800000 + (o_orderkey % 86400) * 1000
           + CASE WHEN o_orderkey % 10 = 0 THEN 60000 ELSE 0 END)
         AS max_op_ts_ms
FROM orders
WHERE o_orderkey % 100 <> 51
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

def maxwell_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell-JSON ingestion end-to-end, driver-checked — completing the
    measured-path trio with canal/OGG.  The Maxwell-specific surfaces are
    in the CHECKED columns: ``max_op_ts_ms`` proves the seconds→ms
    normalization (Maxwell ``ts`` is epoch SECONDS), and the update
    envelopes carry changed-fields-only ``old`` (previous values), so the
    before-image overlay is in the measured path; ordering replays on
    ``xid`` (no log-reader offsets here — Maxwell's ``position`` strings
    are not lexicographically ordered, the parser's documented fallback).

    Plan: same single-scan 3-slot variant-array explode as the other
    roundtrips (one codegen'd encode/decode pipeline), one key window,
    one aggregation."""
    from ..sources.formats import parse_maxwell_json
    from .changelog import apply_changelog
    from pyspark.sql import types as T

    orders, row, row_updated, _ = _orders_mutation_base(
        spark, sf_dir, repartition=True
    )
    old_t = "struct<o_totalprice:double>"
    null_old = F.lit(None).cast(old_t)
    k2 = (F.col("o_orderkey") * 2).cast("long")
    base_ts = F.lit(1_700_000_000).cast("long") + (
        F.col("o_orderkey") % 86400
    ).cast("long")

    def variant(typ: str, data, old, xid, ts):
        return F.struct(
            F.lit(typ).alias("typ"),
            data.alias("data"),
            old.alias("old"),
            xid.alias("xid"),
            ts.alias("ts"),
        )

    variants = F.array(
        variant("insert", row, null_old, k2, base_ts),
        F.when(
            F.expr(_UPDATED),
            variant(
                "update", row_updated,
                F.struct(F.col("o_totalprice")), k2 + 1, base_ts + 60,
            ),
        ),
        F.when(
            F.expr(_DELETED),
            variant("delete", row, null_old, k2 + 1, base_ts + 60),
        ),
    )
    v = F.col("v")
    lines = (
        orders.select(F.explode(variants).alias("v"))
        .filter(v.isNotNull())
        .select(
            F.to_json(
                F.struct(
                    F.lit("tpch").alias("database"),
                    F.lit("orders").alias("table"),
                    v["typ"].alias("type"),
                    v["ts"].alias("ts"),
                    v["xid"].alias("xid"),
                    F.lit("binlog.000001:4").alias("position"),
                    v["data"].alias("data"),
                    v["old"].alias("old"),
                )
            ).alias("value")
        )
    )
    physical = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    parsed = parse_maxwell_json(lines, physical)
    # no reader offsets → _src.pos carries Maxwell's xid (the documented
    # fallback order); img_seq breaks the before/after tie within an update
    latest = apply_changelog(
        parsed, keys=["o_orderkey"], order_by=["_src.pos", "_src.img_seq"]
    )
    return (
        latest.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
            F.max("_src.op_ts_ms").alias("max_op_ts_ms"),
        )
        .orderBy("o_orderpriority")
    )


MAXWELL_ROUNDTRIP_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_price,
       MAX((1700000000 + o_orderkey % 86400
            + CASE WHEN o_orderkey % 10 = 0 THEN 60 ELSE 0 END) * 1000)
         AS max_op_ts_ms
FROM orders
WHERE o_orderkey % 100 <> 51
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


LIFECYCLE_QUERIES = {
    "ddl_sql_lifecycle": (ddl_lifecycle_query, DDL_LIFECYCLE_SQL),
    "cdc_canal_roundtrip": (canal_roundtrip_query, CANAL_ROUNDTRIP_SQL),
    "cdc_ogg_roundtrip": (ogg_roundtrip_query, OGG_ROUNDTRIP_SQL),
    "cdc_maxwell_roundtrip": (maxwell_roundtrip_query, MAXWELL_ROUNDTRIP_SQL),
}
