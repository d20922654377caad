"""Debezium-JSON envelope deserialization — the reference's D1-D4 operators.

The reference's deserializer (``RowDataDebeziumDeserializeSchema.deserialize``,
reference ``flink-connector-debezium-log/.../table/RowDataDebeziumDeserializeSchema.java:117-146``)
turns each Debezium envelope into the fork's append-only form:

- op ``c``/``r`` → one row from the **after** image
- op ``d``      → one row from the **before** image (delete rewritten as an
  INSERT carrying the before-image)
- op ``u``      → **two** rows: before-image then after-image
- the op code is written into the **last physical column** of every row

Here the envelope is parsed with ``from_json`` against the user-declared
physical schema (missing DB fields become NULL — reference ``:610-612``),
and image selection/explosion is a Catalyst expression — fully vectorized,
no Python in the row path.

Metadata (``_src`` struct) mirrors SupportsReadingMetadata keys
(``MySqlReadableMetadata.java:35-70``): ``database_name``, ``table_name``,
``op_ts`` (forced to epoch 0 for snapshot rows — ``RecordUtils.java:197-207``),
plus the log offset fields used for ordering (``file``, ``pos``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.changelog import OP_DELETE, OP_READ, OP_UPDATE

#: Debezium source-field subset the engine tracks (envelope "source")
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("row", T.IntegerType(), True),
        T.StructField("snapshot", T.StringType(), True),
    ]
)


def envelope_schema(physical: T.StructType) -> T.StructType:
    """Full Debezium envelope schema for a declared physical row type."""
    return T.StructType(
        [
            T.StructField("before", physical, True),
            T.StructField("after", physical, True),
            T.StructField("source", SOURCE_SCHEMA, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def _src_struct(env: Column, img_seq: Column) -> Column:
    op = env["op"]
    # snapshot reads get op_ts = epoch 0 (RecordUtils.java:197-207)
    op_ts = (
        F.when(op == OP_READ, F.lit(0).cast("long"))
        .otherwise(F.coalesce(env["source"]["ts_ms"], F.lit(0).cast("long")))
    )
    # named_struct: F.struct drops aliases on extracted nested fields
    return F.named_struct(
        F.lit("database_name"), env["source"]["db"],
        F.lit("schema_name"), env["source"]["schema"],
        F.lit("table_name"), env["source"]["table"],
        F.lit("op_ts_ms"), op_ts,
        F.lit("file"), env["source"]["file"],
        F.lit("pos"), env["source"]["pos"],
        F.lit("img_seq"), img_seq,
        F.lit("emit_ts_ms"), env["ts_ms"],
    )


def _prep_parse(
    physical: T.StructType,
    json_col: str,
    include_source: bool,
    retract: bool,
    offsets: bool,
):
    """Memoized Column trees for :func:`parse_debezium` /
    :func:`parse_change_rows` (``functions/prepared.py`` — the trees are
    pure functions of the arguments, rebuilt identically every epoch
    before r13).  Returns ``(env_col, gen_cols, final_cols)`` for the
    three projections below."""
    from ..functions.prepared import prepared

    key = (
        "dbz_parse",
        physical.json(),
        json_col,
        include_source,
        retract,
        offsets,
    )

    def build():
        env_col = F.from_json(
            F.col(json_col), envelope_schema(physical)
        ).alias("__env")
        env = F.col("__env")
        op = env["op"]
        # image selection incl. update explosion (deserialize:117-146)
        images = (
            F.when(op == OP_UPDATE, F.array(env["before"], env["after"]))
            .when(op == OP_DELETE, F.array(env["before"]))
            .otherwise(F.array(env["after"]))
        )
        # posexplode: the image index disambiguates an update's two rows,
        # which share one log offset — the after-image (img_seq=1) must
        # win any last-write-per-key merge (apply_changelog/offset_order).
        gen_cols = [
            F.posexplode(images).alias("__img_seq", "__row"),
            op.alias("op"),
            env.alias("__env2"),
        ]
        env2 = F.col("__env2")
        img = F.col("__img_seq")
        final = [
            F.col(f"__row.{f.name}").alias(f.name) for f in physical.fields
        ]
        if retract:
            # fused retract_before_images: identical rewrite, zero extra
            # projection (img IS what _src.img_seq is built from)
            final.append(
                F.when(
                    (F.col("op") == OP_UPDATE) & (img == 0), F.lit(OP_DELETE)
                )
                .otherwise(F.col("op"))
                .alias("op")
            )
        else:
            final.append(F.col("op"))
        if include_source:
            final.append(_src_struct(env2, img).alias("_src"))
        if offsets:
            # fused offset_sort_columns — same null-safe expressions over
            # the same source fields (_src.file IS env2.source.file)
            final.append(
                F.coalesce(env2["source"]["file"], F.lit("")).alias(
                    "_off_file"
                )
            )
            final.append(
                F.coalesce(env2["source"]["pos"], F.lit(-1)).alias("_off_pos")
            )
            final.append(F.coalesce(img, F.lit(-1)).alias("_off_img"))
        return env_col, gen_cols, final

    return prepared(key, build)


def parse_debezium(
    df: DataFrame,
    physical: T.StructType,
    json_col: str = "value",
    include_source: bool = True,
) -> DataFrame:
    """Envelope JSON → the fork's append-only change rows.

    Output columns: ``*physical``, ``op`` (last physical column, per the
    fork's contract), and optionally ``_src`` metadata struct.

    Keyed-state consumers (per-key last-write-wins merges) should pass
    the result through :func:`retract_before_images` before merging —
    otherwise a PK-CHANGING update leaves its before-image live under
    the old key (see that helper's docstring).  Row-stream consumers
    (filters, routing, window aggregates over after-images) use the
    parse output as-is.
    """
    return parse_change_rows(
        df,
        physical,
        json_col=json_col,
        include_source=include_source,
        retract=False,
        offsets=False,
    )


def parse_change_rows(
    df: DataFrame,
    physical: T.StructType,
    json_col: str = "value",
    include_source: bool = True,
    retract: bool = True,
    offsets: bool = True,
) -> DataFrame:
    """:func:`parse_debezium` with :func:`retract_before_images` and/or
    :func:`offset_sort_columns` FUSED into the parse's own projections
    (r13): identical output columns/values, but three DataFrame ops
    instead of seven — each op is an eager re-analysis plus py4j
    round-trips, which at microbatch scale dominated the chain's cost
    (139 ms/call measured) — with the Column trees memoized across
    epochs (``_prep_parse``)."""
    env_col, gen_cols, final = _prep_parse(
        physical, json_col, include_source, retract, offsets
    )
    # Materialize the parsed envelope in its OWN projection below the
    # explode: the generator's input crosses a GenerateExec boundary where
    # common-subexpression elimination cannot reach, so inlining from_json
    # would evaluate the JSON parse up to 3× per row (generator input +
    # op + metadata).  Parsing once and exploding the column reference
    # measured ~1.9× faster on the 100k-envelope throughput probe.
    return df.select(env_col).select(*gen_cols).select(*final)


def filter_tables(
    df: DataFrame,
    database: str | None = None,
    table_regex: str | None = None,
    src_col: str = "_src",
) -> DataFrame:
    """L3 — table include filter: keep only changes of the configured
    database/table pattern (reference pushes this into Debezium's
    ``table.include.list``; ``MySqlSourceOptions.java:58-68``).  A Catalyst
    filter on the metadata struct — combined with partition/file layout it
    prunes at the scan."""
    out = df
    if database is not None:
        out = out.filter(F.col(f"{src_col}.database_name") == database)
    if table_regex is not None:
        out = out.filter(F.col(f"{src_col}.table_name").rlike(table_regex))
    return out


#: schema of a Debezium schema-change (DDL) event
DDL_SCHEMA = T.StructType(
    [
        T.StructField("source", SOURCE_SCHEMA, True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("databaseName", T.StringType(), True),
        T.StructField("ddl", T.StringType(), True),
    ]
)


def schema_change_events(df: DataFrame, json_col: str = "value") -> DataFrame:
    """L6 — DDL side channel: schema-change envelopes (carrying a ``ddl``
    field) parsed into their own DataFrame, NOT mixed into the row stream
    (the reference records them into split state and optionally emits them;
    ``MySqlRecordEmitter.java:85-97``).  Spark streams have fixed schemas,
    so consumers use this channel to trigger restart-on-widen."""
    ddl = F.from_json(F.col(json_col), DDL_SCHEMA)
    return (
        df.filter(F.get_json_object(F.col(json_col), "$.ddl").isNotNull())
        .select(
            ddl["databaseName"].alias("database_name"),
            ddl["source"]["table"].alias("table_name"),
            ddl["ddl"].alias("ddl"),
            ddl["ts_ms"].alias("ts_ms"),
        )
    )


def validate_before_images(
    df: DataFrame, op_col: str = "op", probe_col: str | None = None
) -> DataFrame:
    """D6 — value validation: updates/deletes whose before-image is entirely
    NULL indicate a source misconfiguration (e.g. Postgres REPLICA IDENTITY
    not FULL — reference ``PostgresValueValidator.java:27-49``).  Adds a
    boolean ``_valid`` column; callers route invalid rows to a dead-letter
    sink or raise.  ``probe_col``: a physical column expected non-null."""
    needs_before = F.col(op_col).isin([OP_UPDATE, OP_DELETE])
    if probe_col is None:
        # img_seq==0 rows of u/d ops are before-images by construction
        has_before = F.col("_src.img_seq").isNotNull()
    else:
        has_before = F.col(probe_col).isNotNull()
    return df.withColumn("_valid", ~needs_before | has_before)


#: op code of synthetic heartbeat rows (L5) — null images, live offsets
OP_HEARTBEAT = "h"


def drop_heartbeats(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Remove heartbeat rows AFTER any ``withWatermark`` assignment — the
    heartbeat's only job is advancing event time; it carries no data."""
    return df.filter(F.col(op_col) != OP_HEARTBEAT)


def raw_json_passthrough(df: DataFrame, json_col: str = "value") -> DataFrame:
    """D3 — JsonDebeziumDeserializationSchema: raw envelope JSON through."""
    return df.select(F.col(json_col).alias("json"))


def string_passthrough(df: DataFrame, json_col: str = "value") -> DataFrame:
    """D4 — StringDebeziumDeserializationSchema equivalent."""
    return df.select(F.col(json_col).cast("string").alias("value"))


def offset_order(df: DataFrame) -> list[Column]:
    """Total order of the change log: (file, pos, img_seq) from the source
    offset — the engine's analogue of BinlogOffset comparison
    (``BinlogOffset.compareTo``), with the image index breaking the tie
    between an update's before/after rows.  Snapshot rows (null file/pos)
    sort first."""
    return [
        F.col("_src.file").asc_nulls_first(),
        F.col("_src.pos").asc_nulls_first(),
        F.col("_src.img_seq").asc_nulls_first(),
    ]


def retract_before_images(df: DataFrame) -> DataFrame:
    """Rewrite each update's BEFORE-image row to an explicit retraction
    (op ``'u'`` + ``img_seq == 0`` → op ``'d'``) — Flink's UPDATE_BEFORE
    semantics (reference consumers rely on Flink retracting the old row
    before applying the new one).

    Why keyed-state consumers need this: a per-key last-write-wins merge
    keyed on the table's PRIMARY KEY sees a key-STABLE update's two
    images under one key (the after-image wins the image rank — the
    rewrite changes nothing), but a PK-CHANGING update's images land
    under DIFFERENT keys: without the rewrite, the old key's latest row
    is the live-looking before-image — a ghost that survives forever.
    With it, the old key retracts and the new key upserts, exactly
    UPDATE_BEFORE/UPDATE_AFTER.  Apply AFTER :func:`parse_debezium`,
    BEFORE any keyed state merge."""
    from ..functions.prepared import prepared

    def build():
        op = F.col("op")
        img = F.col("_src.img_seq")
        return F.when(
            (op == OP_UPDATE) & (img == 0), F.lit(OP_DELETE)
        ).otherwise(op)

    return df.withColumn("op", prepared(("dbz_retract",), build))


def offset_sort_columns(df: DataFrame) -> DataFrame:
    """Append null-safe offset sort keys (``_off_file``, ``_off_pos``,
    ``_off_img``) usable directly as ``apply_changelog(order_by=...)`` —
    snapshot rows sort before every log offset."""
    from ..functions.prepared import prepared

    def build():
        return {
            "_off_file": F.coalesce(F.col("_src.file"), F.lit("")),
            "_off_pos": F.coalesce(F.col("_src.pos"), F.lit(-1)),
            "_off_img": F.coalesce(F.col("_src.img_seq"), F.lit(-1)),
        }

    # one DataFrame op (eager re-analysis) instead of three
    return df.withColumns(prepared(("dbz_offsort",), build))


CHANGELOG_ORDER_BY = ["_off_file", "_off_pos", "_off_img"]


# --------------------------------------------------------------------------
# Schema evolution policy (SURVEY §7 hard-point 3): consume the DDL side
# channel, decide widen-vs-restart.  The reference tracks runtime schema in
# state (FlinkDatabaseSchemaHistory) but never changes the produced row
# type; Spark streams are likewise fixed-schema, so evolution is a policy
# decision at the stream boundary.
# --------------------------------------------------------------------------

#: widenings that are SAFE to apply by restarting the stream with the new
#: schema and re-reading the log from the committed offset: every old value
#: remains representable (no precision loss, missing fields → NULL)
_SAFE_WIDENINGS = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
    ("date", "timestamp_ntz"),
}


def plan_schema_evolution(
    current: T.StructType, target: T.StructType
) -> dict[str, object]:
    """Compare the stream's declared physical schema with the post-DDL
    table schema and classify the evolution:

    - ``compatible`` — identical or pure column ADDITIONS / safe type
      widenings: restart the stream with ``schema`` (the widened
      StructType) from the committed offset; history re-parses cleanly
      because ``from_json`` yields NULL for fields absent in old
      envelopes and widened numerics parse losslessly.
    - ``incompatible`` — dropped columns or narrowing/shape changes:
      requires a new snapshot (the fork's users face the same boundary).

    Returns ``{"action": "none"|"restart_widened"|"resnapshot",
    "schema": StructType, "changes": [...]}``.
    """
    cur = {f.name: f for f in current.fields}
    tgt = {f.name: f for f in target.fields}
    changes: list[str] = []
    compatible = True
    for name, f in tgt.items():
        if name not in cur:
            changes.append(f"add:{name}:{f.dataType.simpleString()}")
            continue
        a, b = cur[name].dataType, f.dataType
        if a == b:
            continue
        if (a.typeName(), b.typeName()) in _SAFE_WIDENINGS or (
            a.typeName() == b.typeName() == "decimal"
            and b.precision >= a.precision
            and b.scale >= a.scale
            and b.precision - b.scale >= a.precision - a.scale
        ):
            changes.append(
                f"widen:{name}:{a.simpleString()}->{b.simpleString()}"
            )
        else:
            changes.append(
                f"incompatible:{name}:{a.simpleString()}->{b.simpleString()}"
            )
            compatible = False
    for name in cur:
        if name not in tgt:
            changes.append(f"drop:{name}")
            compatible = False
    if not changes:
        return {"action": "none", "schema": current, "changes": []}
    if compatible:
        # target field order, so the op column can stay last at the caller
        return {"action": "restart_widened", "schema": target, "changes": changes}
    return {"action": "resnapshot", "schema": target, "changes": changes}
