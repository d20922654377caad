"""Canal-JSON, Maxwell-JSON and OGG-JSON change-event formats.

Flink's CDC ecosystem reads four wire formats interchangeably —
``debezium-json`` (this engine's ``sources/debezium.py``), ``canal-json``,
``maxwell-json`` and ``ogg-json`` (Flink ``flink-formats/flink-json``:
``CanalJsonDeserializationSchema`` / ``MaxwellJsonDeserializationSchema``
/ ``OggJsonDeserializationSchema``) — because MySQL shops replay
Canal/Maxwell dumps and Oracle shops GoldenGate trails from object
storage as often as Debezium topics.  This module gives the same
interchangeability: every parser produces the ENGINE'S append-only
contract (physical columns, ``op`` code, ``_src`` metadata struct —
identical to ``parse_debezium``), so everything downstream
(``apply_changelog``, metadata projection, ``shouldEmit``) is
format-agnostic.

Format semantics implemented (public format docs):

- **Canal**: one message carries an ARRAY of rows (``data``) with
  ``type`` INSERT/UPDATE/DELETE; for UPDATE, ``old[i]`` holds ONLY the
  changed fields' prior values — the before-image is ``data[i]``
  overlaid with ``old[i]`` (field-wise coalesce), exactly Flink's
  UPDATE_BEFORE reconstruction.
- **Maxwell**: one row per message (``data``); for update, ``old`` again
  holds only changed fields.
- **OGG**: full ``before``/``after`` images, ``op_type`` I/U/D,
  ``table`` as ``DB.TABLE``, ``op_ts``/``current_ts`` as
  ``yyyy-MM-dd HH:mm:ss.SSSSSS`` wall-clock strings.

Op mapping follows the reference deserializer's append-only rewrite
(D1): insert → after image ``c``; update → before image then after image
(``u``, img_seq 0/1); delete → before image ``d``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.changelog import OP_CREATE, OP_DELETE, OP_UPDATE


def _nullable(physical: T.StructType) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in physical.fields]
    )


def _merge_images(base: Column, overlay: Column, physical: T.StructType) -> Column:
    """Field-wise overlay: take ``overlay``'s field when present (the
    changed-fields-only ``old`` image), else ``base``'s.  NULL overlay
    struct → base unchanged."""
    merged = F.struct(
        *[
            F.when(overlay.isNotNull(), F.coalesce(overlay[f.name], base[f.name]))
            .otherwise(base[f.name])
            .alias(f.name)
            for f in physical.fields
        ]
    )
    return merged


def _explode_images(
    parsed: DataFrame,
    before: Column,
    after: Column,
    op: Column,
    src: Column,
    physical: T.StructType,
) -> DataFrame:
    """Shared image-selection/explosion tail (same rewrite as
    ``parse_debezium``): c → [after], d → [before], u → [before, after],
    with ``img_seq`` disambiguating an update's two rows."""
    images = (
        F.when(op == OP_UPDATE, F.array(before, after))
        .when(op == OP_DELETE, F.array(before))
        .otherwise(F.array(after))
    )
    out = parsed.select(
        F.posexplode(images).alias("__img_seq", "__row"),
        op.alias("op"),
        src.alias("__src0"),
    ).select(
        "__row",
        "op",
        F.col("__src0").withField("img_seq", F.col("__img_seq")).alias("_src"),
    )
    cols = [F.col(f"__row.{f.name}").alias(f.name) for f in physical.fields]
    return out.select(*cols, "op", "_src")


def _op_from_type(type_col: Column) -> Column:
    """c/u/d for the three DML types; any OTHER type (Maxwell
    bootstrap-insert/bootstrap-start, table-create DDL messages, ...)
    keeps its raw type string as the op — same contract as the debezium
    parser, so unmapped events stay visible downstream instead of
    becoming NULL-op rows that a ``op != 'd'`` filter silently drops."""
    t = F.upper(type_col)
    return (
        F.when(t == "INSERT", F.lit(OP_CREATE))
        .when(t == "UPDATE", F.lit(OP_UPDATE))
        .when(t == "DELETE", F.lit(OP_DELETE))
        .otherwise(type_col)
    )


def canal_schema(physical: T.StructType) -> T.StructType:
    p = _nullable(physical)
    return T.StructType(
        [
            T.StructField("data", T.ArrayType(p), True),
            T.StructField("old", T.ArrayType(p), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("es", T.LongType(), True),   # source event time ms
            T.StructField("ts", T.LongType(), True),   # canal emit time ms
            T.StructField("pkNames", T.ArrayType(T.StringType()), True),
        ]
    )


def maxwell_schema(physical: T.StructType) -> T.StructType:
    p = _nullable(physical)
    return T.StructType(
        [
            T.StructField("data", p, True),
            T.StructField("old", p, True),
            T.StructField("type", T.StringType(), True),
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),   # seconds in maxwell
            T.StructField("xid", T.LongType(), True),
            T.StructField("position", T.StringType(), True),
        ]
    )


def _src_meta(
    db: Column, table: Column, op_ts_ms: Column, file: Column, pos: Column,
    emit_ts_ms: Column,
) -> Column:
    """The engine's ``_src`` metadata struct (same field set as
    ``debezium._src_struct`` so ``with_metadata_columns`` works on any
    format's output; ``img_seq`` is overlaid by the explode tail)."""
    return F.named_struct(
        F.lit("database_name"), db,
        F.lit("schema_name"), F.lit(None).cast("string"),
        F.lit("table_name"), table,
        F.lit("op_ts_ms"), F.coalesce(op_ts_ms, F.lit(0).cast("long")),
        F.lit("file"), file,
        F.lit("pos"), pos,
        F.lit("img_seq"), F.lit(0),
        F.lit("emit_ts_ms"), emit_ts_ms,
    )


def parse_canal_json(
    df: DataFrame,
    physical: T.StructType,
    json_col: str = "value",
    file_col: str = "file",
    pos_col: str = "pos",
) -> DataFrame:
    """Canal-JSON messages → append-only change rows.

    A message's ``data`` array fans out with ``posexplode``; UPDATE
    before-images are ``data[i]`` overlaid with ``old[i]``.  Pure
    Catalyst: one ``from_json`` + one generator — no Python in the row
    path.

    Ordering: if the input carries the log reader's offset columns
    (``file``/``pos``, as the ``cdclog`` source emits), they land in
    ``_src.file``/``_src.pos`` so the engine's changelog total order
    (file, pos, img_seq) works across messages — canal's ``es`` is
    millisecond-granular and TIES for same-ms events.  Without reader
    offsets, ``_src.pos`` falls back to the intra-message ``data`` index
    (order within one message only)."""
    has_off = file_col in df.columns and pos_col in df.columns
    off_cols = (
        [F.col(file_col).alias("__file"), F.col(pos_col).alias("__pos")]
        if has_off
        else []
    )
    base = df.select(
        F.from_json(F.col(json_col), canal_schema(physical)).alias("__env"),
        *off_cols,
    )
    env = F.col("__env")
    op = _op_from_type(env["type"])
    parsed = base.select(
        F.posexplode(env["data"]).alias("__i", "__after"),
        op.alias("__op"),
        env["old"].alias("__olds"),
        env["database"].alias("__db"),
        env["table"].alias("__table"),
        env["es"].alias("__es"),
        env["ts"].alias("__ts"),
        *([F.col("__file"), F.col("__pos")] if has_off else []),
    )
    after = F.col("__after")
    old_i = F.get(F.col("__olds"), F.col("__i"))
    before = F.when(
        F.col("__op") == OP_UPDATE,
        _merge_images(after, old_i, physical),
    ).otherwise(after)  # DELETE: canal carries the full row in data
    src = _src_meta(
        F.col("__db"), F.col("__table"), F.col("__es"),
        F.col("__file") if has_off else F.lit(None).cast("string"),
        (F.col("__pos") if has_off else F.col("__i")).cast("long"),
        F.col("__ts"),
    )
    return _explode_images(parsed, before, after, F.col("__op"), src, physical)


def parse_maxwell_json(
    df: DataFrame,
    physical: T.StructType,
    json_col: str = "value",
    file_col: str = "file",
    pos_col: str = "pos",
) -> DataFrame:
    """Maxwell-JSON messages → append-only change rows.  ``ts`` is
    SECONDS in Maxwell; ``_src.op_ts_ms`` is normalized to ms so metadata
    projection is format-agnostic.

    Ordering: with the log reader's ``file``/``pos`` columns present
    they define ``_src.file``/``_src.pos`` (the engine's total order);
    otherwise Maxwell's own ``position`` string rides in ``_src.file``
    for provenance — note it is NOT totally ordered as a string
    ("binlog.1:14" < "binlog.1:9" lexicographically), so order replays
    on ``op_ts_ms``/``xid`` in that mode."""
    has_off = file_col in df.columns and pos_col in df.columns
    off_cols = (
        [F.col(file_col).alias("__file"), F.col(pos_col).alias("__pos")]
        if has_off
        else []
    )
    base = df.select(
        F.from_json(F.col(json_col), maxwell_schema(physical)).alias("__env"),
        *off_cols,
    )
    env = F.col("__env")
    parsed = base.select(
        _op_from_type(env["type"]).alias("__op"),
        env.alias("__env2"),
        *([F.col("__file"), F.col("__pos")] if has_off else []),
    )
    env2 = F.col("__env2")
    after = env2["data"]
    before = F.when(
        F.col("__op") == OP_UPDATE,
        _merge_images(after, env2["old"], physical),
    ).otherwise(after)
    ts_ms = (env2["ts"] * F.lit(1000)).cast("long")
    src = _src_meta(
        env2["database"], env2["table"], ts_ms,
        F.col("__file") if has_off else env2["position"],
        (F.col("__pos").cast("long") if has_off else env2["xid"]),
        ts_ms,
    )
    return _explode_images(parsed, before, after, F.col("__op"), src, physical)


def ogg_schema(physical: T.StructType) -> T.StructType:
    p = _nullable(physical)
    return T.StructType(
        [
            T.StructField("before", p, True),
            T.StructField("after", p, True),
            T.StructField("op_type", T.StringType(), True),
            T.StructField("op_ts", T.StringType(), True),
            T.StructField("current_ts", T.StringType(), True),
            T.StructField("table", T.StringType(), True),  # "DB.TABLE"
            T.StructField("primary_keys", T.ArrayType(T.StringType()), True),
            T.StructField("pos", T.StringType(), True),
        ]
    )


def parse_ogg_json(
    df: DataFrame,
    physical: T.StructType,
    json_col: str = "value",
    file_col: str = "file",
    pos_col: str = "pos",
) -> DataFrame:
    """OGG-JSON (GoldenGate trail) messages → append-only change rows.
    Full before/after images; ``op_type`` I/U/D (any other op_type keeps
    its raw string, debezium-parser parity); ``table`` splits into the
    metadata struct's database/table slots.  The trail's own position
    string rides in ``_src.file`` (GoldenGate positions are fixed-width
    strings, lexicographic = trail order); the log reader's numeric
    ``pos`` lands in ``_src.pos`` when its columns are present."""
    has_off = file_col in df.columns and pos_col in df.columns
    base = df.select(
        F.from_json(F.col(json_col), ogg_schema(physical)).alias("__env"),
        *([F.col(pos_col).alias("__pos")] if has_off else []),
    )
    env = F.col("__env")
    t = F.upper(env["op_type"])
    op = (
        F.when(t == "I", F.lit(OP_CREATE))
        .when(t == "U", F.lit(OP_UPDATE))
        .when(t == "D", F.lit(OP_DELETE))
        .otherwise(env["op_type"])
    )
    parsed = base.select(
        op.alias("__op"),
        env.alias("__env2"),
        *([F.col("__pos")] if has_off else []),
    )
    env2 = F.col("__env2")
    after = env2["after"]
    # OGG carries FULL before images (unlike canal/maxwell's partial old);
    # deletes put the row in `before` with an absent `after`
    before = F.coalesce(env2["before"], after)
    after_or_before = F.coalesce(after, env2["before"])
    # wall-clock trail timestamps: parse as NTZ then take epoch micros of
    # the NTZ fields directly (no session-zone dependence)
    op_ts_ms = F.expr(
        "CAST(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
        "to_timestamp_ntz(__env2.op_ts)) / 1000 AS LONG)"
    )
    emit_ts_ms = F.expr(
        "CAST(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
        "to_timestamp_ntz(__env2.current_ts)) / 1000 AS LONG)"
    )
    db = F.split(env2["table"], r"\.").getItem(0)
    tbl = F.split(env2["table"], r"\.").getItem(1)
    src = _src_meta(
        db, tbl, op_ts_ms, env2["pos"],
        (F.col("__pos").cast("long") if has_off
         else F.lit(None).cast("long")),
        emit_ts_ms,
    )
    return _explode_images(
        parsed, before, after_or_before, F.col("__op"), src, physical
    )
