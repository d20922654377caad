"""MongoDB change-stream deserialization — the reference's S7/D7 surface.

The reference's Mongo connector keeps native retract RowKinds and appends
no op column (``MongoDBConnectorDeserializationSchema.java:118-169``) — the
one place the fork's append+op normalization wasn't applied.  Structured
Streaming has no retraction, so this engine normalizes Mongo change streams
to the same append+op shape as the relational dialects (the choice SURVEY
§1.4 records): ``insert``→``c``, ``update``/``replace``→``u`` (after-image
only — change streams carry no before-image unless pre-images are enabled),
``delete``→``d`` carrying the document key.

Input: change-stream documents as JSON lines (the shape
``MongoDBConnectorSourceTask`` consumes from the Kafka mongo source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource

from .datasource import RAW_SCHEMA, CdcLogStreamReader

#: operationType → the fork's op code
_OP_MAP = {"insert": "c", "update": "u", "replace": "u", "delete": "d"}


def changestream_schema(physical: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("operationType", T.StringType(), True),
            T.StructField("fullDocument", physical, True),
            T.StructField("documentKey", physical, True),
            T.StructField(
                "ns",
                T.StructType(
                    [
                        T.StructField("db", T.StringType(), True),
                        T.StructField("coll", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("clusterTime", T.LongType(), True),
        ]
    )


def parse_mongo_changestream(
    df: DataFrame, physical: T.StructType, json_col: str = "value"
) -> DataFrame:
    """Change-stream JSON → append+op change rows.

    Deletes carry the ``documentKey`` fields (typically just the id) with
    other physical columns NULL — downstream ``apply_changelog`` only needs
    the key.  Metadata keys follow MongoDBReadableMetadata:
    ``database_name``, ``collection_name``, ``op_ts``.
    """
    env = F.from_json(F.col(json_col), changestream_schema(physical))
    op_type = env["operationType"]
    op = F.element_at(
        F.create_map(*[F.lit(x) for kv in _OP_MAP.items() for x in kv]), op_type
    )
    row = F.when(op_type == "delete", env["documentKey"]).otherwise(
        env["fullDocument"]
    )
    src = F.named_struct(
        F.lit("database_name"), env["ns"]["db"],
        F.lit("collection_name"), env["ns"]["coll"],
        F.lit("op_ts_ms"), F.coalesce(env["clusterTime"], F.lit(0).cast("long")),
    )
    out = df.select(row.alias("__row"), op.alias("op"), src.alias("_src")).filter(
        F.col("op").isNotNull()
    )
    cols = [F.col(f"__row.{f.name}").alias(f.name) for f in physical.fields]
    return out.select(*cols, "op", "_src")


# --------------------------------------------------------------------------
# collection-regex discovery (reference CollectionDiscoveryUtils.java) —
# the Mongo twin of the relational L3 include/exclude surface
# --------------------------------------------------------------------------


def _as_patterns(spec: str | None) -> list[str]:
    """Comma-separated regex list → anchored patterns (the reference
    compiles each entry with ``Pattern.compile`` and full-matches names).

    Commas inside brackets/braces do NOT split — ``items_[0-9]{2,3}`` is
    ONE pattern (a naive split would shatter the quantifier into two
    never-matching pieces, silently discovering nothing).  Backslash
    escapes are honored: ``\\[`` does not open a bracket and ``\\,`` is a
    literal comma, never a separator."""
    if not spec:
        return []
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    escaped = False
    for ch in spec:
        if escaped:
            buf.append(ch)
            escaped = False
            continue
        if ch == "\\":
            buf.append(ch)
            escaped = True
            continue
        if ch in "[{(":
            depth += 1
        elif ch in "]})":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return [p.strip() for p in out if p.strip()]


def collection_matcher(
    databases: str | None, collections: str | None
):
    """Predicate ``(db, coll) -> bool`` with the reference's semantics
    (``CollectionDiscoveryUtils.databaseFilter/collectionsFilter``):

    - ``databases``: regex list full-matched against the database name
      (empty = every database).
    - ``collections``: regex list; each entry is tried as a full match
      against BOTH the bare collection name and the fully-qualified
      ``db.coll`` name (empty = every collection).  Trying both sides
      steps around the undecidable "is this dot a regex wildcard or a
      namespace separator" question (``items.*`` and ``crm\\.leads``
      both do what they look like).
    """
    import re

    db_pats = [re.compile(p) for p in _as_patterns(databases)]
    coll_pats = [re.compile(p) for p in _as_patterns(collections)]

    def match(db: str, coll: str) -> bool:
        if db_pats and not any(p.fullmatch(db) for p in db_pats):
            return False
        if not coll_pats:
            return True
        fq = f"{db}.{coll}"
        return any(p.fullmatch(coll) or p.fullmatch(fq) for p in coll_pats)

    return match


def discover_collections(
    existing_root: str, databases: str | None, collections: str | None
) -> list[tuple[str, str, str]]:
    """Match the ``<root>/<db>/<coll>.jsonl`` layout against the regex
    lists; returns sorted ``(db, coll, path)`` — deterministic so the
    snapshot offset's file index stays stable across restarts."""
    import os

    match = collection_matcher(databases, collections)
    out = []
    for db in sorted(os.listdir(existing_root)):
        db_dir = os.path.join(existing_root, db)
        if not os.path.isdir(db_dir):
            continue
        for f in sorted(os.listdir(db_dir)):
            if f.endswith(".jsonl") and match(db, f[: -len(".jsonl")]):
                out.append((db, f[: -len(".jsonl")], os.path.join(db_dir, f)))
    return out


def filter_collections(
    df: DataFrame, databases: str | None = None, collections: str | None = None
) -> DataFrame:
    """L3-parity stream filter over parsed Mongo change rows: keep rows
    whose ``_src.database_name``/``collection_name`` match the regex
    lists.  Pure Catalyst (``rlike`` on two tiny columns) — map-only, no
    Python in the row path."""
    def _any_match(col: Column, pats: list[str]) -> Column:
        out = F.lit(False)
        for p in pats:
            out = out | col.rlike(f"^(?:{p})$")
        return out

    db_pats = _as_patterns(databases)
    cond = F.lit(True)
    if db_pats:
        cond = cond & _any_match(F.col("_src.database_name"), db_pats)
    coll_pats = _as_patterns(collections)
    if coll_pats:
        # same bare-or-qualified semantics as collection_matcher
        fq = F.concat_ws(
            ".", F.col("_src.database_name"), F.col("_src.collection_name")
        )
        cond = cond & (
            _any_match(F.col("_src.collection_name"), coll_pats)
            | _any_match(fq, coll_pats)
        )
    return df.filter(cond)


# --------------------------------------------------------------------------
# copy.existing — snapshot-then-stream initial load (S7)
# --------------------------------------------------------------------------
#
# The reference's MongoDB source (``MongoDBSource.java:447``,
# ``MongoDBConnectorSourceTask``) implements ``copy.existing`` as:
#
#   1. capture the change-stream RESUME TOKEN *before* the copy starts,
#   2. emit every existing document as an insert,
#   3. resume the change stream from the CAPTURED token.
#
# Changes that land during the copy are therefore replayed after it —
# overlap is resolved because materialization is an idempotent keyed
# upsert ordered by clusterTime (copies carry clusterTime 0, so any real
# event wins).  Events from before the token are NEVER replayed: they are
# already reflected in the copied documents.  This is the same
# P9-handoff shape as the relational hybrid snapshot, with the token
# captured at startup instead of per-chunk watermarks.


class MongoCdcStreamReader(CdcLogStreamReader):
    """Change-stream tailer with ``copy.existing`` initial load.

    ``path`` holds change-stream JSON lines (the oplog view); existing
    documents live at ``existingPath`` as plain JSON lines.  The resume
    token (end-of-stream position at startup) is pinned INSIDE the
    initial offset, so a restart during the copy replays the identical
    boundary — exactly-once across failover by construction.
    """

    def __init__(self, options: dict[str, str]) -> None:
        super().__init__(options)
        self.snapshot_path = options.get("existingpath") or options.get(
            "existingPath"
        ) or self.snapshot_path
        copy_opt = (options.get("copyexisting") or options.get("copyExisting")
                    or ("true" if self.snapshot_path else "false"))
        self.copy_existing = str(copy_opt).lower() == "true"
        #: ``database``/``collection`` accept comma-separated REGEX lists
        #: (reference MongoDBSourceOptions + CollectionDiscoveryUtils);
        #: a plain name is the degenerate one-entry regex.
        self.db = options.get("database", "")
        self.coll = options.get("collection", "")
        self._discovered: list[tuple[str, str, str]] | None = None

    # -- collection-regex discovery (S7 + L3 parity) -----------------------
    def _discover(self) -> list[tuple[str, str, str]]:
        """(db, coll, path) for every matched collection.  A flat
        ``existingPath`` (file or dir of jsonl, the pre-discovery layout)
        degrades to a single pseudo-collection named by the ``database``/
        ``collection`` options."""
        if self._discovered is None:
            import os

            root = self.snapshot_path or ""
            if os.path.isdir(root) and any(
                os.path.isdir(os.path.join(root, d)) for d in os.listdir(root)
            ):
                self._discovered = discover_collections(root, self.db, self.coll)
            else:
                from .datasource import _snapshot_files

                self._discovered = [
                    (self.db, self.coll, p) for p in _snapshot_files(root)
                ]
        return self._discovered

    def _snapshot_file_list(self) -> list[str]:
        return [p for _db, _coll, p in self._discover()]

    def _wrap_snapshot_row_for(self, path: str, line: str) -> str:
        # copied documents become change-stream inserts with clusterTime 0
        # (the reference marks copies the same way — they sort before any
        # real event, so concurrent updates replayed after the copy win);
        # the namespace comes from the DISCOVERED collection the file
        # belongs to, not a global option
        ns_by_path = getattr(self, "_ns_by_path", None)
        if ns_by_path is None:
            # one-time index: the per-row linear scan would make the
            # copy phase O(rows × collections)
            ns_by_path = {p: (d, c) for d, c, p in self._discover()}
            self._ns_by_path = ns_by_path
        db, coll = ns_by_path.get(path, (self.db, self.coll))
        return (
            '{"operationType": "insert", "fullDocument": ' + line.rstrip("\n")
            + ', "documentKey": null, "ns": {"db": "' + db
            + '", "coll": "' + coll + '"}, "clusterTime": 0}'
        )

    def _wrap_snapshot_row(self, line: str) -> str:
        return self._wrap_snapshot_row_for("", line)

    def _post_snapshot_log_start(self, start: dict) -> dict:
        return {
            "phase": "log",
            "file": start.get("resume_file", ""),
            "pos": int(start.get("resume_pos", 0)),
        }

    def initialOffset(self) -> dict:
        if self.copy_existing and self.snapshot_path:
            token = self._end_of_log()  # capture BEFORE the copy starts
            return {
                "phase": "snapshot",
                "snap_idx": 0,
                "snap_line": 0,
                "resume_file": token["file"],
                "resume_pos": token["pos"],
            }
        return super().initialOffset()


class MongoCdcDataSource(DataSource):
    """``spark.readStream.format("mongocdc")``.

    Options: ``path`` (change-stream JSON lines), ``existingPath``
    (collection documents, one JSON object per line), ``copyExisting``
    (default true when ``existingPath`` is set), ``database`` /
    ``collection`` (ns metadata for copied rows), ``startingOffsets``,
    ``maxLinesPerBatch``.
    """

    @classmethod
    def name(cls) -> str:
        return "mongocdc"

    def schema(self) -> T.StructType:
        return RAW_SCHEMA

    def simpleStreamReader(self, schema: T.StructType):
        return MongoCdcStreamReader(self.options)


# --------------------------------------------------------------------------
# BSON converter tree (D7) — canonical extended JSON → engine values
# --------------------------------------------------------------------------
#
# MongoDB sources ship documents as CANONICAL extended JSON: scalars that
# don't fit JSON natively arrive as typed wrapper objects
# (``{"$numberLong": "42"}``, ``{"$date": {"$numberLong": "<ms>"}}``,
# ``{"$oid": "<hex>"}``, ``{"$binary": {"base64": ..., "subType": ...}}``).
# The reference converts these in ``MongoDBConnectorDeserializationSchema``'s
# BSON converter tree; here the tree is built ONCE as Catalyst expressions:
# the document is parsed twice against two from_json schemas — the wrapper
# shape and the relaxed (plain) shape — and each field coalesces the
# canonical conversion with the relaxed value.  Two JVM-side JSON parses,
# zero Python in the row path.


def _bson_wire_type(dt: T.DataType) -> T.DataType:
    """Wire (wrapper-struct) type of one physical field."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        return T.StructType(
            [
                T.StructField("$numberLong", T.StringType(), True),
                T.StructField("$numberInt", T.StringType(), True),
            ]
        )
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return T.StructType([T.StructField("$numberDouble", T.StringType(), True)])
    if isinstance(dt, T.DecimalType):
        return T.StructType([T.StructField("$numberDecimal", T.StringType(), True)])
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return T.StructType(
            [
                T.StructField(
                    "$date",
                    T.StructType(
                        [T.StructField("$numberLong", T.StringType(), True)]
                    ),
                    True,
                )
            ]
        )
    if isinstance(dt, T.BinaryType):
        return T.StructType(
            [
                T.StructField(
                    "$binary",
                    T.StructType(
                        [
                            T.StructField("base64", T.StringType(), True),
                            T.StructField("subType", T.StringType(), True),
                        ]
                    ),
                    True,
                )
            ]
        )
    if isinstance(dt, T.StringType):
        return T.StructType([T.StructField("$oid", T.StringType(), True)])
    return dt  # booleans etc. have no wrapper form


def _bson_convert(wire: Column, plain: Column, dt: T.DataType) -> Column:
    """Engine value of one field: canonical wrapper if present, else the
    relaxed plain value."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        canonical = F.coalesce(
            wire["$numberLong"], wire["$numberInt"]
        ).cast(dt)
        return F.coalesce(canonical, plain)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.coalesce(wire["$numberDouble"].cast(dt), plain)
    if isinstance(dt, T.DecimalType):
        return F.coalesce(wire["$numberDecimal"].cast(dt), plain)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        ms = wire["$date"]["$numberLong"].cast("long")
        return F.coalesce(F.timestamp_millis(ms).cast(dt), plain)
    if isinstance(dt, T.BinaryType):
        return F.coalesce(F.unbase64(wire["$binary"]["base64"]), plain)
    if isinstance(dt, T.StringType):
        return F.coalesce(wire["$oid"], plain)
    return plain


def parse_bson_document(
    df: DataFrame, physical: T.StructType, json_col: str = "doc"
) -> DataFrame:
    """Canonical-or-relaxed extended-JSON documents → typed columns.

    Mirrors the per-type converter tree of the reference's Mongo
    deserializer; unknown wrapper keys simply parse to NULL structs and
    fall through to the relaxed value, so mixed-mode streams are fine.
    """
    wire_schema = T.StructType(
        [
            T.StructField(f.name, _bson_wire_type(f.dataType), True)
            for f in physical.fields
        ]
    )
    wire = F.from_json(F.col(json_col), wire_schema)
    plain = F.from_json(F.col(json_col), physical)
    cols = [
        _bson_convert(wire[f.name], plain[f.name], f.dataType).alias(f.name)
        for f in physical.fields
    ]
    return df.select(*cols)


def read_mongo_stream(
    spark,
    path: str,
    physical: T.StructType,
    existing_path: str | None = None,
    database: str = "",
    collection: str = "",
    max_lines_per_batch: int = 10_000,
) -> DataFrame:
    """Streaming normalized Mongo change rows with copy.existing load."""
    spark.dataSource.register(MongoCdcDataSource)
    raw = (
        spark.readStream.format("mongocdc")
        .option("path", path)
        .option("database", database)
        .option("collection", collection)
        .option("maxLinesPerBatch", str(max_lines_per_batch))
    )
    if existing_path:
        raw = raw.option("existingPath", existing_path)
    return parse_mongo_changestream(raw.load(), physical)
