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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
