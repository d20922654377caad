"""flink_cdc_log_connectors_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of 10MG/flink-cdc-log-connectors.

The reference is a family of Flink CDC source connectors that turn databases
into append-only change logs with an explicit ``op`` column (see SURVEY.md §0;
reference ``RowDataDebeziumDeserializeSchema.java:117-146``).  This package
re-expresses that capability Spark-first:

- ``sources``    — snapshot chunking (JDBC partition predicates), Debezium-JSON
                   envelope parsing, a Python DataSource streaming CDC-log
                   source with offsets/startup modes.
- ``operators``  — the relational query surface (SURVEY §2.9), changelog
                   materialization (P7/L2 semantics), and large-scale
                   training-data-pipeline operators (dedup, similarity search,
                   text analysis, multimodal plumbing).
- ``functions``  — scalar helper functions shared across operators.
- ``streaming``  — Structured Streaming helpers (watermarked windows, stateful
                   dedup, foreachBatch upsert materialization).
- ``plans``      — plan-inspection utilities (pushdown/broadcast assertions).
"""

__version__ = "0.1.0"
