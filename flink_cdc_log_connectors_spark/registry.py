"""Central query registry: every operator the engine claims, with its oracle.

The driver contract (``__spark_entry__.py``) exposes ``queries()`` and
``oracle_sql()``; both are assembled from here.  An oracle of ``None`` means
the operator is not ANSI-SQL-expressible (the driver then records a weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from .operators.relational import RELATIONAL_QUERIES

    out: dict[str, tuple[QueryFn, str | None]] = {}
    out.update(RELATIONAL_QUERIES)

    try:
        from .operators.dedup import DEDUP_QUERIES

        out.update(DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.text import TEXT_QUERIES

        out.update(TEXT_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.similarity import SIMILARITY_QUERIES

        out.update(SIMILARITY_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.multimodal import MULTIMODAL_QUERIES

        out.update(MULTIMODAL_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.temporal import TEMPORAL_QUERIES

        out.update(TEMPORAL_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.hypertable import HYPERTABLE_QUERIES

        out.update(HYPERTABLE_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.graph import GRAPH_QUERIES

        out.update(GRAPH_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.clustering import CLUSTERING_QUERIES

        out.update(CLUSTERING_QUERIES)
    except ImportError:
        pass
    return out
