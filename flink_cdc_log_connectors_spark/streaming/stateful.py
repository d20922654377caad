"""Arbitrary stateful streaming operators (§2.7) — applyInPandasWithState.

``running_counts`` keeps a per-key running aggregate across microbatches —
the building block for CDC-driven materializations that need more state
than dropDuplicates/window aggregation can express (e.g. per-key event
counters, custom session machines, anomaly scores).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(
    stream: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) maintained in Spark state store across
    microbatches; emits one updated row per key per batch."""
    key_cols = list(keys)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {**{k: [key[i]] for i, k in enumerate(key_cols)}, "n": [n], "total": [s]}
        )

    out_schema = (
        ", ".join(f"{k} {stream.schema[k].dataType.simpleString()}" for k in key_cols)
        + ", n long, total double"
    )
    return stream.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
