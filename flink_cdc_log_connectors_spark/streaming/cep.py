"""Streaming CEP: strictly-consecutive pattern detection with keyed state.

The streaming twin of ``operators/temporal.adjacent_pattern_matches``
(Flink's ``MATCH_RECOGNIZE PATTERN (A B C)`` over an unbounded stream):
matches must be found even when the pattern STRADDLES a microbatch
boundary, which no per-batch window can do.  ``applyInPandasWithState``
keeps the last ``len(pattern) − 1`` events of every key in the state
store; each batch prepends that tail, scans for matches ENDING at a new
event (matches wholly inside the tail were emitted by an earlier batch),
and stores the new tail.

Ordering contract: per-key event-time order across batches — exactly what
a CDC log delivers per key.  Events are sorted within the batch; an event
older than the stored tail violates the contract and is dropped with the
``late`` counter incremented in the emitted rows' ``n_late`` (visible,
never silent).  Late drops in a batch that finds NO matches accumulate in
the keyed state (``pending_late``) and ride out on the key's next emitted
row, so every drop is eventually observable (ADVICE r3).

State is O(pattern length) per key — the same bound Flink's NFA keeps for
simple patterns.  Timestamps travel as epoch milliseconds (LongType) so
the state tuple stays primitive.

State-schema version: adding ``pending_late`` (r4) widened the state
tuple 3 → 4 fields.  Spark's state store pins the schema per checkpoint,
so a query checkpointed under the 3-field layout will not restart
against this build (StateSchemaNotCompatible) — start it with a fresh
checkpoint directory, the standard Spark procedure for stateful-operator
schema changes (there is no in-place state migration API to hook).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_adjacent_pattern(
    stream: DataFrame,
    key: str,
    ts_ms_col: str,
    type_col: str,
    pattern: Sequence[str],
    tie_col: str,
) -> DataFrame:
    """Emit one row per completed pattern occurrence:
    ``(key, start_ms, end_ms, end_tie, n_late)`` where ``n_late`` is the
    key's late-drop count accumulated since its last emitted match,
    carried on the FIRST match a batch emits (0 on any further matches in
    the same batch) — so ``SUM(n_late)`` over all emitted rows is the
    exact total of dropped events."""
    pat = list(pattern)
    k = len(pat)
    key_type = stream.schema[key].dataType.simpleString()

    def update(
        kv: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            t_types, t_ts, t_tie, pending_late = state.get
            tail = list(zip(t_types, t_ts, t_tie))
        else:
            tail = []
            pending_late = 0
        events = []
        for pdf in pdfs:
            events.extend(
                zip(
                    pdf[type_col].astype(str),
                    pdf[ts_ms_col].astype("int64"),
                    pdf[tie_col].astype("int64"),
                )
            )
        events.sort(key=lambda e: (e[1], e[2]))
        n_late = 0
        if tail:
            last_ts, last_tie = tail[-1][1], tail[-1][2]
            fresh = []
            for e in events:
                if (e[1], e[2]) <= (last_ts, last_tie):
                    n_late += 1
                else:
                    fresh.append(e)
            events = fresh
        seq = tail + [(str(t), int(ts), int(tie)) for t, ts, tie in events]
        out_rows = []
        # cumulative late count for this key, including batches that
        # dropped events but emitted nothing (carried in pending_late)
        n_late_total = int(pending_late) + n_late
        # matches must END at a new event (index >= len(tail))
        for i in range(max(len(tail), k - 1), len(seq)):
            window = seq[i - k + 1 : i + 1]
            if all(window[j][0] == pat[j] for j in range(k)):
                # n_late is a per-key DELTA: carried on the batch's first
                # emitted match only (0 on the rest), so summing n_late
                # across all rows gives the exact total dropped count
                out_rows.append(
                    (kv[0], window[0][1], window[-1][1], window[-1][2],
                     n_late_total if not out_rows else 0)
                )
        new_tail = seq[-(k - 1):] if k > 1 else []
        # late counts reported on an emitted row are drained; otherwise
        # they stay pending so the next match surfaces them
        state.update(
            (
                [e[0] for e in new_tail],
                [e[1] for e in new_tail],
                [e[2] for e in new_tail],
                0 if out_rows else n_late_total,
            )
        )
        yield pd.DataFrame(
            out_rows,
            columns=[key, "start_ms", "end_ms", "end_tie", "n_late"],
        )

    out_schema = (
        f"{key} {key_type}, start_ms long, end_ms long, "
        "end_tie long, n_late long"
    )
    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=(
            "types array<string>, tss array<long>, ties array<long>, "
            "pending_late long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
