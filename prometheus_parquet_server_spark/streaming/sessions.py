"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming at all (SURVEY.md §2.7); this is the
north-star "custom stateful operator" pattern — ``applyInPandasWithState``
keeps per-key state (the open session) across micro-batches and emits a row
whenever an inactivity gap closes a session.

State is bounded: one open session per key. At scale the state store is
RocksDB-backed per partition; keys shuffle-hash once. Event-time timeouts
(``GroupStateTimeout.EventTimeTimeout``) would flush idle sessions in a real
deployment; the availableNow tests exercise the in-batch gap logic.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("last", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("sv", T.DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_s: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    value_col: str = "value",
) -> DataFrame:
    """Close a session when consecutive per-user events are more than
    ``gap_s`` apart; emit (user, start, end, n_events, sum_value) per closed
    session. The open tail session stays in state."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n, sv = 0, 0.0
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for t, v in zip(pdf[ts_col], pdf[value_col]):
                t, v = float(t), float(v)
                if start is None:
                    start, last, n, sv = t, t, 1, v
                elif t - last > gap_s:
                    closed.append((user, start, last, n, sv))
                    start, last, n, sv = t, t, 1, v
                else:
                    last, n, sv = t, n + 1, sv + v
        if start is not None:
            state.update((start, last, n, sv))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
