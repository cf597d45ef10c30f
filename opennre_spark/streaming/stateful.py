"""Custom stateful streaming operator via applyInPandasWithState
(north star: 'applyInPandasWithState for custom stateful operators').

`conversation_tracker`: per-conv_id running state over the transcript
stream — accumulates turn counts / max turn / latest timestamp across
micro-batches and emits one updated summary row per conversation per
batch. The state survives between triggers (grouped state store), so a
conversation whose turns arrive in different files/batches aggregates
correctly — the streaming analogue of the batch groupBy(conv_id).

Idle finalization (`idle_timeout_ms` > 0) uses ProcessingTimeTimeout to
emit an is_final row and drop state for conversations idle past the
timeout — the session-window shape for CONTINUOUS streams. Leave it 0
for bounded availableNow drains: a processing-time timeout can never
fire inside a one-shot trigger, and the query would otherwise wait on
it (observed hang).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("max_turn_idx", T.IntegerType()),
    T.StructField("last_ts_ms", T.LongType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("max_turn_idx", T.IntegerType()),
    T.StructField("is_final", T.BooleanType()),
])


def _make_tracker(idle_timeout_ms: int):
    def track(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, mx, _ = state.get
            state.remove()
            yield pd.DataFrame(
                [(conv_id, n, mx, True)],
                columns=["conv_id", "n_turns", "max_turn_idx", "is_final"],
            )
            return
        n, mx, last_ms = state.get if state.exists else (0, -1, 0)
        for pdf in pdfs:
            n += len(pdf)
            mx = max(mx, int(pdf["turn_idx"].max()))
            last_ms = max(last_ms, int(pdf["ts"].max().value // 10**6))
        state.update((n, mx, last_ms))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(conv_id, n, mx, False)],
            columns=["conv_id", "n_turns", "max_turn_idx", "is_final"],
        )

    return track


def conversation_tracker(
    transcripts_stream: DataFrame, idle_timeout_ms: int = 0
) -> DataFrame:
    """Streaming per-conversation running summaries with keyed state."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        transcripts_stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_tracker(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
