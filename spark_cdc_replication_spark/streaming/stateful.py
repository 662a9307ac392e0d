"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference needs no streaming state (trigger-once + checkpoint cover
its CDC semantics, SURVEY.md §2.10); this is the [EXT] surface for
operators Structured Streaming lacks natively — here, a per-key running
CDC state (event count + last-writer-wins value) maintained across
micro-batches and restarts.

Scale notes: state lives in the executor state store partitioned by the
group key — the same shuffle key as the batch LWW window, so the
streaming and batch paths have identical partitioning.  Arrow batches
in, Arrow batches out; state is a single tuple per key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output: one row per key touched in the micro-batch.
RUNNING_STATE_SCHEMA = (
    "id string, n_events bigint, last_value double, last_ts timestamp"
)
#: State tuple kept per key.
_STATE_SCHEMA = "n bigint, v double, ts timestamp"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v, ts = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["timestamp", "event_id"])
        n += len(pdf)
        if len(pdf):
            last = pdf.iloc[-1]
            cand_ts = last["timestamp"]
            if ts is None or cand_ts >= ts:
                v, ts = float(last["value"]), cand_ts
    state.update((n, v, ts))
    yield pd.DataFrame(
        {"id": [key[0]], "n_events": [n], "last_value": [v], "last_ts": [ts]}
    )


def running_cdc_state(changes: DataFrame) -> DataFrame:
    """Streaming per-key running state over parsed change rows
    (``id``, ``timestamp``, ``event_id``, ``value`` columns required).

    Each micro-batch emits the post-batch state of every touched key;
    state (count + LWW value) survives micro-batch boundaries and
    checkpoint restarts.
    """
    return changes.groupBy("id").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
