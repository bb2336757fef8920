"""Custom stateful streaming operator — applyInPandasWithState.

The reference's trigger only notifies on status *transitions* (backend/db/triggers.py:16
``NEW.status != OLD.status``).  In a stream, detecting transitions requires per-run
state (the last status seen).  This operator keeps that state with
``applyInPandasWithState`` — the engine pattern for any custom stateful operator
(SURVEY.md §2.9 / pyspark guide).  Emits one row per transition with the previous
status attached; repeated same-status events are suppressed exactly like the trigger.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("prev_status", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_status", T.StringType()),
        T.StructField("last_seq", T.LongType()),
    ]
)


def _track_transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (run_id,) = key
    if state.exists:
        last_status, last_seq = state.get
    else:
        last_status, last_seq = None, -1
    rows = []
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("seq")
    for r in batch.itertuples():
        if r.seq <= last_seq:
            continue  # replayed/out-of-order duplicate
        if r.status != last_status:
            rows.append((run_id, r.seq, last_status, r.status))
            last_status = r.status
        last_seq = r.seq
    state.update((last_status, int(last_seq)))
    yield pd.DataFrame(rows, columns=["run_id", "seq", "prev_status", "status"])


def status_transitions_stateful(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (run_id, seq, status, ...) -> transition rows, stateful."""
    return (
        events.select("run_id", "seq", "status")
        .groupBy("run_id")
        .applyInPandasWithState(
            _track_transitions,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
