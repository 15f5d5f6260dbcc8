"""Arbitrary stateful streaming via transformWithStateInPandas — the
Spark 4 successor to applyInPandasWithState (typed state variables:
ValueState / ListState / MapState, optional TTL, timers). The
reference's analogue is a hand-written DBSP operator holding its own
indexed Z-set state
(reference: SQL-compiler/.../circuit/operator/DBSPAggregateOperator.java);
here the state store supplies persistence/fault-tolerance and the
processor only writes the per-key transition function.

`running_topk_per_key` maintains a per-key top-k (by value, event_id
tie-break) across micro-batches and re-emits the key's CURRENT top-k
on every batch that touches the key, tagged with a deterministic
per-key update sequence number — so a test (or consumer) can select
each key's final state with max(seq), with no reliance on processing
time. State is bounded: k rows + one counter per key, independent of
stream length — the property that makes it safe on an unbounded
stream at cluster scale.

Runtime dependency: transformWithStateInPandas drives a state-server
protocol serialized with protobuf, so the google-protobuf runtime must
be installed on driver and executors (pyspark ships only the generated
message stubs). The test suite skips the round-trip test where the
runtime is absent; the operator uses nothing beyond the public Spark 4
API.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

TOPK_OUTPUT_SCHEMA = "user_id long, event_id long, value double, seq long"


class RunningTopKProcessor(StatefulProcessor):
    """Per-key running top-k with typed ListState + ValueState."""

    def __init__(self, k: int) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._topk = handle.getListState("topk", "event_id long, value double")
        self._seq = handle.getValueState("seq", "seq long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = [(int(r[0]), float(r[1])) for r in self._topk.get()]
        for pdf in rows:
            cur.extend(
                (int(e), float(v))
                for e, v in zip(pdf["event_id"], pdf["value"])
            )
        # value DESC, event_id ASC — deterministic under ties
        cur.sort(key=lambda t: (-t[1], t[0]))
        cur = cur[: self._k]
        self._topk.put([(e, v) for e, v in cur])
        seq = (self._seq.get()[0] if self._seq.exists() else 0) + 1
        self._seq.update((seq,))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(cur),
                "event_id": [e for e, _ in cur],
                "value": [v for _, v in cur],
                "seq": [seq] * len(cur),
            }
        )

    def close(self) -> None:
        pass


def running_topk_per_key(events: DataFrame, k: int = 3) -> DataFrame:
    """events(user_id, event_id, value) stream → append stream of each
    touched key's current top-k rows, tagged with the key's update
    sequence number."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTopKProcessor(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
