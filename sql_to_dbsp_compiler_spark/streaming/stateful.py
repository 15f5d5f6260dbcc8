"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics Spark's built-in streaming operators
can't express (the reference's analogue: hand-written DBSP operators
beyond the SQL surface).

Note: for plain streaming dedup Spark has a native operator
(`dropDuplicatesWithinWatermark`) whose state is watermark-bounded;
this module exists to exercise the custom-state path used for
operators Spark does NOT ship.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

DEDUP_STATE_SCHEMA = StructType([StructField("seen", ArrayType(LongType()))])


def streaming_dedup_first_per_key(events: DataFrame) -> DataFrame:
    """Emit only the first occurrence of each (user_id, event_id),
    regardless of delivery order; per-user state holds the seen-id set.

    Scale note: unbounded seen-sets are the worst case; in production
    the state is bounded by pairing this with an event-time watermark
    (ids older than the watermark can be evicted — that is exactly
    what Spark's native dropDuplicatesWithinWatermark does). A
    ProcessingTime TTL is deliberately NOT used: an armed timeout
    forces trigger(availableNow) runs to keep scheduling empty
    micro-batches until the deadline, so the query never terminates.
    """

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set[int] = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdfs:
            fresh = pdf[~pdf["event_id"].isin(seen)].drop_duplicates(subset=["event_id"])
            if len(fresh):
                seen.update(int(x) for x in fresh["event_id"])
                out.append(fresh[["user_id", "event_id", "ts"]])
        state.update((sorted(seen),))
        if out:
            yield pd.concat(out)

    return events.groupBy("user_id").applyInPandasWithState(
        dedup,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
