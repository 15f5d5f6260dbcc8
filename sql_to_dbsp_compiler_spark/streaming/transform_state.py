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


SCD2_OUTPUT_SCHEMA = (
    "user_id long, event_type string, valid_from timestamp, "
    "valid_to timestamp, is_current boolean, seq long"
)


class Scd2Processor(StatefulProcessor):
    """Streaming SCD2 dimension maintenance: per-key state holds the
    OPEN version (event_type, valid_from) and the per-key changelog
    sequence. On each attribute change the processor emits two
    changelog rows — the previous version CLOSED (valid_to set,
    is_current False) and the new version OPEN — so a consumer
    reconstructs the dimension with last-seq-wins per (key,
    valid_from). This is the streaming face of the batch
    x_scd2_dimension query (queries/pipeline2.py); equality of the
    reconstruction with the batch result is the test gate.

    Rows within and across micro-batches are consumed in (ts,
    event_id) order per key; late rows older than the open version's
    valid_from are counted into state-safety (ignored) rather than
    rewriting history — the same contract a watermark-bounded CDC
    apply gives. State is O(1) per key regardless of stream length."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._open = handle.getValueState(
            "open", "event_type string, valid_from timestamp"
        )
        self._seq = handle.getValueState("seq", "seq long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        incoming = []
        for pdf in rows:
            incoming.extend(
                (ts.to_pydatetime(), int(e), str(t))
                for ts, e, t in zip(pdf["ts"], pdf["event_id"], pdf["event_type"])
            )
        incoming.sort(key=lambda r: (r[0], r[1]))
        cur = self._open.get() if self._open.exists() else None
        cur_type, cur_from = (cur[0], cur[1]) if cur else (None, None)
        seq = self._seq.get()[0] if self._seq.exists() else 0
        out = []
        uid = int(key[0])
        for ts, _eid, etype in incoming:
            if cur_type is None:
                cur_type, cur_from = etype, ts
                seq += 1
                out.append((uid, etype, ts, None, True, seq))
            elif ts < cur_from:
                continue  # late row older than the open version
            elif etype != cur_type:
                seq += 1
                out.append((uid, cur_type, cur_from, ts, False, seq))
                seq += 1
                out.append((uid, etype, ts, None, True, seq))
                cur_type, cur_from = etype, ts
        self._open.update((cur_type, cur_from))
        self._seq.update((seq,))
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "event_type", "valid_from",
                "valid_to", "is_current", "seq",
            ],
        )

    def close(self) -> None:
        pass


def streaming_scd2(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, event_type, ts) stream → SCD2
    changelog (last-seq-wins per (user_id, valid_from))."""
    return events.groupBy("user_id").transformWithStateInPandas(
        Scd2Processor(),
        outputStructType=SCD2_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, signup_ts timestamp, click_ts timestamp, "
    "purchase_ts timestamp, funnel_stage int, seq long"
)


class FunnelProcessor(StatefulProcessor):
    """Real-time ordered conversion funnel (the streaming face of the
    batch x_event_funnel query): per user, t1 = min signup ts, t2 =
    min click ts AFTER t1, t3 = min purchase ts AFTER t2 — exact under
    ARBITRARY cross-batch disorder, with provably sufficient pruned
    state:

    - signups: only the minimum matters (min is order-insensitive) →
      one value;
    - clicks: t1 only decreases as late signups arrive, so a click
      can become the new t2 later only if it is ≤ the current t2 —
      clicks > t2 are discarded forever; the kept set (clicks ≤ t2)
      is exactly the candidates any future t1 could unlock;
    - purchases: the same argument against t3.

    Each touched key re-emits its CURRENT funnel row with a per-key
    seq — final state selects with max(seq), no processing-time
    dependence. Equality with the batch funnel after streaming
    disordered micro-batches is the test gate."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._t1 = handle.getValueState("t1", "t1 timestamp")
        self._clicks = handle.getListState("clicks", "ts timestamp")
        self._purchases = handle.getListState("purchases", "ts timestamp")
        self._seq = handle.getValueState("seq", "seq long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        t1 = self._t1.get()[0] if self._t1.exists() else None
        clicks = sorted(r[0] for r in self._clicks.get())
        purchases = sorted(r[0] for r in self._purchases.get())
        for pdf in rows:
            for ts, etype in zip(pdf["ts"], pdf["event_type"]):
                ts = ts.to_pydatetime()
                if etype == "signup":
                    if t1 is None or ts < t1:
                        t1 = ts
                elif etype == "click":
                    clicks.append(ts)
                elif etype == "purchase":
                    purchases.append(ts)
        clicks.sort()
        purchases.sort()
        # recompute the funnel from sufficient state
        t2 = next((c for c in clicks if t1 is not None and c > t1), None)
        t3 = next((p for p in purchases if t2 is not None and p > t2), None)
        # prune: candidates beyond the current stage point can never
        # be needed again (t1/t2 only decrease over time)
        if t2 is not None:
            clicks = [c for c in clicks if c <= t2]
        if t3 is not None:
            purchases = [p for p in purchases if p <= t3]
        # exists() already encodes "no signup yet": writing (None,)
        # would persist a null field through the state server, a path
        # the protobuf-gated round-trip tests can't always cover
        # (ADVICE r4) — skip the update while t1 is unknown.
        if t1 is not None:
            self._t1.update((t1,))
        self._clicks.put([(c,) for c in clicks])
        self._purchases.put([(p,) for p in purchases])
        seq = (self._seq.get()[0] if self._seq.exists() else 0) + 1
        self._seq.update((seq,))
        stage = 3 if t3 else 2 if t2 else 1 if t1 else 0
        yield pd.DataFrame(
            [(int(key[0]), t1, t2, t3, stage, seq)],
            columns=[
                "user_id", "signup_ts", "click_ts",
                "purchase_ts", "funnel_stage", "seq",
            ],
        )

    def close(self) -> None:
        pass


def streaming_funnel(events: DataFrame) -> DataFrame:
    """events(user_id, event_type, ts) stream → append stream of each
    touched user's current funnel row (select finals with max(seq))."""
    return events.groupBy("user_id").transformWithStateInPandas(
        FunnelProcessor(),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
