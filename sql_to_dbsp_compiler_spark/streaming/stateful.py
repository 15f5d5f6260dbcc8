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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
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


# ---------------------------------------------------------------------------
# Streaming MinHash-LSH near-dup candidates
# ---------------------------------------------------------------------------

LSH_PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
    ]
)

LSH_STATE_SCHEMA = StructType([StructField("members", ArrayType(LongType()))])


def streaming_lsh_neardup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Streaming MinHash-LSH candidate pairs: the batch cascade's
    banding run continuously. Signatures and band keys are the SAME
    pure column expressions as the batch path (`minhash_signature` +
    xxhash64 band slices), so a doc hashes to identical buckets in
    both modes; the stateful stage keeps each bucket's member ids and
    emits (old, new) pairs the moment a new member lands — near-dup
    alerts with per-micro-batch latency instead of a nightly job.

    State per key is one id array, bounded by ``max_bucket``: a bucket
    that grows past the cap stops emitting (the batch path's
    hot-bucket guard applied PROSPECTIVELY — already-emitted pairs
    cannot be retracted in append mode; cross-band duplicate pairs are
    likewise left to the consumer to `distinct`, exactly what the
    batch path's final distinct does).

    At scale the shuffle key is (band_id, band_hash) — the same
    linear-in-corpus banding shuffle as batch LSH; state volume is the
    corpus id-list partitioned across buckets."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.llm.dedup import minhash_signature

    rows = num_hashes // bands
    sig = docs.select(
        F.col(id_col).alias("__id"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("__sig"),
    )
    banded = sig.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(F.slice(F.col("__sig"), b * rows + 1, rows)).alias(
                        "band_hash"
                    ),
                ),
            )
        ).alias("band"),
    ).select("__id", "band.band_id", "band.band_hash")

    def emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        members: list[int] = list(state.get[0]) if state.exists else []
        known = set(members)
        out = []
        for pdf in pdfs:
            for doc in pdf["__id"]:
                doc = int(doc)
                if doc in known or len(members) > max_bucket:
                    continue
                if members:
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": [min(m, doc) for m in members],
                                "id_b": [max(m, doc) for m in members],
                            }
                        )
                    )
                members.append(doc)
                known.add(doc)
        state.update((members,))
        if out:
            yield pd.concat(out)

    return banded.groupBy("band_id", "band_hash").applyInPandasWithState(
        emit,
        outputStructType=LSH_PAIR_SCHEMA,
        stateStructType=LSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra–Gries heavy-hitter summary
# ---------------------------------------------------------------------------

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("step", LongType()),
        StructField("key", StringType()),
        StructField("lower_bound", LongType()),
        StructField("n_seen", LongType()),
    ]
)

MG_STATE_SCHEMA = StructType(
    [
        StructField("step", LongType()),
        StructField("n_seen", LongType()),
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def streaming_misra_gries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Streaming twin of operators/heavy_hitters.py: a Misra–Gries
    summary maintained ACROSS micro-batches with the same MERGE rule
    the batch operator applies across Arrow batches (add counts; when
    over k survivors, subtract the (k+1)-th largest and drop
    non-positives — Agarwal et al. PODS'12 mergeable summaries).
    Emits the full current summary each batch, tagged with a step
    number so the latest snapshot is selectable; ``lower_bound`` is
    the MG counter (true count ≥ lower_bound, undercount ≤
    (n_seen − Σ lower_bound)/(k+1)). Exact counts come from composing
    a recount over the candidate set, exactly like the batch phase 2.

    Scale note: this twin folds the whole stream through ONE state
    group to pin the merge-rule semantics (maintained == batch); the
    production streaming layout keeps one summary per shard — MG
    summaries are mergeable by construction, so shard summaries merge
    at query time with the identical rule."""
    import pandas as _pd

    def fold(
        key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
    ) -> "Iterator[pd.DataFrame]":
        if state.exists:
            step, n_seen, keys, counts = state.get
            counters = dict(zip(keys, counts))
        else:
            step, n_seen, counters = 0, 0, {}
        for pdf in pdfs:
            vc = pdf["key"].dropna().value_counts()
            n_seen += int(vc.sum())
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                d = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - d for v, c in counters.items() if c > d}
        step += 1
        state.update(
            (step, n_seen, list(counters.keys()),
             [int(c) for c in counters.values()])
        )
        yield _pd.DataFrame(
            {
                "step": step,
                "key": list(counters.keys()),
                "lower_bound": [int(c) for c in counters.values()],
                "n_seen": n_seen,
            }
        )

    keyed = df.select(
        F.col(key_col).cast("string").alias("key"), F.lit(1).alias("__g")
    )
    return keyed.groupBy("__g").applyInPandasWithState(
        fold,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
