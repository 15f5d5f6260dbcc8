"""Structured Streaming IVM: incremental result == batch recompute —
DBSP's own correctness criterion (reference:
NaiveIncrementalTests.java asserts circuit(deltas) == view(full))."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.sources.tables import load_table
from sql_to_dbsp_compiler_spark.streaming.incremental import run_incremental, stream_from_dir
from sql_to_dbsp_compiler_spark.streaming.joins import stream_static_join
from sql_to_dbsp_compiler_spark.streaming.stateful import streaming_dedup_first_per_key
from sql_to_dbsp_compiler_spark.streaming.windows import tumbling_window_agg_stream


@pytest.fixture(scope="module")
def event_batches_dir(spark, tmp_path_factory):
    """sf0.001 events split into 3 micro-batch parquet files; batch 3
    re-delivers some of batch 1's rows (duplicates for dedup tests)."""
    base = str(tmp_path_factory.mktemp("event_stream"))
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    b1 = e.where(F.col("event_id") % 3 == 0)
    b2 = e.where(F.col("event_id") % 3 == 1)
    b3 = e.where((F.col("event_id") % 3 == 2) | (F.col("event_id") % 7 == 0))
    for i, b in enumerate([b1, b2, b3]):
        b.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, f"b{i}"))
    # flatten into one dir of files, ordered
    import glob
    import shutil

    out = str(tmp_path_factory.mktemp("event_files"))
    for i in range(3):
        src = glob.glob(os.path.join(base, f"b{i}", "*.parquet"))[0]
        shutil.copy(src, os.path.join(out, f"batch_{i}.parquet"))
    return out


@pytest.fixture(scope="module")
def events_schema(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events").schema


def test_incremental_aggregate_matches_batch(spark, event_batches_dir, events_schema):
    stream = stream_from_dir(spark, event_batches_dir, events_schema)

    def view(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("total"),
        )

    result = run_incremental(stream, view, output_mode="complete")
    batch = view(spark.read.parquet(event_batches_dir))
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))


def test_incremental_windowed_aggregate_matches_batch(spark, event_batches_dir, events_schema):
    stream = stream_from_dir(spark, event_batches_dir, events_schema)

    def view(df):
        return tumbling_window_agg_stream(
            df, "1 hour", "2 hours", "ts", F.count(F.lit(1)).alias("n")
        )

    result = run_incremental(stream, view, output_mode="complete")

    batch = (
        spark.read.parquet(event_batches_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n")
    )
    assert sorted(map(tuple, result.select("window_start", "event_type", "n").collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_dedup_drops_redelivered_rows(spark, event_batches_dir, events_schema):
    stream = stream_from_dir(spark, event_batches_dir, events_schema)
    result = run_incremental(
        stream, streaming_dedup_first_per_key, output_mode="append"
    )
    # every (user_id, event_id) exactly once, despite batch 3 overlap
    n_unique = (
        spark.read.parquet(event_batches_dir).select("user_id", "event_id").distinct().count()
    )
    assert result.count() == n_unique
    assert result.select("user_id", "event_id").distinct().count() == n_unique


def test_stream_static_join_matches_batch(spark, event_batches_dir, events_schema):
    static = load_table(spark, "/root/testdata/sf0.001", "customer")
    stream = stream_from_dir(spark, event_batches_dir, events_schema)

    def view(df):
        return stream_static_join(
            df.where(F.col("event_type") == "purchase"),
            static,
            F.col("user_id") == F.col("c_custkey"),
        ).select("event_id", "user_id", "c_name")

    result = run_incremental(stream, view, output_mode="append")
    batch = view(spark.read.parquet(event_batches_dir))
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))


@pytest.fixture(scope="module")
def time_ordered_batches_dir(spark, tmp_path_factory):
    """Events split into 3 time-ordered micro-batches (by ~10-day
    ranges). Stream-stream joins need a feed whose watermark advances
    monotonically, else older rows are (correctly) dropped as late."""
    import glob
    import shutil

    base = str(tmp_path_factory.mktemp("ts_stream"))
    out = str(tmp_path_factory.mktemp("ts_files"))
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    cuts = ["2024-01-11", "2024-01-21"]
    parts = [
        e.where(F.col("ts") < cuts[0]),
        e.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        e.where(F.col("ts") >= cuts[1]),
    ]
    for i, b in enumerate(parts):
        b.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, f"b{i}"))
        shutil.copy(
            glob.glob(os.path.join(base, f"b{i}", "*.parquet"))[0],
            os.path.join(out, f"batch_{i}.parquet"),
        )
    return out


def test_stream_stream_join_with_watermarks(spark, time_ordered_batches_dir, events_schema):
    """Self-join of the event stream: purchases matched to clicks by
    the same user within ±30 min (time-bounded stream-stream join;
    both buffers watermark-bounded). The 2-day watermark exceeds the
    max intra-batch disorder, so nothing is late and the append-mode
    stream must emit exactly the batch join."""
    from sql_to_dbsp_compiler_spark.streaming.joins import stream_stream_join

    event_batches_dir = time_ordered_batches_dir
    purchases = stream_from_dir(spark, event_batches_dir, events_schema).where(
        F.col("event_type") == "purchase"
    ).select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    clicks = stream_from_dir(spark, event_batches_dir, events_schema).where(
        F.col("event_type") == "click"
    ).select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 30 MINUTE"))
    )
    q = (
        stream_stream_join(purchases, clicks, cond, "2 days", "2 days", "p_ts", "c_ts")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    result = spark.table("ss_join")

    raw = spark.read.parquet(event_batches_dir)
    p = raw.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    c = raw.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    batch = p.join(c, cond)
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))


def test_materialize_incremental_view_to_parquet(spark, event_batches_dir, events_schema, tmp_path):
    """The parquet-materialized view after draining the stream equals
    the batch view — the reference's sink semantics (output relation =
    integral of output changes)."""
    from sql_to_dbsp_compiler_spark.streaming.sinks import materialize_incremental

    out = str(tmp_path / "mv")

    def view(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("total"),
        )

    stream = stream_from_dir(spark, event_batches_dir, events_schema)
    materialize_incremental(stream, view, ["event_type"], out)

    stored = spark.read.parquet(out)
    batch = view(spark.read.parquet(event_batches_dir))
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_windowed_max_matches_batch(spark, event_batches_dir, events_schema):
    """Nexmark q7 shape as a stream: max bid per tumbling hour."""
    stream = stream_from_dir(spark, event_batches_dir, events_schema)

    def view(df):
        return (
            df.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.max("value").alias("max_value"))
            .select(F.col("win.start").alias("window_start"), "max_value")
        )

    result = run_incremental(stream, view, output_mode="complete")
    batch = (
        spark.read.parquet(event_batches_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.max("value").alias("max_value"))
        .select(F.col("win.start").alias("window_start"), "max_value")
    )
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_session_window_matches_batch(spark, event_batches_dir, events_schema):
    """Session windows (5-day gap) maintained in the state store over
    micro-batched input == batch session_window aggregation."""
    stream = stream_from_dir(spark, event_batches_dir, events_schema)

    def view(df):
        return (
            df.groupBy(F.session_window("ts", "5 days"), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("session_window.start").alias("ws"),
                F.col("session_window.end").alias("we"),
                "user_id",
                "n",
            )
        )

    result = run_incremental(stream, view, output_mode="complete")
    batch = view(spark.read.parquet(event_batches_dir))
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))
    assert result.count() > 0


@pytest.mark.slow
def test_stream_stream_left_outer_join(spark, events_schema, tmp_path):
    """LEFT OUTER stream-stream join: unmatched purchases emit
    NULL-padded rows once the watermark passes their time bound.
    Sentinels (one per side, far future) push both branch watermarks
    past every real event so availableNow flushes the full result."""
    import datetime
    import glob
    import os
    import shutil

    from sql_to_dbsp_compiler_spark.streaming.joins import stream_stream_join

    base, out = str(tmp_path / "b"), str(tmp_path / "files")
    os.makedirs(out)
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    cuts = ["2024-01-11", "2024-01-21"]
    parts = [
        e.where(F.col("ts") < cuts[0]),
        e.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        e.where(F.col("ts") >= cuts[1]),
    ]
    sentinels = spark.createDataFrame(
        [
            (10**9, datetime.datetime(2024, 6, 1), -1, "purchase", 0.0, "{}"),
            (10**9 + 1, datetime.datetime(2024, 6, 1), -2, "click", 0.0, "{}"),
        ],
        schema="event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).select(*[f.name for f in e.schema.fields])
    for i, b in enumerate(parts + [sentinels]):
        d = os.path.join(base, f"b{i}")
        b.coalesce(1).write.mode("overwrite").parquet(d)
        shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], os.path.join(out, f"batch_{i}.parquet"))

    def sides(df):
        p = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
        )
        c = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
        )
        return p, c

    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 30 MINUTE"))
    )
    sp, sc = sides(stream_from_dir(spark, out, events_schema))
    q = (
        stream_stream_join(sp, sc, cond, "2 days", "2 days", "p_ts", "c_ts", how="left_outer")
        .writeStream.format("memory")
        .queryName("ss_left")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    result = spark.table("ss_left").where(F.col("p_id") < 10**9)

    bp, bc = sides(spark.read.parquet(out))
    batch = bp.join(bc, cond, "left_outer").where(F.col("p_id") < 10**9)
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))
    # the outer part is non-trivial: some purchases really are unmatched
    assert batch.where(F.col("c_id").isNull()).count() > 0


def test_streaming_lsh_neardup_matches_batch(spark, tmp_path_factory):
    """Streaming MinHash-LSH candidates == batch lsh_candidate_pairs
    on the same corpus: identical signature family and band geometry,
    so the distinct union of streamed pairs over all micro-batches
    must equal the batch pair set (no bucket exceeds the cap here)."""
    import glob
    import shutil

    from sql_to_dbsp_compiler_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )
    from sql_to_dbsp_compiler_spark.streaming.stateful import streaming_lsh_neardup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    sigs = docs.select(
        "doc_id", minhash_signature(F.col("text"), 16, 3).alias("sig")
    )
    expected = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", "sig", bands=4).collect()
    }
    assert expected, "fixture must contain at least one near-dup pair"

    # split into 2 micro-batch files
    base = str(tmp_path_factory.mktemp("doc_stream_raw"))
    out = str(tmp_path_factory.mktemp("doc_stream"))
    for i, pred in enumerate([F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1]):
        docs.where(pred).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, f"b{i}")
        )
        src = glob.glob(os.path.join(base, f"b{i}", "*.parquet"))[0]
        shutil.copy(src, os.path.join(out, f"batch_{i}.parquet"))

    stream = stream_from_dir(spark, out, docs.schema)
    result = run_incremental(stream, streaming_lsh_neardup, output_mode="append")
    got = {(r["id_a"], r["id_b"]) for r in result.collect()}
    assert got == expected


@pytest.mark.slow
def test_stream_stream_full_outer_join(spark, events_schema, tmp_path):
    """FULL OUTER stream-stream join: unmatched rows on BOTH sides
    emit NULL-padded once the watermark passes their bound — the last
    outer-join variant not yet exercised (inner and left_outer are
    above). Same sentinel technique to flush final state."""
    import datetime
    import glob
    import os
    import shutil

    from sql_to_dbsp_compiler_spark.streaming.joins import stream_stream_join

    base, out = str(tmp_path / "b"), str(tmp_path / "files")
    os.makedirs(out)
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    cuts = ["2024-01-11", "2024-01-21"]
    parts = [
        e.where(F.col("ts") < cuts[0]),
        e.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        e.where(F.col("ts") >= cuts[1]),
    ]
    sentinels = spark.createDataFrame(
        [
            (10**9, datetime.datetime(2024, 6, 1), -1, "purchase", 0.0, "{}"),
            (10**9 + 1, datetime.datetime(2024, 6, 1), -2, "click", 0.0, "{}"),
        ],
        schema="event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).select(*[f.name for f in e.schema.fields])
    for i, b in enumerate(parts + [sentinels]):
        d = os.path.join(base, f"b{i}")
        b.coalesce(1).write.mode("overwrite").parquet(d)
        shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], os.path.join(out, f"batch_{i}.parquet"))

    def sides(df):
        p = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
        )
        c = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
        )
        return p, c

    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 30 MINUTE"))
    )
    sp, sc = sides(stream_from_dir(spark, out, events_schema))
    q = (
        stream_stream_join(sp, sc, cond, "2 days", "2 days", "p_ts", "c_ts", how="full_outer")
        .writeStream.format("memory")
        .queryName("ss_full")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    keep = (F.col("p_id").isNull() | (F.col("p_id") < 10**9)) & (
        F.col("c_id").isNull() | (F.col("c_id") < 10**9)
    )
    result = spark.table("ss_full").where(keep)

    bp, bc = sides(spark.read.parquet(out))
    batch = bp.join(bc, cond, "full_outer").where(keep)
    assert sorted(
        map(tuple, result.fillna(-1).collect())
    ) == sorted(map(tuple, batch.fillna(-1).collect()))
    # non-trivial on both sides: unmatched purchases AND unmatched clicks
    assert batch.where(F.col("c_id").isNull()).count() > 0
    assert batch.where(F.col("p_id").isNull()).count() > 0


def test_transform_with_state_running_topk_matches_batch(spark, tmp_path):
    """transformWithStateInPandas (the Spark 4 typed-state API):
    per-key running top-3 maintained across 3 micro-batches. Each
    key's final emission (max per-key seq) must equal the batch top-3
    over all data — state carries correctly across batches and the
    per-key sequence numbers make the final state selectable without
    any processing-time dependence.

    Requires the google-protobuf runtime (the state-server protocol
    transformWithStateInPandas speaks); absent in this sandbox, so the
    test skips there — the operator itself is plain Spark 4 API."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs the protobuf runtime",
    )
    import os

    from pyspark.sql import Window

    from sql_to_dbsp_compiler_spark.streaming.transform_state import (
        running_topk_per_key,
    )

    out = str(tmp_path / "files")
    os.makedirs(out)
    e = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "event_id", "value")
        .where(F.col("user_id") < 10)
    )
    parts = [
        e.where(F.col("event_id") % 3 == i).coalesce(1) for i in range(3)
    ]
    for i, b in enumerate(parts):
        b.write.mode("overwrite").parquet(os.path.join(out, f"_b{i}"))
    import glob
    import shutil

    for i in range(3):
        src = glob.glob(os.path.join(out, f"_b{i}", "*.parquet"))[0]
        shutil.copy(src, os.path.join(out, f"batch_{i}.parquet"))
        shutil.rmtree(os.path.join(out, f"_b{i}"))

    schema = "user_id long, event_id long, value double"
    stream = stream_from_dir(spark, out, _parse_ddl(schema))
    q = (
        running_topk_per_key(stream, k=3)
        .writeStream.format("memory")
        .queryName("tws_topk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()

    emitted = spark.table("tws_topk")
    last_seq = emitted.groupBy("user_id").agg(F.max("seq").alias("seq"))
    final = emitted.join(last_seq, ["user_id", "seq"]).select(
        "user_id", "event_id", "value"
    )

    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    batch = (
        spark.read.parquet(out)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # state really evolved: some key saw more than one update
    assert last_seq.agg(F.max("seq")).collect()[0][0] > 1


def _parse_ddl(ddl: str):
    from pyspark.sql.types import StructType

    return StructType.fromDDL(ddl)


def test_running_topk_processor_transition_function():
    """The processor's per-key transition logic, unit-tested with fake
    state (runs even without the protobuf runtime): merge-sort-trim
    against existing state, deterministic tie-break, seq increments."""
    import pandas as pd

    from sql_to_dbsp_compiler_spark.streaming.transform_state import (
        RunningTopKProcessor,
    )

    class FakeList:
        def __init__(self):
            self.rows = []

        def get(self):
            return iter(self.rows)

        def put(self, rows):
            self.rows = list(rows)

    class FakeValue:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    p = RunningTopKProcessor(k=3)
    p._topk, p._seq = FakeList(), FakeValue()

    out1 = list(
        p.handleInputRows(
            (7,),
            iter([pd.DataFrame({"event_id": [1, 2, 3, 4], "value": [5.0, 9.0, 1.0, 9.0]})]),
            None,
        )
    )[0]
    # top-3 by value desc, event_id asc on the 9.0 tie
    assert list(out1["event_id"]) == [2, 4, 1]
    assert list(out1["seq"]) == [1, 1, 1]

    out2 = list(
        p.handleInputRows(
            (7,),
            iter([pd.DataFrame({"event_id": [5], "value": [7.0]})]),
            None,
        )
    )[0]
    assert list(out2["event_id"]) == [2, 4, 5]  # 7.0 evicts 5.0
    assert list(out2["seq"]) == [2, 2, 2]
    assert p._topk.rows == [(2, 9.0), (4, 9.0), (5, 7.0)]


def test_scd2_processor_transition_function():
    """Streaming SCD2 per-key transition logic with fake state: opens,
    closes on change, skips no-change and late rows, seq totals order
    the changelog; reconstruction (last seq per valid_from) equals the
    batch SCD2 of the same rows."""
    import datetime as dt

    import pandas as pd

    from sql_to_dbsp_compiler_spark.streaming.transform_state import (
        Scd2Processor,
    )

    class FakeValue:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    p = Scd2Processor()
    p._open, p._seq = FakeValue(), FakeValue()

    def T(h):
        return dt.datetime(2024, 1, 1, h)

    def norm(v):
        if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return None
        return v.to_pydatetime() if isinstance(v, pd.Timestamp) else v

    def feed(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_id", "event_type"])
        outs = list(p.handleInputRows((7,), iter([pdf]), None))
        return [
            tuple(norm(v) for v in r)
            for r in outs[0].itertuples(index=False)
        ]

    out1 = feed([(T(1), 1, "view"), (T(2), 2, "view"), (T(3), 3, "buy")])
    assert out1 == [
        (7, "view", T(1), None, True, 1),
        (7, "view", T(1), T(3), False, 2),
        (7, "buy", T(3), None, True, 3),
    ]
    # batch 2: no-change row, then a change; a late row (< open
    # valid_from) is ignored
    out2 = feed([(T(2), 9, "buy"), (T(4), 4, "buy"), (T(5), 5, "view")])
    assert out2 == [
        (7, "buy", T(3), T(5), False, 4),
        (7, "view", T(5), None, True, 5),
    ]
    assert p._open.v == ("view", T(5))

    # reconstruction: last seq per valid_from == batch SCD2 over all rows
    final = {}
    for row in out1 + out2:
        final[row[2]] = row
    got = sorted(final.values(), key=lambda r: r[2])
    assert [(r[1], r[2], r[3], r[4]) for r in got] == [
        ("view", T(1), T(3), False),
        ("buy", T(3), T(5), False),
        ("view", T(5), None, True),
    ]


def test_transform_with_state_scd2_matches_batch(spark, tmp_path):
    """Streaming SCD2 across 3 ts-ordered micro-batches reconstructs
    exactly the batch x_scd2_dimension result. Protobuf-gated like the
    topk round-trip (transformWithStateInPandas state-server)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs the protobuf runtime",
    )
    import os

    from sql_to_dbsp_compiler_spark.queries import REGISTRY
    from sql_to_dbsp_compiler_spark.streaming.transform_state import (
        streaming_scd2,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "files")
    os.makedirs(out)
    e = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    qs = e.selectExpr(
        "percentile_approx(cast(ts as double), array(0.33, 0.66)) as q"
    ).collect()[0].q
    t1, t2 = qs[0], qs[1]
    parts = [
        e.where(F.col("ts").cast("double") <= t1),
        e.where(
            (F.col("ts").cast("double") > t1)
            & (F.col("ts").cast("double") <= t2)
        ),
        e.where(F.col("ts").cast("double") > t2),
    ]
    for i, b in enumerate(parts):
        b.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"_b{i}")
        )
    import glob
    import shutil

    for i in range(3):
        src = glob.glob(os.path.join(out, f"_b{i}", "*.parquet"))[0]
        shutil.copy(src, os.path.join(out, f"batch_{i}.parquet"))
        shutil.rmtree(os.path.join(out, f"_b{i}"))

    schema = "user_id long, event_id long, event_type string, ts timestamp"
    stream = stream_from_dir(spark, out, _parse_ddl(schema))
    q = (
        streaming_scd2(stream)
        .writeStream.format("memory")
        .queryName("tws_scd2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()

    emitted = spark.table("tws_scd2")
    last = emitted.groupBy("user_id", "valid_from").agg(
        F.max("seq").alias("seq")
    )
    final = emitted.join(last, ["user_id", "valid_from", "seq"]).select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current"
    )
    batch = REGISTRY["x_scd2_dimension"].fn(spark, sf).select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current"
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )


@pytest.mark.slow
def test_streaming_checkpoint_restart_recovers_state(spark, tmp_path):
    """Exactly-once restart from a checkpoint: a watermarked tumbling
    aggregate runs over two files, STOPS, and a NEW query (same
    checkpoint, same sink) processes two more. The windows whose state
    was built BEFORE the stop are only finalized (watermark passes)
    AFTER the restart — so correct output proves the state store and
    watermark recovered, and the file-sink manifest proves no batch
    was emitted twice. This is the fault-tolerance contract the
    reference delegates to its host; here it is Structured
    Streaming's checkpoint, exercised end-to-end."""
    import datetime as dt
    import os

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    def T(h, m=0):
        return dt.datetime(2024, 3, 1, h, m)

    schema = "user_id long, event_type string, ts timestamp"
    files = [
        [(1, "a", T(1, 10)), (2, "a", T(1, 20)), (3, "b", T(2, 30))],
        [(4, "c", T(5, 0))],
        [(5, "d", T(8, 0))],
        [(6, "e", T(9, 0))],
    ]

    def add_file(i):
        spark.createDataFrame(files[i], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"_f{i}"))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / f"_f{i}" / "*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"f{i}.parquet"))
        shutil.rmtree(str(tmp_path / f"_f{i}"))

    def run_once():
        stream = stream_from_dir(spark, src, _parse_ddl(schema))
        agged = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "n",
            )
        )
        q = (
            agged.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.awaitTermination()

    add_file(0)
    add_file(1)
    run_once()  # builds state for h1/h2/h5 windows; none finalized yet
    first = {tuple(r) for r in spark.read.parquet(sink).collect()} if (
        os.path.exists(sink) and any(f.endswith(".parquet") for f in os.listdir(sink))
    ) else set()

    add_file(2)
    add_file(3)
    run_once()  # RESTART from checkpoint: finalizes h1/h2 (wm 04:00) and h5 (07:00)

    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    want = [
        (T(1), T(2), 2),   # two 'a' rows — state from BEFORE the restart
        (T(2), T(3), 1),
        (T(5), T(6), 1),
    ]
    assert got == want, (got, first)
    # no duplicates across the restart (exactly-once file sink)
    assert len(got) == len(set(got))


def test_streaming_contamination_ingest_gate(spark, tmp_path_factory):
    """Decontamination as an INGEST GATE: incoming documents stream
    through a shingle explode + stream-static join against the
    (static, df-capped) eval shingle set, with the per-(train, eval)
    overlap counted in complete mode. Result == the batch
    ngram_contamination pair counts restricted to streamed docs —
    incremental ingest and the batch sweep agree on what is
    contaminated."""
    import os as _os

    from sql_to_dbsp_compiler_spark.llm.dedup import ngram_contamination, shingles

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    eval_pred = F.col("doc_id") % 97 == 0
    # batch reference over the SAME df-capped shingle universe
    batch = (
        ngram_contamination(docs, eval_pred, n=3, max_df=20)
        .select("train_doc_id", "eval_doc_id", "shared_ngrams")
    )

    # static side: eval shingle set, df-capped over the full corpus
    sh = docs.select(
        "doc_id", eval_pred.alias("is_eval"),
        F.explode(shingles(F.col("text"), 3)).alias("s"),
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    kept = sh.join(dfreq.where(F.col("df") <= 20), "s")
    eval_set = (
        kept.where("is_eval").select(F.col("doc_id").alias("eval_doc_id"), "s")
    )
    eval_pdf = eval_set.toPandas()  # small by construction (held-out slice)

    # stream the TRAIN docs in 2 micro-batch files
    base = str(tmp_path_factory.mktemp("doc_stream"))
    train = docs.where(~eval_pred)
    for i, part in enumerate(
        [train.where(F.col("doc_id") % 2 == 0), train.where(F.col("doc_id") % 2 == 1)]
    ):
        part.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(base, f"b{i}")
        )
    import glob as _glob
    import shutil as _shutil

    files_dir = str(tmp_path_factory.mktemp("doc_files"))
    for i in range(2):
        src = _glob.glob(_os.path.join(base, f"b{i}", "*.parquet"))[0]
        _shutil.copy(src, _os.path.join(files_dir, f"batch_{i}.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(files_dir)
    )
    static_eval = spark.createDataFrame(eval_pdf)
    gated = (
        stream.select(
            F.col("doc_id").alias("train_doc_id"),
            F.explode(shingles(F.col("text"), 3)).alias("s"),
        )
        .join(F.broadcast(static_eval), "s")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("contam_gate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("contam_gate").collect()))
    # stream side never saw eval docs' own shingle rows as train side,
    # and the static side carries the df cap — so the pair counts must
    # equal the batch cascade exactly
    assert got == sorted(map(tuple, batch.collect()))
    assert len(got) > 0


def test_funnel_processor_transition_function():
    """Streaming funnel per-key transition with fake state (runs
    without the protobuf runtime): exact under cross-batch disorder —
    a LATE signup must lower t1 and unlock an earlier kept click as
    the new t2; clicks above the current t2 are discarded forever
    (they can never become a min of a growing eligible set)."""
    import pandas as pd

    from sql_to_dbsp_compiler_spark.streaming.transform_state import (
        FunnelProcessor,
    )

    class FakeList:
        def __init__(self):
            self.rows = []

        def get(self):
            return iter(self.rows)

        def put(self, rows):
            self.rows = list(rows)

    class FakeValue:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    def ts(h, m=0):
        return pd.Timestamp(2024, 1, 1, h, m)

    p = FunnelProcessor()
    p._t1, p._seq = FakeValue(), FakeValue()
    p._clicks, p._purchases = FakeList(), FakeList()

    def step(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_type"])
        return list(p.handleInputRows((42,), iter([pdf]), None))[0].iloc[0]

    # batch 1: click+purchase arrive BEFORE any signup → stage 0
    r1 = step([(ts(10), "click"), (ts(10, 30), "purchase")])
    assert r1["funnel_stage"] == 0 and r1["seq"] == 1

    # batch 2: signup@09 unlocks both → stage 3
    r2 = step([(ts(9), "signup")])
    assert r2["funnel_stage"] == 3
    assert r2["signup_ts"] == ts(9) and r2["click_ts"] == ts(10)
    assert r2["purchase_ts"] == ts(10, 30)

    # batch 3: LATE signup@08 lowers t1; the kept click@09:30 (≤ old
    # t2) becomes the new t2; click@11 (> t2) is discarded forever
    r3 = step([(ts(8), "signup"), (ts(9, 30), "click"), (ts(11), "click")])
    assert r3["funnel_stage"] == 3
    assert r3["signup_ts"] == ts(8) and r3["click_ts"] == ts(9, 30)
    assert all(c[0] <= ts(9, 30) for c in p._clicks.rows)


def test_transform_with_state_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel over 3 DISORDERED micro-batches == the batch
    x_event_funnel query for every user (final per-key emission =
    max seq). Skips without the protobuf runtime, like the other
    transformWithStateInPandas round-trips."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs the protobuf runtime",
    )
    import glob
    import os
    import shutil

    from sql_to_dbsp_compiler_spark.queries import REGISTRY
    from sql_to_dbsp_compiler_spark.streaming.transform_state import (
        streaming_funnel,
    )

    out = str(tmp_path / "files")
    os.makedirs(out)
    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_type", "ts"
    )
    # event_id-based split = timestamp disorder across batches
    full = load_table(spark, "/root/testdata/sf0.001", "events")
    for i in range(3):
        b = full.where(F.col("event_id") % 3 == i).select(
            "user_id", "event_type", "ts"
        )
        b.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, f"_b{i}"))
        src = glob.glob(os.path.join(out, f"_b{i}", "*.parquet"))[0]
        shutil.copy(src, os.path.join(out, f"batch_{i}.parquet"))
        shutil.rmtree(os.path.join(out, f"_b{i}"))

    stream = stream_from_dir(
        spark, out, _parse_ddl("user_id long, event_type string, ts timestamp")
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory")
        .queryName("tws_funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    emitted = spark.table("tws_funnel")
    last = emitted.groupBy("user_id").agg(F.max("seq").alias("seq"))
    final = emitted.join(last, ["user_id", "seq"]).select(
        "user_id", "signup_ts", "click_ts", "purchase_ts", "funnel_stage"
    )
    batch = REGISTRY["x_event_funnel"].fn(spark, "/root/testdata/sf0.001")
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_rate_anomaly_matches_batch(spark, tmp_path_factory):
    """Streaming twin of y_event_rate_anomaly: the hourly count
    aggregate maintains in Structured Streaming (complete mode) while
    events arrive in UNORDERED micro-batches; the trailing z-score is
    a pure function of the count series, so composing it over the
    streamed counts must reproduce the batch detector exactly —
    ingest-time monitoring and the batch sweep flag the same hours."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from pyspark.sql import Window

    from sql_to_dbsp_compiler_spark.queries import REGISTRY

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    batch_out = sorted(
        map(tuple, REGISTRY["y_event_rate_anomaly"].fn(
            spark, "/root/testdata/sf0.01"
        ).collect())
    )

    # three unordered micro-batches (by user_id stripe, not by time)
    base = str(tmp_path_factory.mktemp("rate_stream"))
    files_dir = str(tmp_path_factory.mktemp("rate_files"))
    for i in range(3):
        part = events.where(F.col("user_id") % 3 == i)
        part.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(base, f"b{i}")
        )
        src = _glob.glob(_os.path.join(base, f"b{i}", "*.parquet"))[0]
        _shutil.copy(src, _os.path.join(files_dir, f"batch_{i}.parquet"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(files_dir)
    )
    counts = stream.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    q = (
        counts.writeStream.format("memory")
        .queryName("rate_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()

    hc = spark.table("rate_counts")
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    t = hc.select(
        "event_type", "h", "c",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("c").over(w).alias("sc"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("scc"),
    )
    k = F.col("k").cast("double")
    sc, scc = F.col("sc").cast("double"), F.col("scc").cast("double")
    var_num = F.col("k") * scc - sc * F.col("sc").cast("double")
    stream_out = sorted(map(tuple, (
        t.where((F.col("k") >= 12) & (var_num > 0))
        .select(
            "event_type", "h",
            F.col("c").cast("bigint").alias("c"),
            F.col("k").cast("bigint").alias("k_trailing"),
            F.round((F.col("c") - sc / k) / F.sqrt(var_num / (k * (k - 1))), 9)
            .alias("z"),
        )
    ).collect()))
    assert stream_out == batch_out
    assert len(stream_out) > 100


def test_streaming_misra_gries_matches_batch(spark, tmp_path_factory):
    """Streaming twin of the exact heavy-hitters operator (r7): the
    Misra–Gries summary maintained across UNORDERED micro-batches via
    applyInPandasWithState, then composed with the batch recount —
    the streamed candidates must be a superset of every key with
    global frequency ≥ N/k (the MG completeness guarantee survives
    the batch-merge rule), the per-key undercount must respect the
    (N − Σcounters)/(k+1) bound, and the recounted result must equal
    the batch heavy_hitters output exactly."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from sql_to_dbsp_compiler_spark.operators.heavy_hitters import heavy_hitters
    from sql_to_dbsp_compiler_spark.streaming.stateful import streaming_misra_gries

    K = 4
    events = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "event_type"
    )
    batch_out = sorted(
        map(tuple, heavy_hitters(events, "event_type", K).collect())
    )

    base = str(tmp_path_factory.mktemp("mg_stream"))
    files_dir = str(tmp_path_factory.mktemp("mg_files"))
    for i in range(3):
        part = events.where(F.col("user_id") % 3 == i)
        part.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(base, f"b{i}")
        )
        src = _glob.glob(_os.path.join(base, f"b{i}", "*.parquet"))[0]
        _shutil.copy(src, _os.path.join(files_dir, f"batch_{i}.parquet"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(files_dir)
    )
    q = (
        streaming_misra_gries(stream, "event_type", K)
        .writeStream.format("memory")
        .queryName("mg_summary")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()

    summ = spark.table("mg_summary")
    last = summ.agg(F.max("step")).collect()[0][0]
    final = {
        r["key"]: (r["lower_bound"], r["n_seen"])
        for r in summ.where(F.col("step") == last).collect()
    }
    assert final, "no summary emitted"
    n_seen = next(iter(final.values()))[1]

    exact = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = sum(exact.values())
    assert n_seen == n
    # completeness: every key with freq >= N/K survives in the summary
    for key, cnt in exact.items():
        if cnt >= n / K:
            assert key in final, f"{key} (cnt={cnt}) evicted"
    # undercount bound: true - lower <= (N - sum(counters)) / (K + 1)
    slack = (n - sum(lb for lb, _ in final.values())) / (K + 1)
    for key, (lb, _) in final.items():
        assert lb <= exact[key] <= lb + slack + 1e-9, (key, lb, exact[key])

    # phase 2: exact recount over the streamed candidate set == batch
    cand = spark.createDataFrame(
        [(k,) for k in final], "event_type string"
    )
    recount = (
        events.join(F.broadcast(cand), "event_type", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= (n // K) + 1)
    )
    assert sorted(map(tuple, recount.collect())) == batch_out
