"""Two-phase prefix sum: row-identical to the single-window form,
with the skew-killing plan shape (window partitioned by (key, bucket),
offsets broadcast)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.prefix_sum import (
    prefix_sum_by_hash,
    token_budget_mix_twophase,
)
from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_prefix_sum_matches_window(spark, sf_correct_dir):
    d = load_table(spark, sf_correct_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").alias("v"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    two = prefix_sum_by_hash(d, "source", "h", ["doc_id"], "v", "cum")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    one = d.withColumn("cum", F.sum("v").over(w))
    assert _rows(two.select("doc_id", "cum")) == _rows(
        one.select("doc_id", "cum")
    )


def test_budget_mix_twophase_matches_windowed_query(spark, sf_correct_dir):
    from sql_to_dbsp_compiler_spark.queries.vocab import (
        _BUDGET_DEFAULT,
        _BUDGETS,
    )

    budget = F.lit(_BUDGET_DEFAULT)
    for k, v in _BUDGETS.items():
        budget = F.when(F.col("source") == k, v).otherwise(budget)
    docs = load_table(spark, sf_correct_dir, "documents")
    two = token_budget_mix_twophase(docs, budget)
    one = REGISTRY["x_token_budget_mix"].fn(spark, sf_correct_dir)
    assert _rows(two) == _rows(one)


def test_prefix_sum_plan_shape(spark, sf_correct_dir):
    """The expensive window must be partitioned by (key, bucket) —
    bounded partitions — and the offset join must be a broadcast."""
    d = load_table(spark, sf_correct_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").alias("v"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    two = prefix_sum_by_hash(d, "source", "h", ["doc_id"], "v", "cum")
    plan = spark._jvm.PythonSQLUtils.explainString(
        two._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    # per-bucket window: partition spec mentions the bucket column
    assert "__bkt" in plan


def test_prefix_sum_property_hypothesis(spark):
    """Two-phase prefix sum == single-window running sum for random
    multisets with negative values, duplicate hash prefixes, and
    skewed keys (one key holding most rows)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_st = st.lists(
        st.tuples(
            st.integers(0, 50),            # id (tiebreaker, may repeat keys)
            st.sampled_from(["k", "k", "k", "m"]),  # skewed key
            st.integers(-5, 5),            # value incl. negatives
        ),
        min_size=1,
        max_size=20,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(data=rows_st)
    def check(data):
        data = [(i, k, v, idx) for idx, (i, k, v) in enumerate(data)]
        df = spark.createDataFrame(
            data, "id int, key string, v int, uniq int"
        ).select(
            "key", "v", "uniq",
            F.md5(F.concat_ws("-", "id", "uniq")).alias("h"),
        )
        two = prefix_sum_by_hash(df, "key", "h", ["uniq"], "v", "cum")
        w = Window.partitionBy("key").orderBy("h", "uniq")
        one = df.withColumn("cum", F.sum("v").over(w))
        assert _rows(two.select("uniq", "cum")) == _rows(
            one.select("uniq", "cum")
        )

    check()
