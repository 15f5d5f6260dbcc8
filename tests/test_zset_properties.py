"""Property-based Z-set algebra laws over random weighted multisets
(hypothesis). These are the identities DBSP's incremental evaluation
rests on; holding for arbitrary weights (incl. negatives) is what
makes delta-processing sound."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.plans.zset import ZSet

rows = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c"]), st.integers(-3, 3)),
    min_size=0,
    max_size=12,
)


def _z(spark, data):
    if not data:
        df = spark.createDataFrame([], schema="k int, v string, __weight long")
        return ZSet(df)
    df = spark.createDataFrame(
        [(k, v, w) for k, v, w in data], schema="k int, v string, __weight long"
    )
    return ZSet(df)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
@given(a=rows, b=rows)
def test_addition_commutes(spark, a, b):
    za, zb = _z(spark, a), _z(spark, b)
    assert za.add(zb).rows() == zb.add(za).rows()


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=rows)
def test_neg_is_additive_inverse(spark, a):
    za = _z(spark, a)
    assert za.add(za.neg()).consolidate().rows() == []


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
@given(a=rows, b=rows)
def test_filter_is_linear(spark, a, b):
    za, zb = _z(spark, a), _z(spark, b)
    cond = F.col("k") % 2 == 0
    lhs = za.add(zb).filter(cond)
    rhs = za.filter(cond).add(zb.filter(cond))
    assert lhs.rows() == rhs.rows()


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=rows)
def test_distinct_idempotent(spark, a):
    za = _z(spark, a)
    assert za.distinct().rows() == za.distinct().distinct().rows()
