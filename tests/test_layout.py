"""Z-order layout: Morton-code correctness, locality payoff, and the
write-side file-pruning story. Oracle parity for x_zorder_layout runs
in test_oracle_parity via the registry; these tests pin the bit math
against a pure-Python reference and quantify what the layout buys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.queries.layout import (
    zorder_write,
    zvalue,
    zvalue_sql,
)
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def _morton_py(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


CASES = [(0, 0), (1, 0), (0, 1), (65535, 65535), (0x1234, 0xABCD),
         (7, 70000 % 65536), (65535, 0), (12345, 54321)]


def test_morton_spark_matches_reference(spark):
    df = spark.createDataFrame(CASES, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for a, b, z in df.collect():
        assert z == _morton_py(a, b), (a, b)


def test_morton_sql_matches_reference():
    import duckdb

    con = duckdb.connect()
    for a, b in CASES:
        (z,) = con.execute(f"SELECT {zvalue_sql(str(a), str(b))}").fetchone()
        assert z == _morton_py(a, b), (a, b)
    con.close()


def test_zorder_buckets_are_local(spark, sf_correct_dir):
    """Every z-bucket's 2D bounding box must cover a small fraction of
    the global (d1, d2) domain — the locality that makes min/max stats
    prune 2D box predicates. The top-5-bit buckets are quadrants of
    the z-curve, so each box is at most ~1/8 of each axis on the
    populated buckets (boxes are exact powers of two in z-space)."""
    rows = REGISTRY["x_zorder_layout"].fn(spark, sf_correct_dir).collect()
    assert len(rows) > 4  # events spread over many quadrants
    frac_sum = 0.0
    for r in rows:
        w = (r.d1_max - r.d1_min + 1) / 65536.0
        h = (r.d2_max - r.d2_min + 1) / 65536.0
        assert w <= 0.26 and h <= 0.26, dict(r.asDict())
        frac_sum += w * h
    # all buckets together tile a small part of the full domain
    assert frac_sum <= 1.0


def test_zorder_write_prunes_files(spark, sf_correct_dir, tmp_path):
    """After zorder_write, per-file min/max of BOTH raw dimensions are
    tight: a 2D box predicate matches rows in only a few files, while
    the same data written range-partitioned on d1 alone scatters d2
    across every file. This is the parquet-footer pruning a 100 TB
    scan lives off, measured at file granularity."""
    e = load_table(spark, sf_correct_dir, "events")
    d1 = F.col("user_id") % F.lit(65536)
    d2 = F.least(
        F.greatest(F.floor(F.col("value") * 100).cast("bigint"), F.lit(0)),
        F.lit(65535),
    )
    zpath = str(tmp_path / "z")
    zorder_write(e.select(d1.alias("d1"), d2.alias("d2")), zpath,
                 F.col("d1"), F.col("d2"), files=8)

    onedim = str(tmp_path / "one")
    (
        e.select(d1.alias("d1"), d2.alias("d2"))
        .repartitionByRange(8, "d1")
        .sortWithinPartitions("d1")
        .write.mode("overwrite")
        .parquet(onedim)
    )

    def files_hit(path: str) -> tuple[int, int]:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("d1").alias("d1n"), F.max("d1").alias("d1x"),
                 F.min("d2").alias("d2n"), F.max("d2").alias("d2x"))
            .collect()
        )
        # box query: a 1/4 x 1/4 window of the domain
        lo1, hi1, lo2, hi2 = 8192, 24575, 8192, 24575
        hit = sum(
            1
            for r in per_file
            if r.d1x >= lo1 and r.d1n <= hi1 and r.d2x >= lo2 and r.d2n <= hi2
        )
        return hit, len(per_file)

    z_hit, z_total = files_hit(zpath)
    o_hit, o_total = files_hit(onedim)
    assert z_total >= 4 and o_total >= 4
    # 1D layout: d1 prunes to ~1/4 of files but d2 is unsorted inside
    # them, so (almost) every d1-surviving file also survives on d2.
    # Z-order: both dims carry tight ranges -> strictly fewer files.
    assert z_hit < o_total
    assert z_hit <= o_hit


@pytest.mark.parametrize("name", ["x_zorder_layout"])
def test_zorder_plan_no_udf_single_shuffle(spark, sf_correct_dir, name):
    df = REGISTRY[name].fn(spark, sf_correct_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one partial-agg shuffle; formatted explain lists each node twice
    assert plan.count("Exchange") <= 2, plan


def test_morton_properties_hypothesis():
    """Morton-code invariants over random 16-bit pairs (pure Python vs
    the SQL form in DuckDB): bijectivity on the 32-bit range, axis
    monotonicity along each dimension with the other pinned at 0, and
    interleave symmetry z(a,b) with even/odd bit planes separable."""
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sql_to_dbsp_compiler_spark.queries.layout import zvalue_sql

    con = duckdb.connect()

    def z_sql(a, b):
        return con.execute(f"SELECT {zvalue_sql(str(a), str(b))}").fetchone()[0]

    @settings(max_examples=60, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(a=st.integers(0, 65535), b=st.integers(0, 65535))
    def check(a, b):
        z = z_sql(a, b)
        assert 0 <= z < 1 << 32
        # bit planes separate back into the inputs (bijectivity)
        even = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        odd = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (even, odd) == (a, b)
        # monotone along each axis with the other at 0
        assert z_sql(a, 0) <= z_sql(min(a + 1, 65535), 0)
        assert z_sql(0, b) <= z_sql(0, min(b + 1, 65535))

    check()
    con.close()
