"""Replica of the driver's t2 gate: every oracle-bearing registry
query must match DuckDB exactly at sf0.01 — the SAME scale the driver
uses. (It used to run at sf0.001, which let a filter-threshold
mismatch in union_all slip through because no supplier row fell in
the divergent band at that scale; use -k to spot-check one query.)"""

from __future__ import annotations

import pytest

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.testing import (
    compare_frames,
    driver_canonicalize,
    run_oracle,
)

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)

# Queries allowed to return 0 rows at small SF: either the empty
# result IS the point, or the scale legitimately starves a selective
# multi-way filter. Everything else returning 0 rows means the
# filters match nothing — a vacuous test (this caught filters on
# real-world nation names that don't exist in the synthetic NATION_k
# data).
EMPTY_OK_AT_TINY_SF = {
    "groupby_empty_input",
    "array_agg_op",
    "intersect_op",
    "tpch_q7_volume",
    "tpch_q11_important_stock",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers",
}


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_correct_dir, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_correct_dir).toPandas()
    oracle_pdf = run_oracle(q.oracle, sf_correct_dir)
    # The driver's canonicalizer (raw sort_values + cell hashing)
    # chokes on bare array/map/struct output columns — any oracled
    # query emitting one reds out at the driver even when the values
    # match (r5 x_agg_boolean_set). Fail locally first.
    try:
        driver_canonicalize(spark_pdf)
    except TypeError as exc:
        raise AssertionError(
            f"{name}: output is not driver-canonicalizable "
            f"(bare array/map/struct column?): {exc}"
        ) from None
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}:\n" + "\n".join(problems)
    if name not in EMPTY_OK_AT_TINY_SF:
        assert len(spark_pdf) > 0, f"{name}: matched the oracle but on 0 rows (vacuous)"


@pytest.mark.parametrize("name", sorted(set(REGISTRY) - set(ORACLE_QUERIES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
