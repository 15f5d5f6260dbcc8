"""Error bounds for sketch aggregates vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_approx_sketches_within_bounds(spark, sf_dir):
    approx = {r.l_returnflag: r for r in REGISTRY["approx_sketches"].fn(spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("median_price"),
        )
        .collect()
    }
    for flag, ex in exact.items():
        ap = approx[flag]
        assert abs(ap.approx_parts - ex.parts) / ex.parts < 0.1
        assert abs(ap.approx_median_price - ex.median_price) / ex.median_price < 0.05


def test_countmin_never_underestimates(spark, sf_dir):
    """The count-min guarantee: est >= true count for every probe
    (one-sided error), and the estimate is a deterministic function
    of the multiset (two runs agree exactly)."""
    rows1 = {r.word: r for r in REGISTRY["x_sketch_countmin"].fn(spark, sf_dir).collect()}
    rows2 = {r.word: r for r in REGISTRY["x_sketch_countmin"].fn(spark, sf_dir).collect()}
    assert rows1.keys() == rows2.keys() and len(rows1) == 8
    for w, r in rows1.items():
        assert r.cm_est >= r.true_count, f"{w}: CM underestimated"
        assert rows2[w].cm_est == r.cm_est, f"{w}: nondeterministic sketch"


def test_bloom_no_false_negatives(spark, sf_dir):
    """The Bloom guarantee: every true member passes the filter
    (false positives allowed, false negatives never)."""
    rows = REGISTRY["x_bloom_prune"].fn(spark, sf_dir).collect()
    assert rows, "empty bloom output"
    fn = [r.c_custkey for r in rows if r.is_member and not r.bloom_pass]
    assert not fn, f"Bloom false negatives: {fn[:5]}"
    # sanity: the filter actually prunes something (not all-pass)
    assert any(not r.bloom_pass for r in rows)
