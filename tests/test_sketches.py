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


def test_heavy_hitters_exact_on_adversarial_layout(spark):
    """Misra–Gries candidates + recount must equal the naive
    groupBy-filter on a skewed stream even when the heavy key is
    spread thin across partitions (each partition sees it just above
    the local bound) and k is tiny."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.operators.heavy_hitters import (
        heavy_hitters,
        misra_gries_candidates,
    )

    # 8 partitions; 'hot' appears 40x spread evenly, plus 960 distinct
    # cold keys — N=1000, k=16 → threshold floor(1000/16)+1 = 63? No:
    # hot(40) < 63, so raise hot to 100.
    rows = [("hot",)] * 100 + [(f"cold{i}",) for i in range(900)]
    df = spark.createDataFrame(rows, "word string").repartition(8)
    got = {(r["word"], r["cnt"]) for r in heavy_hitters(df, "word", k=16).collect()}
    n = df.count()
    want = {
        (r["word"], r["cnt"])
        for r in df.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= n // 16 + 1)
        .collect()
    }
    assert got == want and got == {("hot", 100)}

    # candidate phase: bounded output (≤ k per partition), superset
    cands = {r["word"] for r in misra_gries_candidates(df, "word", 16).collect()}
    assert "hot" in cands
    assert len(cands) <= 16 * 8

    # custom threshold path: exact counts for a lower bar too
    got2 = {
        (r["word"], r["cnt"])
        for r in heavy_hitters(df, "word", k=16, min_count=1).collect()
    }
    # with min_count=1 every CANDIDATE key is returned with its exact
    # count — spot-check the hot key's exactness
    assert ("hot", 100) in got2
