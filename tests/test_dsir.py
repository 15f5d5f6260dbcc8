"""DSIR importance resampling (llm/dsir.py): weight semantics, draw
determinism, and the scale-shape plan (broadcast λ, top-k without a
global sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.llm.dsir import dsir_logweights, dsir_resample
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_dsir_weights_favor_target_like_docs(spark, sf_dir):
    """Docs from the target slice must average a higher importance
    log-weight than the rest — the entire point of DSIR."""
    d = load_table(spark, sf_dir, "documents")
    w = dsir_logweights(d, F.col("lang") == "en").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    rows = w.groupBy(F.col("lang") == "en").agg(
        F.avg("logweight").alias("avg_lw")
    ).collect()
    avg = {r[0]: r["avg_lw"] for r in rows}
    assert avg[True] > avg[False]


def test_dsir_draw_deterministic_and_biased(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = dsir_resample(d, F.col("lang") == "en", k=50)
    b = dsir_resample(d, F.col("lang") == "en", k=50)
    ids_a = [r["doc_id"] for r in a.collect()]
    assert ids_a == [r["doc_id"] for r in b.collect()]  # same draw
    assert len(ids_a) == 50
    # the draw over-represents the target slice vs its corpus share
    share_corpus = d.where(F.col("lang") == "en").count() / d.count()
    sel = d.where(F.col("doc_id").isin(ids_a))
    share_draw = sel.where(F.col("lang") == "en").count() / 50
    assert share_draw > share_corpus


def test_dsir_plan_shape(spark, sf_dir):
    """λ is broadcast (n_buckets rows), the final k comes from
    TakeOrderedAndProject (per-partition heaps), never a global sort
    or a sort-merge join."""
    d = load_table(spark, sf_dir, "documents")
    df = dsir_resample(d, F.col("lang") == "en", k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
