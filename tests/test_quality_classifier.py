"""Behavioral tests for the trained quality classifier: the oracle
gate proves the scoring math matches DuckDB from the persisted
weights; these tests prove the TRAINING produced a model that actually
separates the weak supervision signal (held-out buckets), i.e. the op
is a working classifier and not just a reproducible formula."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.queries.pipeline2 import (
    _feature_cols,
    _weak_label,
)
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_classifier_separates_weak_labels_heldout(spark, sf_dir):
    scored = REGISTRY["x_quality_classifier"].fn(spark, sf_dir)

    d = load_table(spark, sf_dir, "documents")
    feats = _feature_cols()
    f_df = d.select("doc_id", *(c.alias(n) for n, c in feats.items())).where(
        F.col("n_words") > 0
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    heldout = f_df.where(bucket >= 80).withColumn("label", _weak_label())

    j = heldout.join(scored, "doc_id").select(
        (F.col("keep").cast("double") == F.col("label")).cast("long").alias("ok")
    )
    agg = j.agg(F.avg("ok").alias("acc"), F.count("*").alias("n")).collect()[0]
    assert agg["n"] > 50, "held-out split too small to mean anything"
    assert agg["acc"] >= 0.9, f"held-out accuracy {agg['acc']:.3f} < 0.9"


def test_classifier_emits_both_classes(spark, sf_dir):
    scored = REGISTRY["x_quality_classifier"].fn(spark, sf_dir)
    classes = scored.groupBy("keep").count().collect()
    assert len(classes) == 2, f"degenerate classifier: {classes}"


def test_keep_is_logit_sign(spark, sf_dir):
    scored = REGISTRY["x_quality_classifier"].fn(spark, sf_dir)
    bad = scored.where(F.col("keep") != (F.col("logit") > 0)).count()
    assert bad == 0
