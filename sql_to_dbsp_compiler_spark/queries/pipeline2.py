"""Session-6 pipeline extensions: RAG-style document chunking, a
TRAINED quality classifier (pyspark.ml logistic regression with the
persisted-weights oracle trick), and time-grid gap-filling with
last-observation-carried-forward — three ops a production curation /
feature pipeline runs that were not yet in the registry.

All three are fully oracle-gated. The classifier's score is computed
as a FIXED-ORDER multiply-add logit (no exp, no SUM-over-rows), so
IEEE-754 gives bit-identical doubles in Spark and DuckDB from the same
persisted float64 weights.

Names are `x_`-prefixed so they join the driver audit rotation without
displacing this round's never-checked window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table

# --------------------------------------------------------------------
# x_doc_chunking — overlapping sliding-window chunks with offsets
# --------------------------------------------------------------------

_CHUNK_SIZE = 400
_CHUNK_STRIDE = 300  # 100-char overlap between consecutive chunks


@query(
    "x_doc_chunking",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, text,
               unnest(generate_series(0, greatest(length(text) - 1, 0),
                                      {_CHUNK_STRIDE})) AS start
        FROM documents
    )
    SELECT doc_id,
           CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS chunk_start,
           md5(substring(text, CAST(start + 1 AS INTEGER), {_CHUNK_SIZE}))
               AS chunk_md5,
           CAST(length(substring(text, CAST(start + 1 AS INTEGER),
                                 {_CHUNK_SIZE})) AS BIGINT) AS chunk_len
    FROM s
    """,
    tags=("llm", "text", "chunking"),
)
def x_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking: each document is cut into overlapping
    character windows (size 400, stride 300) with byte offsets, the
    unit an embedding/retrieval pipeline indexes. Chunk boundaries are
    pure arithmetic on the text length (`sequence` → `explode` →
    `substring`), so the whole op is one narrow Generate inside
    whole-stage codegen — no shuffle at all; at 100 TB it pipelines
    with the parquet scan and any downstream embedding stage.
    chunk_idx is derived from the offset (start / stride), not from
    explode position, so the result is order-independent. The chunk
    text itself is emitted as md5 + length (the compare-friendly
    fingerprint; a real pipeline would keep the substring column)."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - F.lit(1), F.lit(0)),
        F.lit(_CHUNK_STRIDE),
    )
    chunk = F.expr(f"substring(text, start + 1, {_CHUNK_SIZE})")
    return (
        d.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.col("start").cast("bigint").alias("chunk_start"),
            F.md5(chunk).alias("chunk_md5"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
        )
    )


# --------------------------------------------------------------------
# x_quality_classifier — trained LR filter, persisted-weights oracle
# --------------------------------------------------------------------

_LR_WEIGHTS_PATH = "/root/repo/.artifacts/quality_lr_weights.parquet"

# Feature definitions shared (textually) with the proven text_quality
# oracle — both engines already hash-match these expressions.
_W = "list_filter(string_split(text, ' '), w -> w <> '')"
_STOP = "['the','a','of','and','to','in','is','value','row','table']"
_FEAT_SQL = {
    "n_words": f"CAST(len({_W}) AS DOUBLE)",
    "avg_word_len": f"(CAST(length(text) AS DOUBLE) - (len({_W}) - 1)) / len({_W})",
    "stopword_ratio": (
        f"CAST(len(list_filter({_W}, w -> list_contains({_STOP}, lower(w))))"
        f" AS DOUBLE) / len({_W})"
    ),
    "distinct_ratio": f"CAST(len(list_distinct({_W})) AS DOUBLE) / len({_W})",
}
_FEATURES = tuple(_FEAT_SQL)  # fixed order — the logit is order-sensitive


def _feature_cols() -> dict[str, F.Column]:
    ws = F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
    n_words = F.size(ws).cast("double")
    n_chars = F.length("text").cast("double")
    stop = F.array([F.lit(s) for s in
                    ("the", "a", "of", "and", "to", "in", "is", "value", "row", "table")])
    return {
        "n_words": n_words,
        "avg_word_len": (n_chars - (n_words - F.lit(1))) / n_words,
        "stopword_ratio": (
            F.size(F.filter(ws, lambda w: F.array_contains(stop, F.lower(w)))).cast("double")
            / n_words
        ),
        "distinct_ratio": F.size(F.array_distinct(ws)).cast("double") / n_words,
    }


def _weak_label() -> F.Column:
    """Gopher-flavored weak supervision: a doc is 'good' when it is
    long enough, has plausible word lengths, and contains stopwords —
    the standard bootstrap for a learned quality filter when no human
    labels exist (CCNet / fastText-classifier practice)."""
    return (
        (F.col("n_words") >= 30)
        & F.col("avg_word_len").between(3.0, 12.0)
        & (F.col("stopword_ratio") >= 0.05)
    ).cast("double")


_ORACLE_LOGIT = "(SELECT weight FROM w WHERE feature = '__intercept__')"
for _f in _FEATURES:
    _ORACLE_LOGIT = (
        f"({_ORACLE_LOGIT} + (SELECT weight FROM w WHERE feature = '{_f}')"
        f" * f.{_f})"
    )


@query(
    "x_quality_classifier",
    oracle=f"""
    WITH w AS (
        SELECT feature, weight
        FROM read_parquet('{_LR_WEIGHTS_PATH}/*.parquet')
    ),
    f AS (
        SELECT doc_id,
               {", ".join(f"{sql} AS {name}" for name, sql in _FEAT_SQL.items())}
        FROM documents
        WHERE len({_W}) > 0
    )
    SELECT doc_id, {_ORACLE_LOGIT} AS logit,
           {_ORACLE_LOGIT} > 0.0 AS keep
    FROM f
    """,
    tags=("llm", "text", "ml"),
)
def x_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter, the fastText-classifier analogue of the
    rule-based Gopher bank: logistic regression (distributed LBFGS via
    pyspark.ml) trained on weak labels over the quality features, then
    applied corpus-wide as a PURE COLUMN expression.

    Scale shape: training fits on a bounded hash-bucket sample (the
    quantizer-training pattern — cost is constant beyond the cap);
    scoring is a multiply-add over per-doc features with broadcast
    scalar weights — no shuffle, no UDF, whole-stage codegen.

    Oracle trick (same as ann_ivf_kmeans_topk's persisted centroids):
    the trained (feature, weight) table is persisted to parquet and
    BOTH engines compute the logit from the persisted float64 weights
    with the SAME fixed-order multiply-add chain — no exp(), no
    aggregation over terms — so the doubles are bit-identical. The
    fit itself stays engine-specific; separability of the weak rule
    is asserted in tests/test_quality_classifier.py."""
    d = load_table(spark, sf_dir, "documents")
    feats = _feature_cols()
    f_df = d.select(
        "doc_id", *(c.alias(n) for n, c in feats.items())
    ).where(F.col("n_words") > 0)

    # ---- train on a bounded deterministic sample, persist weights ----
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    sample = f_df.where(bucket < 80).withColumn("label", _weak_label())

    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=list(_FEATURES), outputCol="features")
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=25, regParam=0.01
    )
    model = lr.fit(asm.transform(sample))
    rows = [("__intercept__", float(model.intercept))] + [
        (name, float(w)) for name, w in zip(_FEATURES, model.coefficients)
    ]
    spark.createDataFrame(rows, "feature string, weight double").coalesce(
        1
    ).write.mode("overwrite").parquet(_LR_WEIGHTS_PATH)

    # ---- score from the persisted weights (what the oracle sees) ----
    wts = {
        r["feature"]: r["weight"]
        for r in spark.read.parquet(_LR_WEIGHTS_PATH).collect()
    }
    logit = F.lit(wts["__intercept__"])
    for name in _FEATURES:
        logit = logit + F.lit(wts[name]) * F.col(name)
    return f_df.select(
        "doc_id",
        logit.alias("logit"),
        (logit > F.lit(0.0)).alias("keep"),
    )


# --------------------------------------------------------------------
# x_gapfill_locf — time-grid densification + forward fill
# --------------------------------------------------------------------


@query(
    "x_gapfill_locf",
    oracle="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               max(value) AS obs_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    ),
    span AS (
        SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        FROM span
    ),
    j AS (
        SELECT g.user_id, g.bucket, o.obs_value
        FROM grid g LEFT JOIN obs o
          ON g.user_id = o.user_id AND g.bucket = o.bucket
    )
    SELECT user_id, bucket, obs_value IS NULL AS is_gap,
           last_value(obs_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf
    FROM j
    """,
    tags=("timeseries", "window"),
)
def x_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with last-observation-carried-forward: densify each
    user's event stream onto an hourly grid between their first and
    last observation, then forward-fill missing hours with
    `last(..., ignorenulls)` — the standard sensor/feature-store
    densification op (and the window-function face of the asof-join).

    Scale shape: the grid is generated per key with `sequence`
    (rows ∝ key-span, never a cross join against a global calendar),
    the fill is ONE window shuffle on user_id, and the grid join is an
    equi-join on (user_id, bucket). Nothing is quadratic; at 100 TB
    the grid generation pipelines with the per-key aggregate."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.max("value").alias("obs_value"))
    span = obs.groupBy("user_id").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    j = grid.join(obs, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "bucket",
        F.col("obs_value").isNull().alias("is_gap"),
        F.last("obs_value", ignorenulls=True).over(w).alias("value_locf"),
    )
