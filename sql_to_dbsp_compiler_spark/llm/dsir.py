"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) as a fully declarative Spark plan.

Selects raw-corpus documents that look like a TARGET distribution:

1. hashed n-gram features: every token maps to one of ``n_buckets``
   via a 60-bit md5 hash (engine-agnostic, same family as
   llm/dedup.md5_hash60) — the paper's hashed bag-of-ngrams;
2. two bucket distributions with Laplace smoothing: the target slice
   vs the whole raw corpus;
3. per-document importance log-weight: position-ordered fold of
   ``ln p_target(bucket) − ln p_raw(bucket)`` over the document's
   tokens (ordered fold ⇒ bit-identical doubles in any engine);
4. Gumbel top-k resampling (Vieira 2014): sampling k docs without
   replacement ∝ softmax(log-weight) ≡ top-k of
   ``logweight + Gumbel(0,1)`` — the Gumbel noise is a deterministic
   hash of the doc id, so the draw is reproducible AND oracle-exact.

Scale shape (100 TB lens): tokenize once (posexplode, lazily
checkpointed — the token table feeds both distribution counts and the
scoring join); ONE aggregation by bucket computes both distributions
(count + count_if, map-side partial); the λ table is `n_buckets` rows
→ broadcast back onto tokens; one groupBy(doc) fold; the final top-k
is TakeOrderedAndProject (per-partition heaps + driver merge of k),
never a global sort.

Reference parity note: this is a training-data-pipeline extension
beyond the reference surface (the build brief's §2.5 class), not a
port of a reference operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.llm.dedup import md5_hash60
from sql_to_dbsp_compiler_spark.llm.text import words


def _ordered_fold_sum(arr_of_structs: Column, value_field: str) -> Column:
    """Left-to-right sum of ``value_field`` over an array of structs
    sorted by their leading field — the same sequential order as
    DuckDB's ``list_reduce(list(x ORDER BY pos), (a,b) -> a+b)``, so
    the non-associative double additions agree bit-for-bit."""
    return F.aggregate(
        F.transform(F.array_sort(arr_of_structs), lambda s: s[value_field]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dsir_logweights(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weights →
    ``(id_col, n_tokens, logweight)``."""
    tok = df.select(
        F.col(id_col),
        target_pred.alias("__is_target"),
        F.posexplode(words(F.col(text_col))).alias("pos", "word"),
    ).withColumn("bucket", md5_hash60(F.col("word")) % n_buckets)
    tok = tok.localCheckpoint(eager=False)
    # one shuffle computes BOTH distributions (raw = all tokens,
    # target = tokens of target docs)
    dist = tok.groupBy("bucket").agg(
        F.count("*").alias("cnt_raw"),
        F.count_if(F.col("__is_target")).alias("cnt_tgt"),
    )
    tot = dist.agg(
        F.sum("cnt_raw").alias("tot_raw"), F.sum("cnt_tgt").alias("tot_tgt")
    )
    lam = dist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log(
                (F.col("cnt_tgt") + F.lit(alpha))
                / (F.col("tot_tgt") + F.lit(alpha * n_buckets))
            )
            - F.log(
                (F.col("cnt_raw") + F.lit(alpha))
                / (F.col("tot_raw") + F.lit(alpha * n_buckets))
            )
        ).alias("lam"),
    )
    scored = tok.join(F.broadcast(lam), "bucket")
    doc = scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        _ordered_fold_sum(
            F.collect_list(F.struct("pos", "lam")), "lam"
        ).alias("logweight"),
    )
    return doc


def gumbel_key(id_col: Column, logweight: Column) -> Column:
    """Deterministic Gumbel perturbation: u derives from a 60-bit md5
    of the id (strictly inside (0,1)), g = −ln(−ln u). Top-k of
    ``logweight + g`` is a without-replacement draw ∝ exp(logweight)
    (the Gumbel-max trick), reproducible in any md5-capable engine.

    The key is ROUNDED to 9 dp: JVM Math.log and C libm log may
    disagree in the last ulp (~1e-16 relative — measured on the
    second log of this chain), so the raw doubles are not bit-portable
    across engines; 9 dp keeps far more resolution than the draw needs
    while collapsing the ulp noise. Ordering ties at 9 dp break on the
    id."""
    u = (md5_hash60(id_col.cast("string")) % F.lit(1_000_000_000) + 0.5) / 1.0e9
    return F.round(logweight - F.log(-F.log(u)), 9)


def dsir_resample(
    df: DataFrame,
    target_pred: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    alpha: float = 1.0,
) -> DataFrame:
    """Gumbel top-k DSIR draw → ``(id_col, n_tokens, logweight,
    gumbel_key)``, the k selected documents, deterministic."""
    doc = dsir_logweights(df, target_pred, id_col, text_col, n_buckets, alpha)
    keyed = doc.withColumn(
        "gumbel_key", gumbel_key(F.col(id_col), F.col("logweight"))
    )
    # TakeOrderedAndProject: per-partition top-k heaps, driver merges
    # k rows — no global sort/shuffle of the corpus
    return keyed.orderBy(F.desc("gumbel_key"), F.col(id_col)).limit(k)
