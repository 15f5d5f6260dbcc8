"""Tokenizer-training queries: BPE pair statistics (oracle-gated) and
iterative BPE merge learning (Python-replica-gated; see llm/bpe.py).

`x_bpe_pair_counts` is the first iteration of BPE as one SQL-shaped
pass — adjacent character pairs weighted by word frequency — and is
exactly reproducible in DuckDB, so it anchors the iterative learner's
starting state to the oracle. `x_bpe_learn` is the k-iteration loop
(genuinely not SQL-expressible; the driver records rows-only and the
exact gate lives in tests/test_bpe.py against a pure-Python replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.llm.bpe import learn_bpe, pair_counts, word_counts
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table

_TOPN = 20


@query(
    "x_bpe_pair_counts",
    oracle=f"""
    WITH w AS (
        SELECT word, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word <> '' GROUP BY word
    ), p AS (
        SELECT substring(word, i, 1) AS left_sym,
               substring(word, i + 1, 1) AS right_sym,
               n
        FROM w, unnest(generate_series(1, length(word) - 1)) AS t(i)
        WHERE length(word) >= 2
    )
    SELECT left_sym, right_sym, CAST(sum(n) AS BIGINT) AS pair_n
    FROM p GROUP BY left_sym, right_sym
    ORDER BY pair_n DESC, left_sym, right_sym LIMIT {_TOPN}
    """,
    tags=("llm", "tokenizer"),
)
def x_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} adjacent character pairs weighted by word frequency —
    BPE iteration zero. Two shuffles total (word groupBy, pair
    groupBy), both with map-side partial aggregation; the pair space
    is at most |charset|² so the second shuffle is tiny regardless of
    corpus size. Ordering is fully deterministic (count, then pair)."""
    d = load_table(spark, sf_dir, "documents")
    wc = word_counts(d)
    syms = F.filter(F.split(F.col("word"), ""), lambda s: s != "")
    pc = pair_counts(wc.select(syms.alias("syms"), "n"))
    return (
        pc.select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            F.col("n").cast("bigint").alias("pair_n"),
        )
        .orderBy(F.desc("pair_n"), "left_sym", "right_sym")
        .limit(_TOPN)
    )


@query("x_bpe_learn", oracle=None, tags=("llm", "tokenizer", "iterative"))
def x_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight learned BPE merges (merge_idx, left, right, pair_count).
    Iterative — each merge rewrites the vocabulary the next iteration
    counts, so there is no single-query oracle; tests/test_bpe.py pins
    the result against a pure-Python replica of the algorithm and
    x_bpe_pair_counts anchors iteration zero to DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(spark, d, num_merges=8)
    return spark.createDataFrame(
        merges, "merge_idx int, left string, right string, pair_count long"
    )
