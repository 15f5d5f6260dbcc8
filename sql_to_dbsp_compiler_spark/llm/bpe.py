"""Byte-pair-encoding vocabulary learning on Spark.

The tokenizer-training half of a data pipeline: learn the top-k BPE
merges from a corpus. Iterative by nature (each merge changes the
next iteration's pair statistics), so it cannot be a single SQL
query — the Spark shape is the map-reduce BPE formulation:

  1. word vocabulary: one groupBy over the corpus (words with counts
     — at 100 TB this is the only pass over the full data; every
     iteration after it runs on the distinct-word table, which is
     orders of magnitude smaller and hash-partitioned by word).
  2. per iteration: count adjacent symbol pairs weighted by word
     frequency (explode + groupBy, map-side partial agg), take the
     argmax pair (a one-row collect — the scalar the driver must see
     to steer the next iteration, same pattern as Lloyd k-means), and
     rewrite the symbol arrays with the merged token (Arrow-batched
     pandas UDF; lineage truncated with localCheckpoint so iteration
     N+1 does not recompute iterations 1..N).

Greedy left-to-right non-overlapping merge application — the standard
BPE definition (Sennrich et al. 2016), reproduced exactly by the
pure-Python reference in tests/test_bpe.py.

Determinism: the argmax tiebreak is (count DESC, left ASC, right
ASC); no floats anywhere. Not SQL-oracle-expressible (iterative);
gated by an exact pure-Python replica at sf0.001 plus property tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, n) — whitespace tokenization, the single full-corpus
    pass. Everything after runs on this far smaller table."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _to_symbols(col):
    # split('') yields one element per character (no empties in Spark 4,
    # but filter defensively so the invariant is explicit)
    return F.filter(F.split(col, ""), lambda s: s != "")


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, n) — adjacent symbol pairs over the current
    symbol arrays, weighted by word frequency."""
    pairs = vocab.select(
        "n",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right")).agg(
        F.sum("n").alias("n")
    )


def _merge_udf(left: str, right: str):
    merged = left + right

    @pandas_udf(ArrayType(StringType()))
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(arr):
            out, i, n = [], 0, len(arr)
            while i < n:
                if i + 1 < n and arr[i] == left and arr[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(arr[i])
                    i += 1
            return out

        return syms.map(one)

    return apply_merge


def learn_bpe(
    spark: SparkSession, docs: DataFrame, num_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Learn `num_merges` BPE merges; returns
    [(merge_idx, left, right, pair_count), ...]."""
    vocab = word_counts(docs).select(
        _to_symbols(F.col("word")).alias("syms"), "n"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for i in range(num_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0].left, top[0].right, int(top[0].n)
        merges.append((i, left, right, n))
        vocab = vocab.select(
            _merge_udf(left, right)(F.col("syms")).alias("syms"), "n"
        ).localCheckpoint(eager=True)
    return merges


def learn_bpe_py(texts: list[str], num_merges: int = 8):
    """Pure-Python reference replica (the local oracle)."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split(" ") if w != "")
    vocab = {w: list(w) for w in wc}
    merges = []
    for i in range(num_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (left, right), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((i, left, right, n))
        for w, syms in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    out.append(left + right)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            vocab[w] = out
    return merges
