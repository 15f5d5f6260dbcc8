"""Exact distributed heavy hitters: Misra–Gries candidates + recount.

The scalable alternative to ``groupBy(key).count()`` when the key
domain is huge (billions of distinct tokens/URLs at 100 TB): a plain
group-by shuffles EVERY distinct key; this operator shuffles only the
candidate set.

Phase 1 (map-side, bounded memory): each partition folds its Arrow
batches into a Misra–Gries summary with ``k`` counters using the
MERGE rule (add counts; when over k survivors, subtract the (k+1)-th
largest count from all and drop non-positives — Agarwal et al.,
"Mergeable Summaries", PODS'12). A merged MG summary undercounts any
item by at most N_p/(k+1), so every item with partition frequency
> N_p/(k+1) survives; by the averaging argument any item with GLOBAL
frequency > N/(k+1) must exceed that bound in at least one partition
(N = ΣN_p) — so the union of per-partition candidates is a SUPERSET
of every item with global frequency ≥ N/k. At most ``k`` candidates
per partition flow out.

Phase 2 (exact): semi-join the input against the broadcast candidate
set and count exactly, then filter by the caller's threshold. Counts
are exact, the result provably complete for thresholds ≥ N/k.

Misra & Gries, "Finding repeated elements" (1982); the distributed
candidates+recount composition is the standard exact variant (e.g.
MAD-lib / Algebird parlance: "topK with exact recount").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries, unioned: ≤ k candidate
    keys per partition, Arrow-batched (mapInPandas holds exactly one
    dict of ≤ k counters per partition — constant memory regardless
    of partition size)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # each batch is itself an exact summary; MERGE it in
            for v, c in pdf[key_col].dropna().value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                d = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - d for v, c in counters.items() if c > d}
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(
        summarize, schema=df.select(key_col).schema
    )


def heavy_hitters(
    df: DataFrame, key_col: str, k: int, min_count: int | Column | None = None
) -> DataFrame:
    """All keys with exact count ≥ ``min_count`` (default: N/k,
    the largest threshold the candidate phase is provably complete
    for). Returns (key, cnt), exact."""
    cands = misra_gries_candidates(df, key_col, k).distinct()
    counted = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count is None:
        n = df.where(F.col(key_col).isNotNull()).count()
        min_count = F.lit((n // k) + 1)
    elif isinstance(min_count, int):
        min_count = F.lit(min_count)
    return counted.where(F.col("cnt") >= min_count)
