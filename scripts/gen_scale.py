"""Deterministic scale-up generator: replicate the sf0.1 tables 10x
(≈ sf1) into a target directory, preserving join semantics and
near-dup structure.

Key handling per table:
- Fact keys (orderkey/custkey/event_id/doc_id/vec_id) get a
  per-replica offset so replicas don't collide and joins stay 1:1
  with their scaled counterpart.
- Dimension tables (region/nation/supplier/part) are written once —
  dims grow sub-linearly at real scale, and lineitem's
  l_suppkey/l_partkey still resolve.
- documents.text is word-suffixed per replica so replicas are NOT
  near-duplicates of each other: dedup workloads scale by corpus
  size, not by an artificial 100x pair blow-up that no real corpus
  has.
- embeddings get a deterministic per-replica PERMUTATION of their
  components: a permutation is orthogonal, so within-replica cosines
  (and hence the near-dup pair structure per replica) are preserved
  EXACTLY, while cross-replica cosines become ~random. A 10x corpus
  then has ~10x near-dup pairs — the way a real corpus scales —
  instead of the quadratic cross-replica pair blow-up an additive
  perturbation produces (replicas v + i*noise all lie near a line).

Usage: python scripts/gen_scale.py [target_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.session import get_spark
from sql_to_dbsp_compiler_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10_000_000


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("gen_scale")
    spark.sparkContext.setLogLevel("ERROR")

    for dim in ("region", "nation", "supplier", "part"):
        load_table(spark, SRC, dim).write.mode("overwrite").parquet(
            os.path.join(target, f"{dim}.parquet")
        )

    def replicate(name: str, transform):
        base = load_table(spark, SRC, name)
        parts = [transform(base, i) for i in range(replicas)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(target, f"{name}.parquet"))

    def off(col, i):
        return (F.col(col) + F.lit(i * KEY_OFFSET)).alias(col)

    replicate(
        "customer",
        lambda df, i: df.select(
            off("c_custkey", i), *[c for c in df.columns if c != "c_custkey"]
        ),
    )
    replicate(
        "orders",
        lambda df, i: df.select(
            off("o_orderkey", i),
            off("o_custkey", i),
            *[c for c in df.columns if c not in ("o_orderkey", "o_custkey")],
        ),
    )
    replicate(
        "lineitem",
        lambda df, i: df.select(
            off("l_orderkey", i),
            *[c for c in df.columns if c != "l_orderkey"],
        ),
    )
    replicate(
        "events",
        lambda df, i: df.select(
            off("event_id", i),
            off("user_id", i),
            *[c for c in df.columns if c not in ("event_id", "user_id")],
        ),
    )
    replicate(
        "documents",
        lambda df, i: df.select(
            off("doc_id", i),
            F.when(F.lit(i) == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " ", -1),
                        lambda w: F.concat(w, F.lit(f"~{i}")),
                    ),
                )
            )
            .alias("text"),
            *[c for c in df.columns if c not in ("doc_id", "text")],
        ),
    )
    dim = len(
        load_table(spark, SRC, "embeddings").select("embedding").first()["embedding"]
    )
    # odd multipliers are coprime with a power-of-two dim → bijective
    perm_mult = [1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23]

    def permute(df, i):
        if i == 0:
            return df.select(
                off("vec_id", 0), *[c for c in df.columns if c != "vec_id"]
            )
        m, s = perm_mult[i % len(perm_mult)], (i * 29) % dim
        return df.select(
            off("vec_id", i),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda idx: F.element_at(
                    F.col("embedding"), ((idx * m + s) % dim) + 1
                ),
            ).alias("embedding"),
            *[c for c in df.columns if c not in ("vec_id", "embedding")],
        )

    replicate("embeddings", permute)
    print(f"wrote {target} at ~{0.1 * replicas:g}x TPC-H-ish scale")


if __name__ == "__main__":
    main()
