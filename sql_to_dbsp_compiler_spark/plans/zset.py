"""Z-set (weighted multiset) algebra — DBSP's change-stream data model
expressed over DataFrames.

The reference evaluates every view over Z-sets: a relation is a
mapping row → integer weight, inserts are +1, deletes are -1, and the
incremental operators are defined by how they commute with weighted
addition (reference: circuit/operator/DBSPNegateOperator.java,
DBSPSumOperator.java, DBSPDifferentialOperator.java,
DBSPIntegralOperator.java, DBSPDistinctOperator.java; the lib/ Rust
runtime calls this a ZSet).

Here a Z-set is a DataFrame with a `__weight` long column. Linear
operators (map/filter/flatmap/±/join) are plain DataFrame ops on the
payload columns with weight bookkeeping — they never consolidate, so
chains stay shuffle-free until a `consolidate()`/`distinct()` forces
a groupBy. That mirrors DBSP's laziness and is exactly the plan shape
you want at scale: one consolidation shuffle at the end instead of
one per operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEIGHT = "__weight"


@dataclass(frozen=True)
class ZSet:
    df: DataFrame  # payload columns + WEIGHT column

    # ---- constructors -------------------------------------------------
    @staticmethod
    def from_df(df: DataFrame, weight: int = 1) -> "ZSet":
        return ZSet(df.withColumn(WEIGHT, F.lit(weight).cast("long")))

    # ---- linear operators (no consolidation, no shuffle) --------------
    def neg(self) -> "ZSet":
        """DBSPNegateOperator: w → -w."""
        return ZSet(self.df.withColumn(WEIGHT, -F.col(WEIGHT)))

    def add(self, other: "ZSet") -> "ZSet":
        """DBSPSumOperator: Z-set addition = unionAll of weighted rows."""
        return ZSet(self.df.unionByName(other.df))

    def subtract(self, other: "ZSet") -> "ZSet":
        """DBSPSubtractOperator: a + (-b)."""
        return self.add(other.neg())

    def map(self, *cols: Column) -> "ZSet":
        """DBSPMapOperator on payload columns (weight preserved)."""
        return ZSet(self.df.select(*cols, F.col(WEIGHT)))

    def filter(self, cond: Column) -> "ZSet":
        """DBSPFilterOperator."""
        return ZSet(self.df.where(cond))

    def flat_map(self, col: Column, alias: str) -> "ZSet":
        """DBSPFlatMapOperator: explode an array payload column."""
        payload = [c for c in self.df.columns if c != WEIGHT]
        return ZSet(self.df.select(*payload, F.explode(col).alias(alias), F.col(WEIGHT)))

    def flat_map_ordinal(self, col: Column, alias: str, ord_alias: str) -> "ZSet":
        """DBSPFlatMapOperator for UNNEST WITH ORDINALITY: explode an
        array payload column keeping the 1-based element index
        (reference doc/sql/array.rst; still linear — each output row
        inherits its source weight)."""
        payload = [c for c in self.df.columns if c != WEIGHT]
        return ZSet(
            self.df.select(
                *payload, F.posexplode(col).alias("__pos", alias), F.col(WEIGHT)
            )
            .withColumn(ord_alias, (F.col("__pos") + 1).cast("bigint"))
            .select(*payload, alias, ord_alias, WEIGHT)
        )

    def join(self, other: "ZSet", on: Column) -> "ZSet":
        """DBSPJoinOperator: weights multiply (bilinear)."""
        a = self.df.withColumnRenamed(WEIGHT, "__wa")
        b = other.df.withColumnRenamed(WEIGHT, "__wb")
        joined = a.join(b, on)
        return ZSet(
            joined.withColumn(WEIGHT, F.col("__wa") * F.col("__wb")).drop("__wa", "__wb")
        )

    # ---- nonlinear operators (consolidating: one shuffle) -------------
    def consolidate(self) -> "ZSet":
        """Canonical form: merge equal rows, drop zero weights."""
        payload = [c for c in self.df.columns if c != WEIGHT]
        return ZSet(
            self.df.groupBy(*payload)
            .agg(F.sum(WEIGHT).alias(WEIGHT))
            .where(F.col(WEIGHT) != 0)
        )

    def distinct(self) -> "ZSet":
        """DBSPDistinctOperator: rows with positive weight, at weight 1
        (DBSP's set-semantics projection)."""
        payload = [c for c in self.df.columns if c != WEIGHT]
        return ZSet(
            self.df.groupBy(*payload)
            .agg(F.sum(WEIGHT).alias(WEIGHT))
            .where(F.col(WEIGHT) > 0)
            .withColumn(WEIGHT, F.lit(1).cast("long"))
        )

    def aggregate_linear(self, keys: list[str], value: Column, alias: str) -> "ZSet":
        """Weighted linear aggregate: SUM(value·w) per key — DBSP's
        incremental aggregate for linear functions (SUM/COUNT): feeding
        deltas in yields the delta of the aggregate out."""
        return ZSet(
            self.df.groupBy(*keys)
            .agg(F.sum(value * F.col(WEIGHT)).alias(alias))
            .withColumn(WEIGHT, F.lit(1).cast("long"))
        )

    # ---- materialization ----------------------------------------------
    def to_multiset_df(self) -> DataFrame:
        """Expand weights back to row multiplicity (weights must be
        >= 0; only sensible for small results/tests)."""
        payload = [c for c in self.df.columns if c != WEIGHT]
        z = self.consolidate().df
        return z.select(
            *payload, F.explode(F.sequence(F.lit(1), F.col(WEIGHT))).alias("__i")
        ).drop("__i")

    def rows(self) -> list[tuple]:
        z = self.consolidate().df
        cols = sorted(z.columns)
        return sorted(tuple(r[c] for c in cols) for r in z.collect())


def incremental_join(a_prev: ZSet, da: ZSet, b_prev: ZSet, db: ZSet, on: Column) -> ZSet:
    """DBSPIncrementalJoinOperator: the bilinear delta rule
    Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB, where A/B are the integrated
    states BEFORE this step. Each term is an ordinary weighted join;
    at scale A and B would be maintained as bucketed/indexed state so
    each per-step term shuffles only the (small) delta side."""
    return da.join(b_prev, on).add(a_prev.join(db, on)).add(da.join(db, on))


# ---- stream-of-snapshots operators ------------------------------------
def differentiate(snapshots: list[DataFrame]) -> list[ZSet]:
    """DBSPDifferentialOperator over a stream of snapshots:
    D(s)_t = s_t - s_{t-1} as Z-sets (s_{-1} = empty)."""
    out: list[ZSet] = []
    prev: ZSet | None = None
    for snap in snapshots:
        cur = ZSet.from_df(snap)
        out.append(cur if prev is None else cur.subtract(prev).consolidate())
        prev = cur
    return out


def integrate(deltas: list[ZSet]) -> list[ZSet]:
    """DBSPIntegralOperator: I(d)_t = Σ_{i<=t} d_i."""
    out: list[ZSet] = []
    acc: ZSet | None = None
    for d in deltas:
        acc = d if acc is None else acc.add(d)
        out.append(acc.consolidate())
    return out
