"""Incremental view-maintenance operators: per-step cost ∝ |delta|.

These are the DBSP *optimized incremental* operators (reference:
circuit/operator/DBSPIncrementalAggregateOperator.java,
DBSPIncrementalJoinOperator.java, DBSPIncrementalDistinctOperator.java;
the reference's OptimizedIncrementalTests pin their behavior against
naive D∘Q∘I recomputation). Each operator holds integrated state as
DataFrames and exposes ``step(delta) -> delta``:

- :class:`IncrementalFilterMap` — linear (stateless): the delta of a
  select/filter is the select/filter of the delta.
- :class:`IncrementalLinearAgg` — SUM/COUNT/AVG group-bys: aggregate
  the (small) delta, equi-join it with per-key state, emit
  retraction+insertion rows for affected keys only. At scale the
  state join shuffles |delta| keys against bucketed state — never
  rescans the input.
- :class:`IncrementalJoin` — bilinear rule Δ(A⋈B) = ΔA⋈B + A⋈ΔB +
  ΔA⋈ΔB; state sides would be bucketed on the join key at scale so
  each term shuffles only the delta side.

State lineage is truncated with ``localCheckpoint`` every few steps
(plans grow per step otherwise — same device as IncrementalProgram).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .zset import WEIGHT, ZSet, incremental_join


def _join_on_keys(df: DataFrame, keys: list[str], touched: DataFrame, how: str) -> DataFrame:
    """Null-safe leftsemi/left_anti of ``df`` against the key rows in
    ``touched``. SQL GROUP BY / PARTITION BY place NULL keys in one
    group, but name-list joins use null-unsafe ``=`` — a NULL-keyed
    state row would never be recomputed into new_rows nor retracted
    from the stored output, silently diverging from the batch query."""
    t = touched.select(*[F.col(k).alias(f"__t{i}") for i, k in enumerate(keys)])
    cond = None
    for i, k in enumerate(keys):
        eq = df[k].eqNullSafe(t[f"__t{i}"])
        cond = eq if cond is None else cond & eq
    return df.join(t, cond, how)


class IncrementalFilterMap:
    """Linear view: SELECT <exprs> WHERE <cond> over one input.

    Linear operators commute with Z-set addition, so the output delta
    is just the operator applied to the input delta — no state."""

    def __init__(self, cols: list[Column] | None, cond: Column | None):
        self.cols = cols
        self.cond = cond

    def step(self, delta: ZSet) -> ZSet:
        z = delta
        if self.cond is not None:
            z = z.filter(self.cond)
        if self.cols is not None:
            z = z.map(*self.cols)
        return z


@dataclass(frozen=True)
class AggSpec:
    """One output aggregate column: kind ∈ {sum, count, avg};
    expr is the aggregated expression (None for COUNT(*))."""

    alias: str
    kind: str
    expr: Column | None = None


class IncrementalLinearAgg:
    """GROUP BY keys with linear aggregates (SUM / COUNT / AVG).

    State: one row per live key holding Σ(expr·w) per SUM/AVG spec and
    Σw (+ per-column non-null counts for COUNT(col)/AVG). A step:

    1. aggregate the delta (map-side combine, |delta| rows in),
    2. full-outer equi-join delta-agg with state on the keys,
    3. output = retract old finished row (w=-1) + insert new finished
       row (w=+1) for touched keys; groups appear/disappear with
       Σw > 0,
    4. state += delta-agg.

    Step cost is |delta| + |touched keys| — independent of the
    integrated input size, which is the entire point of DBSP."""

    def __init__(
        self,
        keys: list[str],
        specs: list[AggSpec],
        cond: Column | None = None,
        checkpoint_every: int = 8,
    ):
        if not specs:
            raise ValueError("need at least one aggregate")
        self.keys = keys
        self.specs = specs
        self.cond = cond
        self._state: DataFrame | None = None  # keys + __cnt + per-spec sums
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    # -- internal helpers -------------------------------------------------
    def _delta_agg(self, delta: ZSet) -> DataFrame:
        z = delta if self.cond is None else delta.filter(self.cond)
        w = F.col(WEIGHT)
        aggs = [F.sum(w).alias("__cnt")]
        for i, s in enumerate(self.specs):
            if s.kind == "count" and s.expr is None:
                continue  # COUNT(*) reuses __cnt
            if s.kind == "count":
                aggs.append(F.sum(F.when(s.expr.isNotNull(), w).otherwise(F.lit(0))).alias(f"__c{i}"))
            else:  # sum / avg: Σ(expr·w) + non-null count (the count
                # distinguishes "no non-null values yet" → SQL NULL sum
                # from a genuine zero sum)
                aggs.append(F.sum(s.expr * w).alias(f"__s{i}"))
                aggs.append(
                    F.sum(F.when(s.expr.isNotNull(), w).otherwise(F.lit(0))).alias(f"__c{i}")
                )
        return z.df.groupBy(*self.keys).agg(*aggs)

    def _finish(self, prefix: str) -> list[Column]:
        """Finished output columns from state columns named
        {prefix}__cnt / {prefix}__s{i} / {prefix}__c{i}."""
        cols = []
        for i, s in enumerate(self.specs):
            if s.kind == "count" and s.expr is None:
                cols.append(F.col(f"{prefix}__cnt").alias(s.alias))
            elif s.kind == "count":
                cols.append(F.col(f"{prefix}__c{i}").alias(s.alias))
            elif s.kind == "sum":
                # SQL SUM over a group with only NULLs is NULL; with our
                # Σ(expr·w) NULLs contribute NULL→sum skips them, but an
                # all-NULL group yields NULL already. Weighted sum of
                # nothing is NULL too — matches.
                cols.append(F.col(f"{prefix}__s{i}").alias(s.alias))
            else:  # avg: NULL when no non-null values (guarded — ANSI
                # mode raises on the 0-divisor branch otherwise)
                cols.append(
                    F.when(
                        F.col(f"{prefix}__c{i}") > 0,
                        F.col(f"{prefix}__s{i}") / F.col(f"{prefix}__c{i}"),
                    ).alias(s.alias)
                )
        return cols

    # -- the operator ------------------------------------------------------
    def step(self, delta: ZSet) -> ZSet:
        d = self._delta_agg(delta)
        state_cols = [c for c in d.columns if c not in self.keys]

        if self._state is None:
            # Even a pure-insert delta can need the NULL fix: non-null
            # contributions may cancel (e.g. +x then -x) leaving Σ=0
            # with non-null count 0, which SQL-wise is a NULL sum.
            for i, s in enumerate(self.specs):
                if s.kind in ("sum", "avg"):
                    d = d.withColumn(
                        f"__s{i}",
                        F.when(F.col(f"__c{i}") == 0, F.lit(None)).otherwise(F.col(f"__s{i}")),
                    )
            new_state = d.where(F.col("__cnt") != 0)
            out_new = new_state.where(F.col("__cnt") > 0).select(
                *self.keys, *self._finish(""), F.lit(1).cast("long").alias(WEIGHT)
            )
            self._state = new_state
            self._bump()
            return ZSet(out_new)

        st = self._state
        sd = st.select(
            *[F.col(k).alias(f"__k{j}") for j, k in enumerate(self.keys)],
            *[F.col(c).alias(f"o{c}") for c in state_cols],
        )
        key_eq = None
        for j, k in enumerate(self.keys):
            eq = d[k].eqNullSafe(F.col(f"__k{j}"))
            key_eq = eq if key_eq is None else (key_eq & eq)
        joined = d.join(sd, key_eq, "full_outer")
        # coalesce keys (either side may be absent)
        keysel = [
            F.coalesce(d[k], F.col(f"__k{j}")).alias(k) for j, k in enumerate(self.keys)
        ]
        merged = joined.select(
            *keysel,
            d["__cnt"].isNotNull().alias("__touched"),
            *[F.col(f"o{c}").alias(f"old{c}") for c in state_cols],
            *[
                (
                    F.coalesce(F.col(f"o{c}"), F.lit(0))
                    + F.coalesce(d[c], F.lit(0))
                ).alias(f"new{c}")
                # NB: for __s{i} sums NULL means "no non-null contributions
                # yet"; adding with coalesce(…,0) would turn NULL+NULL into
                # 0. Handled below by nulling sums when count is 0.
                for c in state_cols
            ],
        )
        # where a group's non-null count is 0, its sum must be NULL (SQL)
        fixes = {}
        for i, s in enumerate(self.specs):
            if s.kind in ("sum", "avg"):
                fixes[f"new__s{i}"] = F.when(F.col(f"new__c{i}") == 0, F.lit(None)).otherwise(
                    F.col(f"new__s{i}")
                )
        for c, expr in fixes.items():
            merged = merged.withColumn(c, expr)
        merged = merged.localCheckpoint(eager=False)

        retract = merged.where(F.col("__touched") & (F.col("old__cnt") > 0)).select(
            *self.keys, *self._finish("old"), F.lit(-1).cast("long").alias(WEIGHT)
        )
        insert = merged.where(F.col("__touched") & (F.col("new__cnt") > 0)).select(
            *self.keys, *self._finish("new"), F.lit(1).cast("long").alias(WEIGHT)
        )

        self._state = merged.where(F.col("new__cnt") != 0).select(
            *self.keys, *[F.col(f"new{c}").alias(c) for c in state_cols]
        )
        self._bump()
        return ZSet(retract.unionByName(insert)).consolidate()

    def _bump(self) -> None:
        self._steps += 1
        if self._steps % self._checkpoint_every == 0 and self._state is not None:
            self._state = self._state.localCheckpoint(eager=False)

    def snapshot(self) -> DataFrame:
        if self._state is None:
            raise ValueError("no steps applied")
        return self._state.where(F.col("__cnt") > 0).select(*self.keys, *self._finish(""))


class IncrementalJoin:
    """Two-input equi-join maintained by the bilinear delta rule;
    output payload is an arbitrary projection of the joined row."""

    def __init__(self, on: Column, project: list[Column] | None = None, checkpoint_every: int = 8):
        self.on = on
        self.project = project
        self._a: ZSet | None = None
        self._b: ZSet | None = None
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def step(self, da: ZSet, db: ZSet) -> ZSet:
        if self._a is None:
            out = da.join(db, self.on)
            self._a, self._b = da.consolidate(), db.consolidate()
        else:
            out = incremental_join(self._a, da, self._b, db, self.on)
            self._a = self._a.add(da).consolidate()
            self._b = self._b.add(db).consolidate()
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._a = ZSet(self._a.df.localCheckpoint(eager=False))
            self._b = ZSet(self._b.df.localCheckpoint(eager=False))
        if self.project is not None:
            out = out.map(*self.project)
        return out.consolidate()


class IncrementalSemiAnti:
    """Decorrelated [NOT] EXISTS / IN-subquery: ``A ⋉ D`` (semi) or
    ``A ▷ D`` (anti) where ``D = distinct(π_keys σ B)`` is a maintained
    distinct key set (reference: CalciteToDBSPCompiler.java:213
    ``visitCorrelate`` — correlated subqueries decorrelate to
    join-shaped circuits; the semi join is bilinear in (A, D) so the
    standard delta rule applies, and anti is the linear difference
    ``ΔA − Δsemi``).

    ``step`` takes the A-side delta (full payload) and the B-side
    *key* delta (columns named ``__k0..__kn``, raw multiplicities —
    the distinct is maintained internally). NULL keys never match the
    plain-equality join, which is exactly SQL's ``=`` correlation
    semantics: a NULL correlation value makes EXISTS false (excluded
    from semi, included in anti). Per-step cost ∝ |ΔA| + |ΔD|; at
    scale both states are bucketed on the key so each delta term is a
    bucket-local equi-join.
    """

    def __init__(self, keys_a: list[str], anti: bool = False, checkpoint_every: int = 8):
        self.keys_a = list(keys_a)
        self.anti = anti
        self._dist = IncrementalDistinct(checkpoint_every=checkpoint_every)
        self._a: ZSet | None = None  # integrated A (post outer filter)
        self._d: ZSet | None = None  # integrated distinct key set
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def step(self, da: ZSet, dkeys: ZSet) -> ZSet:
        dd = self._dist.step(dkeys.consolidate())
        d_new = dd if self._d is None else self._d.add(dd).consolidate()
        on = None
        for i, k in enumerate(self.keys_a):
            eq = F.col(k) == F.col(f"__k{i}")
            on = eq if on is None else (on & eq)
        payload = [c for c in da.df.columns if c != WEIGHT]
        # Δ(A⋉D) = ΔA⋈D_old + A_old⋈ΔD + ΔA⋈ΔD = ΔA⋈D_new + A_old⋈ΔD
        dsemi = da.join(d_new, on)
        if self._a is not None:
            dsemi = dsemi.add(self._a.join(dd, on))
        dsemi = dsemi.map(*[F.col(c) for c in payload]).consolidate()
        self._a = da.consolidate() if self._a is None else self._a.add(da).consolidate()
        self._d = d_new
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._a = ZSet(self._a.df.localCheckpoint(eager=False))
            self._d = ZSet(self._d.df.localCheckpoint(eager=False))
        if self.anti:
            return da.subtract(dsemi).consolidate()
        return dsemi


class IncrementalRangeSemiAnti:
    """Decorrelated [NOT] EXISTS whose correlation carries a NON-EQUI
    residual — ``EXISTS (SELECT 1 FROM B WHERE B.k = A.k AND
    B.ts < A.ts [AND resid])`` (reference:
    CalciteToDBSPCompiler.java:213 ``visitCorrelate`` decorrelates
    these to join-shaped circuits with a residual condition).

    Existence under a residual predicate is NOT bilinear in (A, B):
    retracting a B row flips an outer row's EXISTS only when no OTHER
    key-mate satisfies the predicate, so IncrementalSemiAnti's
    delta-rule semi-join does not apply. Maintained instead by
    *touched-key recompute* (the IncrementalKeyedNotIn pattern): keep
    integrated A, integrated B (correlation keys + the predicate's B
    columns), and the stored output; a step re-evaluates the
    predicate join only for correlation keys present in either delta
    and diffs against the stored rows of those keys.

    ``step`` takes the A delta (full payload) and the B delta
    projected to ``__k0..__kn`` + ``__b_<col>`` predicate columns.
    ``pred`` is a SQL boolean over A's natural column names and the
    ``__b_``-prefixed B columns. Equality on the keys is null-unsafe
    ``=`` (SQL correlation semantics: NULL keys make EXISTS false —
    excluded from semi, included in anti). Per-step cost ∝
    Σ size(touched key groups) on both sides; at scale all three
    states are bucketed on the correlation key, so the recompute is a
    bucket-local join."""

    def __init__(
        self,
        keys_a: list[str],
        pred: str,
        anti: bool = False,
        checkpoint_every: int = 8,
    ):
        self.keys_a = list(keys_a)
        self.pred = pred
        self.anti = anti
        self._a: ZSet | None = None
        self._b: ZSet | None = None  # (__k.., __b_..) pairs, weighted
        self._out: DataFrame | None = None
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def step(self, da: ZSet, db: ZSet) -> ZSet:
        da = da.consolidate()
        db = db.consolidate()
        n = len(self.keys_a)
        touched = (
            da.df.select(*[F.col(k) for k in self.keys_a])
            .unionByName(
                db.df.select(
                    *[F.col(f"__k{i}").alias(k) for i, k in enumerate(self.keys_a)]
                )
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        self._a = da if self._a is None else self._a.add(da).consolidate()
        self._b = db if self._b is None else self._b.add(db).consolidate()

        a_t = _join_on_keys(self._a.df, self.keys_a, touched, "leftsemi")
        b_t = _join_on_keys(
            self._b.df,
            [f"__k{i}" for i in range(n)],
            touched.select(
                *[F.col(k).alias(f"__k{i}") for i, k in enumerate(self.keys_a)]
            ),
            "leftsemi",
        )
        # existence is over the SUPPORT of integrated B
        b_payload = [c for c in b_t.columns if c != WEIGHT]
        b_pos = (
            b_t.groupBy(*b_payload)
            .agg(F.sum(WEIGHT).alias(WEIGHT))
            .where(F.col(WEIGHT) > 0)
            .drop(WEIGHT)
        )
        cond = None
        for i, k in enumerate(self.keys_a):
            eq = a_t[k] == b_pos[f"__k{i}"]
            cond = eq if cond is None else cond & eq
        cond = cond & F.expr(self.pred)
        how = "left_anti" if self.anti else "leftsemi"
        new_t = a_t.join(b_pos, cond, how).localCheckpoint(eager=False)

        if self._out is None:
            out_delta = ZSet(new_t)
            self._out = new_t
        else:
            old_t = _join_on_keys(self._out, self.keys_a, touched, "leftsemi")
            out_delta = ZSet(new_t).subtract(ZSet(old_t)).consolidate()
            self._out = _join_on_keys(
                self._out, self.keys_a, touched, "left_anti"
            ).unionByName(new_t)

        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._a = ZSet(self._a.df.localCheckpoint(eager=False))
            self._b = ZSet(self._b.df.localCheckpoint(eager=False))
            self._out = self._out.localCheckpoint(eager=False)
        return out_delta


class IncrementalRangeScalarAgg:
    """Range-correlated SCALAR AGGREGATE subquery — ``SELECT a.*,
    (SELECT agg(b.v) FROM b WHERE b.k = a.k AND b.ts < a.ts) FROM a``
    (the "latest-before"/as-of aggregation shape; reference
    visitCorrelate decorrelates it to an aggregate-join circuit).

    The aggregate's group is defined per OUTER ROW (the range makes
    each A row see a different B slice), so the keyed aggregate-then-
    outer-join circuit of _ScalarSubqueryOp does not apply; maintained
    by touched-key recompute over integrated A, integrated B
    (__k keys, __b_ predicate columns, __arg), and the stored output.

    Weighted-exact: SUM/COUNT/AVG aggregate B with its Z-set weights
    (SUM(arg·w), SUM(w)); MIN/MAX over the positive support. SQL
    scalar semantics on empty match: COUNT → 0, others → NULL. Output
    groups identical A rows, so duplicate outer rows consolidate with
    summed weights — the same multiset."""

    def __init__(
        self,
        keys_a: list[str],
        pred: str,
        fn: str,
        alias: str,
        star: bool = False,
        checkpoint_every: int = 8,
    ):
        self.keys_a = list(keys_a)
        self.pred = pred
        self.fn = fn.lower()
        self.alias = alias
        self.star = star  # COUNT(*) — no __arg column projected
        self._a: ZSet | None = None
        self._b: ZSet | None = None
        self._out: DataFrame | None = None
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def _agg_col(self) -> Column:
        w = F.col("__bw")
        if self.fn == "count":
            # NULL args don't count; empty/unmatched → 0 (SQL scalar
            # COUNT over an empty set is 0, not NULL)
            base = w if self.star else F.when(F.col("__arg").isNotNull(), w)
            return F.coalesce(F.sum(base), F.lit(0)).cast("long")
        if self.fn == "sum":
            return F.sum(F.col("__arg") * w)
        if self.fn == "avg":
            return F.sum(F.col("__arg") * w) / F.sum(
                F.when(F.col("__arg").isNotNull(), w)
            )
        if self.fn == "min":
            return F.min("__arg")
        return F.max("__arg")

    def step(self, da: ZSet, db: ZSet) -> ZSet:
        da = da.consolidate()
        db = db.consolidate()
        n = len(self.keys_a)
        touched = (
            da.df.select(*[F.col(k) for k in self.keys_a])
            .unionByName(
                db.df.select(
                    *[F.col(f"__k{i}").alias(k) for i, k in enumerate(self.keys_a)]
                )
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        self._a = da if self._a is None else self._a.add(da).consolidate()
        self._b = db if self._b is None else self._b.add(db).consolidate()

        a_t = _join_on_keys(self._a.df, self.keys_a, touched, "leftsemi")
        b_t = _join_on_keys(
            self._b.df,
            [f"__k{i}" for i in range(n)],
            touched.select(
                *[F.col(k).alias(f"__k{i}") for i, k in enumerate(self.keys_a)]
            ),
            "leftsemi",
        )
        b_payload = [c for c in b_t.columns if c != WEIGHT]
        b_c = (
            b_t.groupBy(*b_payload)
            .agg(F.sum(WEIGHT).alias("__bw"))
            .where(
                F.col("__bw") > 0
                if self.fn in ("min", "max")
                else F.col("__bw") != 0
            )
        )
        cond = None
        for i, k in enumerate(self.keys_a):
            eq = a_t[k] == b_c[f"__k{i}"]
            cond = eq if cond is None else cond & eq
        cond = cond & F.expr(self.pred)
        a_cols = [c for c in a_t.columns if c != WEIGHT]
        new_t = (
            a_t.join(b_c, cond, "left")
            .groupBy(*[a_t[c] for c in a_cols], a_t[WEIGHT])
            .agg(self._agg_col().alias(self.alias))
            .select(*a_cols, self.alias, WEIGHT)
            .localCheckpoint(eager=False)
        )

        if self._out is None:
            out_delta = ZSet(new_t)
            self._out = new_t
        else:
            old_t = _join_on_keys(self._out, self.keys_a, touched, "leftsemi")
            out_delta = ZSet(new_t).subtract(ZSet(old_t)).consolidate()
            self._out = _join_on_keys(
                self._out, self.keys_a, touched, "left_anti"
            ).unionByName(new_t)

        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._a = ZSet(self._a.df.localCheckpoint(eager=False))
            self._b = ZSet(self._b.df.localCheckpoint(eager=False))
            self._out = self._out.localCheckpoint(eager=False)
        return out_delta


class IncrementalNullAwareNotIn:
    """NULL-aware ``x NOT IN (SELECT y FROM B …)`` with full SQL
    three-valued logic (the reason plain anti-join is wrong):

    - B empty            → every A row passes (even x IS NULL),
    - B contains NULL y  → NO row passes (x=NULL comparisons make the
      predicate UNKNOWN at best),
    - otherwise          → rows with x IS NOT NULL and x ∉ y-set.

    Algebraically ``O = E·A + N·(A' ▷ K)`` with scalar indicators
    ``E = [B = ∅]`` and ``N = [B ≠ ∅ ∧ no NULL y]``, ``A' = σ_{x NOT
    NULL} A`` and ``K = distinct non-null y`` (the reference compiles
    NOT IN through the same guarded-subquery expansion — a count
    aggregate joined as a scalar gating an anti join). Both products
    are bilinear, so the delta rule ``Δ(U·V) = ΔU·V_new + U_old·ΔV``
    applies with scalars as weight-carrying unit Z-sets; scalar
    multiplication is a crossJoin against a 1-row frame whose
    weight-0 case prunes to an empty side. Mode flips (E or N
    changing) legitimately retract/insert the whole affected side —
    that IS the delta of the view. Per-step cost is ∝ |delta| while
    modes are stable; the scalar recount is a 1-row global aggregate
    over the B key state."""

    def __init__(self, key_a: str, checkpoint_every: int = 8):
        self.key_a = key_a
        self._anti = IncrementalSemiAnti(keys_a=[key_a], anti=True,
                                         checkpoint_every=checkpoint_every)
        self._a: ZSet | None = None  # integrated full A (incl. NULL x)
        self._b: ZSet | None = None  # integrated B key col (__k0, incl. NULLs)
        self._anti_int: ZSet | None = None  # integral of the anti output
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    @staticmethod
    def _scalars(bdf: DataFrame) -> DataFrame:
        """1-row frame: __e / __n indicator weights from B's state."""
        zero = F.lit(0).cast("long")
        s = bdf.agg(
            F.coalesce(F.sum(WEIGHT), zero).alias("__tot"),
            F.coalesce(
                F.sum(F.when(F.col("__k0").isNull(), F.col(WEIGHT)).otherwise(zero)),
                zero,
            ).alias("__nulls"),
        )
        return s.select(
            F.when(F.col("__tot") == 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("__e"),
            F.when((F.col("__tot") > 0) & (F.col("__nulls") == 0), F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("__n"),
        )

    @staticmethod
    def _smul(scalar: DataFrame, ind: str, z: "ZSet | None") -> "ZSet | None":
        """Scalar·Z-set product: crossJoin with the 1-row indicator,
        multiplying weights; weight-0 indicators prune to empty."""
        if z is None:
            return None
        payload = [c for c in z.df.columns if c != WEIGHT]
        s = scalar.select(F.col(ind).alias("__sw")).where(F.col("__sw") != 0)
        return ZSet(
            z.df.crossJoin(s).select(
                *payload, (F.col(WEIGHT) * F.col("__sw")).cast("long").alias(WEIGHT)
            )
        )

    def step(self, da: ZSet, db: ZSet) -> ZSet:
        """``da``: full A-side delta (outer WHERE applied); ``db``:
        B-side delta of the compared column, named ``__k0``."""
        da = da.consolidate()
        db = db.consolidate()
        b_old_df = self._b.df if self._b is not None else db.df.where(F.lit(False))
        sc_old = self._scalars(b_old_df).localCheckpoint(eager=False)
        a_old, anti_old = self._a, self._anti_int

        da_nonnull = da.filter(F.col(self.key_a).isNotNull())
        dk_nonnull = db.filter(F.col("__k0").isNotNull())
        danti = self._anti.step(da_nonnull, dk_nonnull)

        self._a = da if self._a is None else self._a.add(da).consolidate()
        self._b = db if self._b is None else self._b.add(db).consolidate()
        self._anti_int = (
            danti if self._anti_int is None else self._anti_int.add(danti).consolidate()
        )
        sc_new = self._scalars(self._b.df).localCheckpoint(eager=False)
        # Δindicator as a 1-row frame (new - old weight)
        d_sc = (
            sc_new.select("__e", "__n")
            .unionByName(sc_old.select((-F.col("__e")).alias("__e"), (-F.col("__n")).alias("__n")))
            .agg(F.sum("__e").alias("__e"), F.sum("__n").alias("__n"))
            .localCheckpoint(eager=False)
        )

        terms = [
            self._smul(d_sc, "__e", self._a),        # ΔE · A_new
            self._smul(sc_old, "__e", da),           # E_old · ΔA
            self._smul(d_sc, "__n", self._anti_int), # ΔN · ANTI_new
            self._smul(sc_old, "__n", danti),        # N_old · Δanti
        ]
        out = None
        for t in terms:
            if t is None:
                continue
            out = t if out is None else out.add(t)
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._a = ZSet(self._a.df.localCheckpoint(eager=False))
            self._b = ZSet(self._b.df.localCheckpoint(eager=False))
            self._anti_int = ZSet(self._anti_int.df.localCheckpoint(eager=False))
        return out.consolidate()


class IncrementalKeyedNotIn:
    """CORRELATED NULL-aware ``x NOT IN (SELECT y FROM B WHERE B.k =
    A.k [AND resid])``: the empty/has-NULL mode indicators are per
    correlation key, so the global scalar product of
    :class:`IncrementalNullAwareNotIn` doesn't apply. Maintained by
    *touched-key recompute*: keep integrated A, integrated B pairs
    and the stored output; a step recomputes the predicate only for
    correlation keys present in either delta and diffs against the
    stored rows for those keys.

    Semantics per A row (key k, value x), S_k = {y : B.k = k}:
    S_k empty → row passes (also when k IS NULL — ``=`` correlation
    never matches); S_k containing NULL y → row fails; otherwise
    pass iff x IS NOT NULL and x ∉ S_k. Per-step cost ∝ |delta| +
    Σ size(touched key groups); at scale all three states are
    bucketed on the correlation key."""

    def __init__(self, val_a: str, corr_a: list[str], checkpoint_every: int = 8):
        self.val_a = val_a
        self.corr_a = list(corr_a)
        self._a: ZSet | None = None  # integrated A (payload + weight)
        self._b: ZSet | None = None  # integrated (__k0.., __v) pairs
        self._out: DataFrame | None = None  # stored output (payload + weight)
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def _eval(self, a_t: DataFrame, b_t: DataFrame) -> DataFrame:
        """Predicate over the touched restriction: A rows (weighted)
        that pass NOT IN vs the B pairs, all joins plain-equality."""
        zero = F.lit(0).cast("long")
        n = len(self.corr_a)
        bagg = b_t.groupBy(*[f"__k{i}" for i in range(n)]).agg(
            F.sum(WEIGHT).alias("__tot"),
            F.sum(F.when(F.col("__v").isNull(), F.col(WEIGHT)).otherwise(zero)).alias("__nulls"),
        )
        bagg = bagg.select(
            *[F.col(f"__k{i}").alias(f"__bk{i}") for i in range(n)], "__tot", "__nulls"
        )
        cond = None
        for i, k in enumerate(self.corr_a):
            eq = a_t[k] == F.col(f"__bk{i}")  # null-unsafe: SQL `=`
            cond = eq if cond is None else cond & eq
        j = a_t.join(bagg, cond, "left")

        pairs = (
            b_t.where(F.col("__v").isNotNull())
            .groupBy(*[f"__k{i}" for i in range(n)], "__v")
            .agg(F.sum(WEIGHT).alias("__m"))
            .where(F.col("__m") > 0)
            .select(
                *[F.col(f"__k{i}").alias(f"__pk{i}") for i in range(n)],
                F.col("__v").alias("__pv"),
                F.lit(1).alias("__hit"),
            )
        )
        pcond = a_t[self.val_a] == pairs["__pv"]
        for i, k in enumerate(self.corr_a):
            pcond = pcond & (a_t[k] == pairs[f"__pk{i}"])
        j = j.join(pairs, pcond, "left")

        payload = [c for c in a_t.columns if c != WEIGHT]
        tot = F.coalesce(F.col("__tot"), zero)
        nulls = F.coalesce(F.col("__nulls"), zero)
        passes = (tot == 0) | (
            (nulls == 0) & F.col(self.val_a).isNotNull() & F.col("__hit").isNull()
        )
        return j.where(passes).select(*payload, WEIGHT)

    def _touched_rows(self, z: "ZSet | None", touched: DataFrame) -> DataFrame:
        return _join_on_keys(z.df, self.corr_a, touched, "leftsemi")

    def step(self, da: ZSet, db: ZSet) -> ZSet:
        da = da.consolidate()
        db = db.consolidate()
        n = len(self.corr_a)
        touched = (
            da.df.select(*[F.col(k) for k in self.corr_a])
            .unionByName(
                db.df.select(
                    *[F.col(f"__k{i}").alias(k) for i, k in enumerate(self.corr_a)]
                )
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        self._a = da if self._a is None else self._a.add(da).consolidate()
        self._b = db if self._b is None else self._b.add(db).consolidate()

        a_t = self._touched_rows(self._a, touched)
        b_t = _join_on_keys(
            self._b.df,
            [f"__k{i}" for i in range(n)],
            touched.select(
                *[F.col(k).alias(f"__k{i}") for i, k in enumerate(self.corr_a)]
            ),
            "leftsemi",
        )
        new_t = self._eval(a_t, b_t).localCheckpoint(eager=False)

        if self._out is None:
            out_delta = ZSet(new_t)
            self._out = new_t
        else:
            old_t = _join_on_keys(self._out, self.corr_a, touched, "leftsemi")
            out_delta = ZSet(new_t).subtract(ZSet(old_t)).consolidate()
            self._out = _join_on_keys(
                self._out, self.corr_a, touched, "left_anti"
            ).unionByName(new_t)

        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._a = ZSet(self._a.df.localCheckpoint(eager=False))
            self._b = ZSet(self._b.df.localCheckpoint(eager=False))
            self._out = self._out.localCheckpoint(eager=False)
        return out_delta


class IncrementalDistinct:
    """DBSPIncrementalDistinctOperator: maintain per-row multiplicity;
    emit +1 when a row's weight crosses 0→positive, -1 on positive→0.

    State is one row per distinct payload with its integrated weight;
    a step touches only payloads present in the delta (equi-join on
    the payload columns — bucketed state at scale)."""

    def __init__(self, checkpoint_every: int = 8):
        self._state: DataFrame | None = None  # payload + __mult
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def step(self, delta: ZSet) -> ZSet:
        d = delta.consolidate().df.withColumnRenamed(WEIGHT, "__d")
        payload = [c for c in d.columns if c != "__d"]
        if self._state is None:
            merged = d.select(*payload, F.lit(0).cast("long").alias("__old"), F.col("__d"))
        else:
            st = self._state.select(
                *[F.col(c).alias(f"s_{c}") for c in payload], F.col("__mult").alias("__old")
            )
            cond = None
            for c in payload:
                eq = d[c].eqNullSafe(F.col(f"s_{c}"))
                cond = eq if cond is None else (cond & eq)
            j = d.join(st, cond, "full_outer")
            merged = j.select(
                *[F.coalesce(d[c], F.col(f"s_{c}")).alias(c) for c in payload],
                F.coalesce(F.col("__old"), F.lit(0)).alias("__old"),
                F.coalesce(F.col("__d"), F.lit(0)).alias("__d"),
            )
        merged = merged.withColumn("__new", F.col("__old") + F.col("__d")).localCheckpoint(
            eager=False
        )
        out = (
            merged.where(
                ((F.col("__old") > 0) & (F.col("__new") <= 0))
                | ((F.col("__old") <= 0) & (F.col("__new") > 0))
            )
            .select(
                *payload,
                F.when(F.col("__new") > 0, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias(WEIGHT),
            )
        )
        self._state = merged.where(F.col("__new") != 0).select(
            *payload, F.col("__new").alias("__mult")
        )
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._state = self._state.localCheckpoint(eager=False)
        return ZSet(out)


class IncrementalSetOp:
    """EXCEPT / EXCEPT ALL / INTERSECT / INTERSECT ALL maintained with
    per-step cost ∝ |delta| (reference DBSPSubtractOperator composed
    with DBSPDistinctOperator — sqlCompiler lowers EXCEPT to
    subtract∘distinct and INTERSECT to a self-join of distincts; here
    both collapse into one multiplicity-state operator).

    State: one row per distinct payload with integrated input
    multiplicities (``__ma``, ``__mb``). The output multiplicity is a
    pure function of (ma, mb):

    - ``except``:        1 if ma>0 and mb<=0 else 0
    - ``except_all``:    max(0, ma - mb)
    - ``intersect``:     1 if ma>0 and mb>0 else 0
    - ``intersect_all``: max(0, min(ma, mb))

    A step touches only payloads present in either delta (equi-join on
    payload columns — bucketed state at scale) and emits the change in
    output multiplicity as the output delta."""

    KINDS = ("except", "except_all", "intersect", "intersect_all")

    def __init__(self, kind: str, checkpoint_every: int = 8):
        if kind not in self.KINDS:
            raise ValueError(f"kind must be one of {self.KINDS}")
        self.kind = kind
        self._state: DataFrame | None = None  # payload + __ma + __mb
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def _out_mult(self, ma: Column, mb: Column) -> Column:
        if self.kind == "except":
            return F.when((ma > 0) & (mb <= 0), F.lit(1)).otherwise(F.lit(0))
        if self.kind == "except_all":
            return F.greatest(ma - mb, F.lit(0))
        if self.kind == "intersect":
            return F.when((ma > 0) & (mb > 0), F.lit(1)).otherwise(F.lit(0))
        return F.greatest(F.least(ma, mb), F.lit(0))  # intersect_all

    def step(self, da: ZSet, db: ZSet) -> ZSet:
        zero = F.lit(0).cast("long")
        a = da.consolidate().df.withColumnRenamed(WEIGHT, "__da")
        payload = [c for c in a.columns if c != "__da"]
        b_payload = [c for c in db.df.columns if c != WEIGHT]
        b = (
            db.consolidate()
            .df.select(*b_payload, WEIGHT)
            .toDF(*payload, "__db")  # positional set-op column matching
        )
        d = (
            a.select(*payload, F.col("__da"), zero.alias("__db"))
            .unionByName(b.select(*payload, zero.alias("__da"), F.col("__db")))
            .groupBy(*payload)
            .agg(F.sum("__da").alias("__da"), F.sum("__db").alias("__db"))
        )
        if self._state is None:
            merged = d.select(
                *payload,
                zero.alias("__oa"),
                zero.alias("__ob"),
                F.col("__da"),
                F.col("__db"),
            )
        else:
            st = self._state.select(
                *[F.col(c).alias(f"s_{c}") for c in payload],
                F.col("__ma").alias("__oa"),
                F.col("__mb").alias("__ob"),
            )
            cond = None
            for c in payload:
                eq = d[c].eqNullSafe(F.col(f"s_{c}"))
                cond = eq if cond is None else (cond & eq)
            j = d.join(st, cond, "full_outer")
            merged = j.select(
                *[F.coalesce(d[c], F.col(f"s_{c}")).alias(c) for c in payload],
                F.coalesce(F.col("__oa"), zero).alias("__oa"),
                F.coalesce(F.col("__ob"), zero).alias("__ob"),
                F.coalesce(F.col("__da"), zero).alias("__da"),
                F.coalesce(F.col("__db"), zero).alias("__db"),
            )
        merged = (
            merged.withColumn("__na", F.col("__oa") + F.col("__da"))
            .withColumn("__nb", F.col("__ob") + F.col("__db"))
            .localCheckpoint(eager=False)
        )
        old_out = self._out_mult(F.col("__oa"), F.col("__ob"))
        new_out = self._out_mult(F.col("__na"), F.col("__nb"))
        out = (
            merged.withColumn(WEIGHT, (new_out - old_out).cast("long"))
            .where(F.col(WEIGHT) != 0)
            .select(*payload, WEIGHT)
        )
        self._state = merged.where((F.col("__na") != 0) | (F.col("__nb") != 0)).select(
            *payload, F.col("__na").alias("__ma"), F.col("__nb").alias("__mb")
        )
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._state = self._state.localCheckpoint(eager=False)
        return ZSet(out)


class IncrementalGroupRecomputeAgg:
    """Non-linear grouped aggregates (MIN/MAX/arbitrary) maintained by
    *affected-group recompute* — the reference's strategy for
    aggregates without a subtraction rule (DBSPAggregateOperator over
    an indexed Z-set): keep the integrated input per group; on a
    delta, recompute ONLY the groups the delta touches and emit
    retract/insert rows against the previous aggregate state.

    Per-step cost ∝ |delta| + Σ size(touched groups) — independent of
    the number of untouched groups. At scale both states are bucketed
    on the keys, so the touched-group filter is a bucket-pruned
    equi-join, never a full scan."""

    def __init__(
        self,
        keys: list[str],
        aggs: list[Column],  # aggregate expressions WITH aliases
        cond: Column | None = None,
        checkpoint_every: int = 8,
    ):
        self.keys = keys
        self.aggs = aggs
        self.cond = cond
        self._input: ZSet | None = None  # integrated input state
        self._out: DataFrame | None = None  # previous aggregate rows
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def _agg_over(self, multiset: DataFrame) -> DataFrame:
        return multiset.groupBy(*self.keys).agg(*self.aggs)

    def step(self, delta: ZSet) -> ZSet:
        z = delta if self.cond is None else delta.filter(self.cond)
        self._input = z if self._input is None else self._input.add(z).consolidate()

        touched = z.df.select(*self.keys).distinct()
        # bucket-pruned state read: only touched groups leave the join
        state_touched = _join_on_keys(self._input.df, self.keys, touched, "leftsemi")
        new_rows = self._agg_over(
            ZSet(state_touched).to_multiset_df()
        ).localCheckpoint(eager=False)

        if self._out is None:
            out_delta = ZSet.from_df(new_rows)
            self._out = new_rows
        else:
            old_rows = _join_on_keys(self._out, self.keys, touched, "leftsemi")
            out_delta = ZSet.from_df(new_rows).subtract(ZSet.from_df(old_rows)).consolidate()
            self._out = _join_on_keys(self._out, self.keys, touched, "left_anti").unionByName(
                new_rows
            )

        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._input = ZSet(self._input.df.localCheckpoint(eager=False))
            self._out = self._out.localCheckpoint(eager=False)
        return out_delta

    def snapshot(self) -> DataFrame:
        if self._out is None:
            raise ValueError("no steps applied")
        return self._out


class IncrementalMixedAgg:
    """GROUP BY keys mixing linear aggregates (SUM/COUNT/AVG) with one
    or more COUNT(DISTINCT col) items. The reference expands distinct
    aggregates into separate grouped branches re-joined on the keys
    (Calcite AggregateExpandDistinctAggregatesRule feeding
    DBSPAggregateOperator circuits); the incremental analogue here:

    - one :class:`IncrementalLinearAgg` state for the plain items
      (plus a hidden COUNT(*) when there are none — it also decides
      group existence, Σw > 0),
    - per distinct item, an :class:`IncrementalDistinct` multiplicity
      state over (keys, col) feeding an :class:`IncrementalLinearAgg`
      COUNT(col) — the same distinct→count composition the sole-
      distinct circuit uses,
    - the output delta is a touched-key recombination: retract the
      pre-step joined row, insert the post-step joined row, consolidate
      (unchanged groups cancel).

    Per-step cost ∝ |delta| + |touched keys| state joins — independent
    of the integrated input size. All joins are null-safe (NULL keys
    form one SQL group); absent distinct branches coalesce to 0
    (COUNT(DISTINCT col) of an all-NULL group is 0, but the group
    itself still exists)."""

    def __init__(
        self,
        keys: list[str],
        plain_specs: list[AggSpec],
        dist_items: "list[tuple[str, str]]",  # (arg column, output alias)
        cond: Column | None = None,
    ):
        if not dist_items:
            raise ValueError("need at least one COUNT(DISTINCT) item")
        self.keys = keys
        self.cond = cond
        self._hidden_exist = not plain_specs
        specs = plain_specs or [AggSpec("__exist", "count")]
        self.plain = IncrementalLinearAgg(keys=keys, specs=specs)
        self.branches = [
            (arg, alias, IncrementalDistinct(), IncrementalLinearAgg(
                keys=keys, specs=[AggSpec(alias, "count", F.col(arg))]
            ))
            for arg, alias in dist_items
        ]
        self._stepped = False

    def _combined(self, touched: "DataFrame | None" = None) -> DataFrame:
        """Current view rows: plain snapshot (group existence) left-
        joined with each distinct-count branch snapshot, null-safely.
        With ``touched``, the base is restricted FIRST so the branch
        joins only process affected keys (bucket-pruned at scale)."""
        out = self.plain.snapshot()
        if touched is not None:
            out = _join_on_keys(out, self.keys, touched, "leftsemi")
        cols = [c for c in out.columns]
        for i, (_arg, alias, _dist, cnt) in enumerate(self.branches):
            snap = cnt.snapshot().select(
                *[F.col(k).alias(f"__b{i}k{j}") for j, k in enumerate(self.keys)],
                F.col(alias).alias(f"__b{i}v"),
            )
            cond = None
            for j, k in enumerate(self.keys):
                eq = out[k].eqNullSafe(snap[f"__b{i}k{j}"])
                cond = eq if cond is None else cond & eq
            out = out.join(snap, cond, "left").select(
                *[out[c] for c in cols],
                F.coalesce(snap[f"__b{i}v"], F.lit(0).cast("long")).alias(alias),
            )
            cols.append(alias)
        if self._hidden_exist:
            out = out.drop("__exist")
        return out

    def step(self, delta: ZSet) -> ZSet:
        z = delta if self.cond is None else delta.filter(self.cond)
        z = z.consolidate()
        touched = z.df.select(*self.keys).distinct().localCheckpoint(eager=False)
        # DataFrames are immutable plans: the pre-step combined view
        # stays valid (lazily) after the branch states advance.
        old_rows = self._combined(touched) if self._stepped else None
        self.plain.step(z)
        for arg, _alias, dist, cnt in self.branches:
            zi = ZSet(z.df.select(*self.keys, arg, WEIGHT)).consolidate()
            cnt.step(dist.step(zi))
        self._stepped = True
        new_rows = self._combined(touched)
        if old_rows is None:
            return ZSet.from_df(new_rows)
        return ZSet.from_df(new_rows).subtract(ZSet.from_df(old_rows)).consolidate()

    def snapshot(self) -> DataFrame:
        if not self._stepped:
            raise ValueError("no steps applied")
        return self._combined()


class IncrementalOuterJoin:
    """LEFT/RIGHT/FULL OUTER equi-join maintained by *touched-key
    recompute* (reference: outer joins lower to join + antijoin-derived
    null-padding circuits, DBSPStreamJoinOperator plus the
    LeftJoin/RightJoin rewrites in CalciteToDBSPCompiler.java; we
    maintain the composed result directly). Outer joins are not
    bilinear — a single right-side insert can retract a null-extended
    left row — so the delta rule of :class:`IncrementalJoin` does not
    apply. Instead: keep both integrated inputs; on a step, the
    touched keys are the join-key values present in either delta;
    recompute the outer join restricted to touched keys and diff
    against the stored output rows for those keys.

    Per-step cost ∝ |delta| + Σ size(touched key groups). At scale both
    input states and the output are bucketed on the join key, so every
    touched-key restriction is a bucket-pruned leftsemi join and the
    recompute join shuffles nothing that AQE can't broadcast.

    Inputs are multisets (all weights ≥ 0 after consolidation), the
    reference's outer-join precondition too — its outer-join circuits
    sit downstream of distinct/input streams."""

    def __init__(
        self,
        key_a: str | list[str],
        key_b: str | list[str],
        project: list[Column],
        how: str = "left",
        checkpoint_every: int = 8,
    ):
        if how not in ("left", "right", "full"):
            raise ValueError(f"how must be left/right/full: {how!r}")
        self.keys_a = [key_a] if isinstance(key_a, str) else list(key_a)
        self.keys_b = [key_b] if isinstance(key_b, str) else list(key_b)
        if len(self.keys_a) != len(self.keys_b) or not self.keys_a:
            raise ValueError("key lists must be same non-zero length")
        self.project = project
        self.how = how
        self._a: ZSet | None = None
        self._b: ZSet | None = None
        self._out: DataFrame | None = None  # projected rows + __jk{i}
        self._steps = 0
        self._checkpoint_every = checkpoint_every
        self._jks = [f"__jk{i}" for i in range(len(self.keys_a))]

    def _semi(self, df: DataFrame, keys: list[str], touched: DataFrame) -> DataFrame:
        cond = None
        for k, t in zip(keys, touched.columns):
            eq = df[k].eqNullSafe(touched[t])
            cond = eq if cond is None else (cond & eq)
        return df.join(touched, cond, "leftsemi")

    def step(self, da: ZSet, db: ZSet) -> ZSet:
        self._a = da.consolidate() if self._a is None else self._a.add(da).consolidate()
        self._b = db.consolidate() if self._b is None else self._b.add(db).consolidate()
        touched = (
            da.df.select(*[F.col(k).alias(j) for k, j in zip(self.keys_a, self._jks)])
            .union(
                db.df.select(*[F.col(k).alias(j) for k, j in zip(self.keys_b, self._jks)])
            )
            .distinct()
        )
        # eqNullSafe: NULL join keys never *match* (plain equality in
        # the join below) but a NULL-keyed left insert still changes
        # the null-extended output, so it must reach the recompute.
        a_t = self._semi(self._a.df, self.keys_a, touched)
        b_t = self._semi(self._b.df, self.keys_b, touched)
        am = ZSet(a_t).to_multiset_df()
        bm = ZSet(b_t).to_multiset_df()
        on = None
        for ka, kb in zip(self.keys_a, self.keys_b):
            eq = am[ka] == bm[kb]
            on = eq if on is None else (on & eq)
        joined = am.join(bm, on, self.how)
        jks = [
            (
                F.col(ka)
                if self.how == "left"
                else F.col(kb)
                if self.how == "right"
                else F.coalesce(F.col(ka), F.col(kb))
            ).alias(j)
            for ka, kb, j in zip(self.keys_a, self.keys_b, self._jks)
        ]
        new_rows = joined.select(*self.project, *jks).localCheckpoint(eager=False)

        if self._out is None:
            delta = ZSet.from_df(new_rows)
            self._out = new_rows
        else:
            old_rows = self._semi(self._out, self._jks, touched)
            delta = ZSet.from_df(new_rows).subtract(ZSet.from_df(old_rows))
            anti_cond = None
            for j, t in zip(self._jks, touched.columns):
                eq = self._out[j].eqNullSafe(touched[t])
                anti_cond = eq if anti_cond is None else (anti_cond & eq)
            self._out = self._out.join(touched, anti_cond, "left_anti").unionByName(new_rows)
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._a = ZSet(self._a.df.localCheckpoint(eager=False))
            self._b = ZSet(self._b.df.localCheckpoint(eager=False))
            self._out = self._out.localCheckpoint(eager=False)
        payload = [c for c in delta.df.columns if c not in self._jks and c != WEIGHT]
        return delta.map(*[F.col(c) for c in payload]).consolidate()

    def snapshot(self) -> DataFrame:
        if self._out is None:
            raise ValueError("no steps applied")
        return self._out.drop(*self._jks)


class IncrementalTopK:
    """Per-group TopK maintained incrementally (reference:
    DBSPIndexedTopKOperator / window-based TopK circuits): keep the
    integrated input; on a delta, recompute the TopK of only the
    touched groups (ROW_NUMBER over the group's rows) and emit
    retract/insert against the stored TopK rows. Rank changes inside
    a group surface as paired retract+insert of the shifted rows."""

    def __init__(
        self,
        keys: list[str],
        order: list[Column],
        k: int,
        rank_alias: str = "rn",
        checkpoint_every: int = 8,
    ):
        from pyspark.sql.window import Window

        self.keys = keys
        self.order = order
        self.k = k
        self.rank_alias = rank_alias
        self._win = Window.partitionBy(*keys).orderBy(*order)
        self._input: ZSet | None = None
        self._out: DataFrame | None = None
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def step(self, delta: ZSet) -> ZSet:
        self._input = delta if self._input is None else self._input.add(delta).consolidate()
        touched = delta.df.select(*self.keys).distinct()
        state_touched = _join_on_keys(self._input.df, self.keys, touched, "leftsemi").select(
            *self._input.df.columns
        )
        new_rows = (
            ZSet(state_touched)
            .to_multiset_df()
            .withColumn(self.rank_alias, F.row_number().over(self._win).cast("bigint"))
            .where(F.col(self.rank_alias) <= self.k)
            .localCheckpoint(eager=False)
        )
        if self._out is None:
            out_delta = ZSet.from_df(new_rows)
            self._out = new_rows
        else:
            old_rows = _join_on_keys(self._out, self.keys, touched, "leftsemi")
            out_delta = ZSet.from_df(new_rows).subtract(ZSet.from_df(old_rows)).consolidate()
            self._out = _join_on_keys(self._out, self.keys, touched, "left_anti").unionByName(
                new_rows
            )
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._input = ZSet(self._input.df.localCheckpoint(eager=False))
            self._out = self._out.localCheckpoint(eager=False)
        return out_delta

    def snapshot(self) -> DataFrame:
        if self._out is None:
            raise ValueError("no steps applied")
        return self._out


class IncrementalPartitionedWindow:
    """Window-function views — ROW_NUMBER/RANK/DENSE_RANK/LAG/LEAD/
    NTILE and SUM/COUNT/AVG/MIN/MAX OVER (PARTITION BY … ORDER BY …) —
    maintained by *affected-partition recompute* (reference:
    circuit/operator/DBSPWindowAggregateOperator.java,
    DBSPPartitionedRollingAggregateOperator.java: DBSP evaluates
    window operators over the per-key indexed Z-set, touching only
    keys present in the delta).

    Integrate the input; on each delta recompute the full select list
    (passthrough columns + window expressions) over ONLY the
    partitions the delta touches, then emit retract/insert rows
    against the previous output of those partitions. Per-step cost ∝
    |delta| + Σ size(touched partitions) — a view with LAG over
    millions of small device partitions pays for the touched devices,
    never the whole state. At 100 TB both states are bucketed on the
    partition keys so the touched-partition reads are bucket-pruned
    equi-joins."""

    def __init__(
        self,
        part_keys: list[str],
        select_items: list[str],  # full select list, window fns included
        cond: Column | None = None,
        checkpoint_every: int = 8,
    ):
        self.part_keys = part_keys
        self.select_items = select_items
        self.cond = cond
        self._input: ZSet | None = None
        self._out: DataFrame | None = None
        self._steps = 0
        self._checkpoint_every = checkpoint_every

    def step(self, delta: ZSet) -> ZSet:
        z = delta if self.cond is None else delta.filter(self.cond)
        self._input = z if self._input is None else self._input.add(z).consolidate()

        touched = z.df.select(*self.part_keys).distinct()
        state_touched = _join_on_keys(self._input.df, self.part_keys, touched, "leftsemi")
        new_rows = (
            ZSet(state_touched)
            .to_multiset_df()
            .selectExpr(*self.select_items)
            .localCheckpoint(eager=False)
        )
        if self._out is None:
            out_delta = ZSet.from_df(new_rows)
            self._out = new_rows
        else:
            old_rows = _join_on_keys(self._out, self.part_keys, touched, "leftsemi")
            out_delta = ZSet.from_df(new_rows).subtract(ZSet.from_df(old_rows)).consolidate()
            self._out = _join_on_keys(self._out, self.part_keys, touched, "left_anti").unionByName(
                new_rows
            )
        self._steps += 1
        if self._steps % self._checkpoint_every == 0:
            self._input = ZSet(self._input.df.localCheckpoint(eager=False))
            self._out = self._out.localCheckpoint(eager=False)
        return out_delta

    def snapshot(self) -> DataFrame:
        if self._out is None:
            raise ValueError("no steps applied")
        return self._out
