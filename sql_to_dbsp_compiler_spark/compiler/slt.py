"""SQL-logic-test-style bulk validation harness.

The reference's main correctness weapon is running the public
sqllogictest corpus through a JDBC-validated executor
(SQL-compiler/src/main/java/org/dbsp/sqllogictest/executors/
DBSP_JDBC_Executor.java:55, README.md:252) — thousands of small
statements instead of a curated registry. This module is the same
idea rebuilt for a dual-engine gate: a seeded grammar generates
SQL expressions and statements in the Spark∩DuckDB dialect subset,
every one of which is executed on BOTH engines over identical
in-memory tables and compared value-by-value. Volume catches the
dialect/semantics bugs a hand-curated registry can't: systematic
NULL-handling, cast, three-valued-logic and operator-precedence
divergences.

Expressions are batched many-per-SELECT so a thousand checks cost
tens of Spark jobs, not a thousand.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass

# --- the shared fixture table ---------------------------------------------
# Rows chosen to hit the classic trouble spots: NULLs in every column,
# zero / negative ints, empty + quoted + unicode + padded strings,
# fractional doubles (no -0.0: engines legitimately disagree on its
# textual form), and a stable unique id for deterministic ordering.
T_ROWS = [
    (1, 3, 2, "abc", 1.5),
    (2, -4, 3, "It's", -2.25),
    (3, 0, -2, "", 0.0),
    (4, None, 5, "héllo", None),
    (5, 7, None, " pad ", 3.75),
    (6, -1, 1, None, -0.5),
    (7, 12, 4, "ABC", 2.5),
    (8, 2, -3, "a%b_c", -1.25),
    (9, None, None, "abcabc", 10.0),
    (10, 5, 2, "xyz", None),
    (11, -9, 7, "Abc", 0.25),
    (12, 8, -5, "it''s", -3.5),
]
T_SPARK_SCHEMA = "id int, a int, b int, s string, d double"
T_DUCK_DDL = "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR, d DOUBLE)"

U_ROWS = [(1, 10, "x"), (2, 20, "y"), (3, 30, None), (5, None, "x"), (7, 50, "z")]
U_SPARK_SCHEMA = "k int, v int, tag string"
U_DUCK_DDL = "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR)"


# --- expression grammar ----------------------------------------------------
# Each template is valid and equivalent in Spark SQL and DuckDB over
# the fixture columns. Divergent territory is deliberately excluded:
# CAST(double AS INT) (round vs trunc), concat() (DuckDB skips NULLs),
# raw division/modulo (ANSI Spark raises on 0), round(double)
# (half-even vs half-away at representation boundaries), negative
# substring starts. Guards use NULLIF so both engines see NULL.

_INT = ["a", "b", "(a + b)", "(a - b)", "(a * b)", "abs(a)", "abs(b)",
        "coalesce(a, 0)", "nullif(a, b)", "least(a, b)", "greatest(a, b)",
        "(- a)", "sign(a)"]
_STR = ["s", "upper(s)", "lower(s)", "trim(s)", "(s || 'x')",
        "substring(s, 2, 3)", "replace(s, 'a', 'Q')", "coalesce(s, '?')",
        "reverse(s)", "repeat(s, 2)", "ltrim(s)", "rtrim(s)"]
_NUM = ["d", "(d + 0.5)", "(d * 2)", "abs(d)", "(a / nullif(b, 0))",
        "coalesce(d, -1.0)", "floor(d)", "ceil(d)", "sqrt(abs(d))"]
_BOOL = ["(a > b)", "(a >= 0)", "(a = b)", "(a <> b)", "(a IS NULL)",
         "(s IS NOT NULL)", "(a BETWEEN -2 AND 5)", "(a IN (1, 2, 5, 7))",
         "(s LIKE 'a%')", "(s LIKE '%b_c')", "(a IS DISTINCT FROM b)",
         "(a IS NOT DISTINCT FROM b)", "(d > 0 AND a < 5)",
         "(a > 0 OR b > 0)", "(NOT (a > b))"]


def _templates() -> list[str]:
    out: list[str] = []
    out += _INT + _STR + _NUM + _BOOL
    for i in _INT[:8]:
        for j in _INT[:6]:
            out.append(f"({i} + {j})")
            out.append(f"CASE WHEN {i} > {j} THEN {i} ELSE {j} END")
    for b in _BOOL:
        out.append(f"CASE WHEN {b} THEN 1 ELSE 0 END")
        out.append(f"(CASE WHEN {b} THEN 'T' WHEN NOT {b} THEN 'F' END)")
    for x in _STR[:8]:
        out.append(f"length({x})")
        out.append(f"position('b' IN {x})")
        out.append(f"({x} = 'abc')")
    for n in _NUM:
        out.append(f"({n} > 1.0)")
        out.append(f"CAST({n} AS VARCHAR) IS NOT NULL")
    for i in _INT[:6]:
        out.append(f"CAST({i} AS VARCHAR)")
        out.append(f"CAST({i} AS DOUBLE)")
        out.append(f"try_cast(CAST({i} AS VARCHAR) AS INTEGER)")
    out.append("try_cast(s AS INTEGER)")
    out.append("try_cast(s AS DOUBLE)")
    out.append("(a % nullif(b, 0))")
    out.append("mod(a, nullif(b, 0))")
    out.append("((a % nullif(abs(b), 0)))")
    return out


def slt_expressions(seed: int = 0, n: int = 1000) -> list[str]:
    """Deterministic sample (no replacement while available) of the
    expression space — all valid in both dialects over table ``t``."""
    pool = list(dict.fromkeys(_templates()))
    rng = random.Random(seed)
    rng.shuffle(pool)
    while len(pool) < n:
        i = _INT[rng.randrange(len(_INT))]
        b = _BOOL[rng.randrange(len(_BOOL))]
        s = _STR[rng.randrange(len(_STR))]
        pool.append(f"CASE WHEN {b} THEN {i} ELSE length({s}) END")
    return pool[:n]


# --- statement grammar (whole SELECTs, run one-by-one) --------------------

def slt_statements(seed: int = 0) -> list[str]:
    """Aggregate / join / set-op / subquery statements over t and u —
    the statement shapes sqllogictest stresses, in the shared dialect."""
    rng = random.Random(seed)
    stmts: list[str] = []
    aggs = ["sum({x})", "count({x})", "min({x})", "max({x})", "avg({x})",
            "count(DISTINCT {x})"]
    xs = ["a", "b", "a + b", "abs(a)", "d"]
    keys = ["(a % 3)", "sign(a)", "(b > 0)", "substring(coalesce(s,''), 1, 1)"]
    for k in keys:
        picked = rng.sample(aggs, 3)
        cols = ", ".join(
            f"{t.format(x=rng.choice(xs))} AS c{i}" for i, t in enumerate(picked)
        )
        stmts.append(f"SELECT {k} AS g, {cols} FROM t GROUP BY {k}")
        stmts.append(
            f"SELECT {k} AS g, count(*) AS n FROM t GROUP BY {k} HAVING count(*) > 1"
        )
    for how in ("JOIN", "LEFT JOIN"):
        stmts.append(
            f"SELECT t.id, t.a, u.v FROM t {how} u ON t.a = u.k"
        )
        stmts.append(
            f"SELECT u.tag, sum(t.b) AS sb, count(*) AS n "
            f"FROM t {how} u ON t.id = u.k GROUP BY u.tag"
        )
    stmts += [
        "SELECT a FROM t WHERE a IS NOT NULL UNION SELECT v FROM u",
        "SELECT a FROM t UNION ALL SELECT k FROM u",
        "SELECT id FROM t EXCEPT SELECT k FROM u",
        "SELECT id FROM t INTERSECT SELECT k FROM u",
        "SELECT DISTINCT sign(a) AS sg FROM t",
        "SELECT id, a FROM t WHERE a > (SELECT min(v) FROM u WHERE u.k = t.id)",
        "SELECT id FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.k = t.id)",
        "SELECT id FROM t WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.k = t.id)",
        "SELECT id, a FROM t WHERE a IN (SELECT v / 10 FROM u WHERE v IS NOT NULL)",
        "SELECT count(*) AS n FROM t WHERE s LIKE '%b%'",
        "SELECT sum(CASE WHEN a > 0 THEN a ELSE 0 END) AS pos_sum FROM t",
        "SELECT coalesce(sum(a), 0) AS s0 FROM t WHERE a > 1000",
        "SELECT max(s) AS ms, min(s) AS mns FROM t",
    ]
    return stmts


# --- the dual-engine runner ------------------------------------------------

SPARK_TYPE_REWRITES = [("AS VARCHAR", "AS STRING")]


def to_spark_dialect(sql: str) -> str:
    for old, new in SPARK_TYPE_REWRITES:
        sql = sql.replace(old, new)
    return sql


def _norm(v: object) -> object:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    try:
        import numpy as np

        if isinstance(v, np.floating):
            f = float(v)
            return None if math.isnan(f) else round(f, 9)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.bool_):
            return bool(v)
    except ImportError:  # pragma: no cover
        pass
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    return v


@dataclass
class SltMismatch:
    sql: str
    detail: str


def make_fixture(spark, con) -> None:
    """Register identical t/u tables in a SparkSession and a DuckDB
    connection."""
    spark.createDataFrame(
        [(i, a, b, s, d) for i, a, b, s, d in T_ROWS], T_SPARK_SCHEMA
    ).createOrReplaceTempView("t")
    spark.createDataFrame(U_ROWS, U_SPARK_SCHEMA).createOrReplaceTempView("u")
    con.execute(T_DUCK_DDL)
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", T_ROWS)
    con.execute(U_DUCK_DDL)
    con.executemany("INSERT INTO u VALUES (?,?,?)", U_ROWS)


def run_expression_batches(
    spark, con, exprs: list[str], batch: int = 25
) -> list[SltMismatch]:
    """Run expressions ``batch`` per SELECT on both engines; on a
    batch mismatch, bisect to the exact offending expression so the
    report names expressions, not batches."""
    mismatches: list[SltMismatch] = []
    for i in range(0, len(exprs), batch):
        chunk = exprs[i : i + batch]
        bad = _compare_chunk(spark, con, chunk)
        if bad:
            for e in chunk:
                d = _compare_chunk(spark, con, [e])
                if d:
                    mismatches.append(SltMismatch(e, d))
    return mismatches


def _compare_chunk(spark, con, chunk: list[str]) -> str:
    cols = ", ".join(f"({e}) AS c{j}" for j, e in enumerate(chunk))
    sql = f"SELECT id, {cols} FROM t ORDER BY id"
    srows = [tuple(_norm(v) for v in r) for r in spark.sql(to_spark_dialect(sql)).collect()]
    drows = [tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()]
    if srows != drows:
        for sr, dr in zip(srows, drows):
            if sr != dr:
                return f"spark={sr!r} duckdb={dr!r}"
        return f"row shapes differ: {len(srows)} vs {len(drows)}"
    return ""


def _row_key(row: tuple) -> tuple:
    # rows may mix NULLs and types — sort on a total order over reprs
    return tuple((v is None, str(type(v).__name__), str(v)) for v in row)


def run_statements(spark, con, stmts: list[str]) -> list[SltMismatch]:
    mismatches: list[SltMismatch] = []
    for sql in stmts:
        srows = sorted(
            (
                tuple(_norm(v) for v in r)
                for r in spark.sql(to_spark_dialect(sql)).collect()
            ),
            key=_row_key,
        )
        drows = sorted(
            (tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()),
            key=_row_key,
        )
        if srows != drows:
            diff = next(
                (f"spark={a!r} duckdb={b!r}" for a, b in zip(srows, drows) if a != b),
                f"rows {len(srows)} vs {len(drows)}",
            )
            mismatches.append(SltMismatch(sql, diff))
    return mismatches
