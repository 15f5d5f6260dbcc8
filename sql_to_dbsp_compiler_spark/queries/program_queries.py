"""Queries driven through the SQL *program* compiler — exercising the
reference's actual user API (a program of CREATE TABLE + CREATE VIEW
statements, every view an output; reference: doc/sql/structure.rst,
SQL-compiler frontend CalciteCompiler) end-to-end under the driver's
oracle gate. The oracle runs the equivalent chained SQL in DuckDB, so
a hash match proves program parsing + source binding + ordered view
evaluation all preserve semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.compiler import compile_batch
from sql_to_dbsp_compiler_spark.queries.registry import query

_CHAIN_PROGRAM = """
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR,
                    o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority VARCHAR,
                    o_clerk VARCHAR, o_shippriority INTEGER, o_comment VARCHAR);
CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR,
                      c_nationkey INTEGER, c_phone VARCHAR, c_acctbal DOUBLE,
                      c_mktsegment VARCHAR, c_comment VARCHAR);
CREATE VIEW v_open_orders AS
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
    FROM orders WHERE o_orderstatus = 'O';
CREATE VIEW v_cust_spend AS
    SELECT o_custkey, CAST(SUM(price) AS DECIMAL(18,2)) AS total_spend,
           COUNT(*) AS open_cnt
    FROM v_open_orders GROUP BY o_custkey;
CREATE VIEW v_segment_top AS
    SELECT c_mktsegment, CAST(SUM(total_spend) AS DOUBLE) AS seg_spend,
           CAST(SUM(open_cnt) AS BIGINT) AS seg_orders
    FROM v_cust_spend JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment;
"""


@query(
    "program_multiview_chain",
    oracle="""
    WITH v_open_orders AS (
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderstatus = 'O'
    ), v_cust_spend AS (
        SELECT o_custkey, CAST(SUM(price) AS DECIMAL(18,2)) AS total_spend,
               COUNT(*) AS open_cnt
        FROM v_open_orders GROUP BY o_custkey
    )
    SELECT c_mktsegment, CAST(SUM(total_spend) AS DOUBLE) AS seg_spend,
           CAST(SUM(open_cnt) AS BIGINT) AS seg_orders
    FROM v_cust_spend JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("compiler", "multiview"),
)
def program_multiview_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three chained views (filter→aggregate→join-aggregate) compiled
    from a reference-style program over the parquet tables. Catalyst
    fuses the chain into one plan: the orders scan keeps pushdown of
    the status filter, customer is broadcast, and money is summed in
    DECIMAL for partition-order determinism."""
    views = compile_batch(spark, _CHAIN_PROGRAM, sf_dir=sf_dir)
    return views["v_segment_top"]


_INLINE_PROGRAM = """
CREATE TABLE dept(dept_id INTEGER, dept_name VARCHAR(30));
CREATE TABLE emp(emp_id INTEGER, dept_id INTEGER, salary DECIMAL(10,2), active BOOLEAN);
INSERT INTO dept VALUES (1, 'eng'), (2, 'sales'), (3, 'empty');
INSERT INTO emp VALUES (10, 1, 120000.50, true), (11, 1, 95000.25, false),
                       (12, 2, 80000.00, true), (13, 2, 81000.10, true);
CREATE VIEW active_pay AS
    SELECT dept_id, CAST(SUM(salary) AS DOUBLE) AS pay, COUNT(*) AS n
    FROM emp WHERE active GROUP BY dept_id;
CREATE VIEW dept_pay AS
    SELECT dept_name, COALESCE(pay, 0.0) AS pay, COALESCE(n, 0) AS n
    FROM dept LEFT JOIN active_pay ON dept.dept_id = active_pay.dept_id;
"""


@query(
    "program_values_inline",
    oracle="""
    WITH dept(dept_id, dept_name) AS (VALUES (1, 'eng'), (2, 'sales'), (3, 'empty')),
    emp(emp_id, dept_id, salary, active) AS (
        VALUES (10, 1, CAST(120000.50 AS DECIMAL(10,2)), true),
               (11, 1, CAST(95000.25 AS DECIMAL(10,2)), false),
               (12, 2, CAST(80000.00 AS DECIMAL(10,2)), true),
               (13, 2, CAST(81000.10 AS DECIMAL(10,2)), true)
    ), active_pay AS (
        SELECT dept_id, CAST(SUM(salary) AS DOUBLE) AS pay, COUNT(*) AS n
        FROM emp WHERE active GROUP BY dept_id
    )
    SELECT dept_name, COALESCE(pay, 0.0) AS pay, COALESCE(n, 0) AS n
    FROM dept LEFT JOIN active_pay ON dept.dept_id = active_pay.dept_id
    """,
    tags=("compiler", "values"),
)
def program_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-contained program: INSERT VALUES populate the inputs
    (reference test programs do the same via their JIT input
    adapters), outer join keeps the empty department with COALESCEd
    zeros."""
    views = compile_batch(spark, _INLINE_PROGRAM)
    return views["dept_pay"]


_FRAUD_PROGRAM = """
CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
                    event_type VARCHAR, value DOUBLE, props VARCHAR);
CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR,
                      c_nationkey INTEGER, c_phone VARCHAR, c_acctbal DOUBLE,
                      c_mktsegment VARCHAR, c_comment VARCHAR);
CREATE VIEW txn AS
    SELECT event_id, user_id, value, ts,
           CAST(unix_timestamp(ts) AS BIGINT) AS unix_time
    FROM events WHERE user_id <= 30;
CREATE VIEW enriched AS
    SELECT t.event_id, t.user_id, t.value, t.ts, t.unix_time, c.c_mktsegment
    FROM txn t LEFT JOIN customer c ON t.user_id = c.c_custkey;
CREATE VIEW features AS
    SELECT event_id, user_id, c_mktsegment,
           dayofweek(ts) AS d,
           CASE WHEN COUNT(*) OVER (PARTITION BY user_id ORDER BY unix_time
                    RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING) > 0
                THEN CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                         PARTITION BY user_id ORDER BY unix_time
                         RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING) AS DOUBLE)
                     / COUNT(*) OVER (PARTITION BY user_id ORDER BY unix_time
                         RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING) AS DOUBLE)
           END AS avg_spend_pw,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY unix_time
                RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trans_freq_24
    FROM enriched;
"""


@query(
    "program_fraud_features",
    oracle="""
    WITH txn AS (
        SELECT event_id, user_id, value, ts,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS unix_time
        FROM events WHERE user_id <= 30
    ), enriched AS (
        SELECT t.event_id, t.user_id, t.value, t.ts, t.unix_time, c.c_mktsegment
        FROM txn t LEFT JOIN customer c ON t.user_id = c.c_custkey
    )
    SELECT event_id, user_id, c_mktsegment,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS d,
           CASE WHEN COUNT(*) OVER wpw > 0
                THEN CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER wpw AS DOUBLE)
                     / COUNT(*) OVER wpw AS DOUBLE)
           END AS avg_spend_pw,
           CAST(COUNT(*) OVER w24 AS BIGINT) AS trans_freq_24
    FROM enriched
    WINDOW
      wpw AS (PARTITION BY user_id ORDER BY unix_time
              RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING),
      w24 AS (PARTITION BY user_id ORDER BY unix_time
              RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING)
    """,
    tags=("compiler", "complex", "window"),
)
def program_fraud_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship fraud-features program
    (ComplexQueriesTest.java demographicsTest: transactions LEFT JOIN
    demographics, then per-card time-RANGE window features excluding
    the current row) mapped onto the events/customer tables and run
    through the PROGRAM frontend (compile_batch): three chained views
    — epoch projection, left-join enrichment, window features — fused
    by Catalyst into one plan. DECIMAL-accumulated averages with the
    empty-frame guard keep the result hash-stable."""
    views = compile_batch(spark, _FRAUD_PROGRAM, sf_dir=sf_dir)
    return views["features"]


# ---------------------------------------------------------------------------
# Round-3b circuit ops driven end-to-end on parquet data: each query
# runs IncrementalProgram (optimize=True) over THREE delta steps
# (snapshot differences, including deletes) and returns the integrated
# view — the oracle is the batch SQL on the final snapshot, so a hash
# match is the DBSP correctness theorem for the new circuit on real
# data, not just the unit fixtures.
# ---------------------------------------------------------------------------

def _order_slices(spark: SparkSession, sf_dir: str, cols: list[str]):
    """Three orders snapshots (grow + churn) → Z-set deltas."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.plans.zset import differentiate
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(*cols)
    snapshots = [
        o.where(F.col("o_orderkey") % 3 == 0),
        o.where(F.col("o_orderkey") % 3 != 2),  # some of step 1 deleted
        o,
    ]
    return differentiate(snapshots)


_MIXED_CD_PROGRAM = """
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderstatus VARCHAR, o_totalprice DOUBLE);
CREATE VIEW v_mixed AS
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS custs, COUNT(*) AS n,
           SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec
    FROM orders WHERE o_totalprice > 50000 GROUP BY o_orderstatus;
CREATE VIEW v_out AS
    SELECT o_orderstatus, custs, n, CAST(spend_dec AS DOUBLE) AS spend
    FROM v_mixed;
"""


@query(
    "x_program_mixed_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS custs, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
    FROM orders WHERE o_totalprice > 50000 GROUP BY o_orderstatus
    """,
    tags=("compiler", "incremental", "mixed-distinct"),
)
def x_program_mixed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed COUNT(DISTINCT)+linear aggregate maintained INCREMENTALLY
    (IncrementalMixedAgg: per-branch distinct→count states recombined
    on touched keys) over three snapshot deltas of the orders table —
    inserts and deletes — then integrated. DECIMAL spend keeps the sum
    exact under any delta order; the batch SQL is the oracle."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram

    inc = IncrementalProgram(spark, _MIXED_CD_PROGRAM, optimize=True)
    assert inc.plan()["v_mixed"] == "mixed-distinct-aggregate", inc.plan()
    for d in _order_slices(
        spark, sf_dir, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    ):
        inc.step({"orders": d})
    return inc.snapshot("v_out").to_multiset_df()


_NOTIN_PROGRAM = """
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderstatus VARCHAR, o_totalprice DOUBLE);
CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, c_acctbal DOUBLE);
CREATE VIEW v_quiet AS
    SELECT c_custkey, c_name FROM customer
    WHERE c_acctbal > 0
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 400000);
"""


@query(
    "x_program_not_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_acctbal > 0
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 400000)
    """,
    tags=("compiler", "incremental", "not-in"),
)
def x_program_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-aware NOT IN maintained incrementally
    (IncrementalNullAwareNotIn: E·A + N·(A' ▷ K) with scalar indicator
    Z-sets): customers in good standing with no large orders. The
    customer table arrives in step 1; orders arrive as three deltas
    with deletes, shrinking/growing the NOT-IN set."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _NOTIN_PROGRAM, optimize=True)
    assert inc.plan()["v_quiet"] == "not-in-null-aware", inc.plan()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    deltas = _order_slices(
        spark, sf_dir, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    )
    inc.step({"orders": deltas[0], "customer": ZSet.from_df(cust)})
    for d in deltas[1:]:
        inc.step({"orders": d})
    return inc.snapshot("v_quiet").to_multiset_df()


_CHAIN_AGG_PROGRAM = """
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderstatus VARCHAR, o_totalprice DOUBLE);
CREATE TABLE customer(c_custkey BIGINT, c_nationkey INTEGER);
CREATE TABLE nation(n_nationkey INTEGER, n_name VARCHAR);
CREATE VIEW v_nat AS
    SELECT n_name, COUNT(*) AS orders_cnt,
           SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_totalprice > 10000
    GROUP BY n_name;
CREATE VIEW v_natout AS
    SELECT n_name, orders_cnt, CAST(spend_dec AS DOUBLE) AS spend FROM v_nat;
"""


@query(
    "x_program_chain_agg",
    oracle="""
    SELECT n_name, COUNT(*) AS orders_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_totalprice > 10000
    GROUP BY n_name
    """,
    tags=("compiler", "incremental", "join-chain"),
)
def x_program_chain_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY over a 3-way aliased join chain maintained
    incrementally (cascaded bilinear IncrementalJoins feeding one
    incremental aggregate — the TPC-H q5-style circuit), with a bare
    GROUP BY key resolved to the leg that owns it. Dims (customer,
    nation) arrive in step 1; orders arrive as three deltas with
    deletes."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _CHAIN_AGG_PROGRAM, optimize=True)
    assert inc.plan()["v_nat"] == "join-chain-3-aggregate", inc.plan()
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    deltas = _order_slices(
        spark, sf_dir, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    )
    inc.step({
        "orders": deltas[0],
        "customer": ZSet.from_df(cust),
        "nation": ZSet.from_df(nat),
    })
    for d in deltas[1:]:
        inc.step({"orders": d})
    return inc.snapshot("v_natout").to_multiset_df()


_SETOP_CHAIN_PROGRAM = """
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderstatus VARCHAR, o_totalprice DOUBLE);
CREATE VIEW v_exc AS
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 400000;
CREATE VIEW v_umix AS
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'P';
"""


@query(
    "x_program_setop_chain",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
    tags=("compiler", "incremental", "setop-chain"),
)
def x_program_setop_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-branch EXCEPT / EXCEPT ALL chain maintained incrementally as
    a left-assoc cascade of multiplicity-state set ops, over three
    snapshot deltas of orders (with deletes)."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram

    inc = IncrementalProgram(spark, _SETOP_CHAIN_PROGRAM, optimize=True)
    assert inc.plan()["v_exc"] == "setop-chain-3", inc.plan()
    for d in _order_slices(
        spark, sf_dir, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    ):
        inc.step({"orders": d})
    return inc.snapshot("v_exc").to_multiset_df()


@query(
    "x_program_union_chain",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("compiler", "incremental", "union-chain"),
)
def x_program_union_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed UNION ALL / UNION chain maintained incrementally (one
    distinct state at the UNION separator applied to the running sum),
    over three snapshot deltas of orders (with deletes)."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram

    inc = IncrementalProgram(spark, _SETOP_CHAIN_PROGRAM, optimize=True)
    assert inc.plan()["v_umix"] == "union-chain-3", inc.plan()
    for d in _order_slices(
        spark, sf_dir, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    ):
        inc.step({"orders": d})
    return inc.snapshot("v_umix").to_multiset_df()


_CTE_PROGRAM = """
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderstatus VARCHAR, o_totalprice DOUBLE);
CREATE VIEW v_cte AS
    WITH big AS (SELECT o_custkey, o_orderstatus, o_totalprice
                 FROM orders WHERE o_totalprice > 100000),
    spend AS (SELECT o_orderstatus,
                     SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec,
                     COUNT(*) AS n
              FROM big GROUP BY o_orderstatus)
    SELECT o_orderstatus, CAST(spend_dec AS DOUBLE) AS spend, n FROM spend;
"""


@query(
    "x_program_cte",
    oracle="""
    WITH big AS (SELECT o_custkey, o_orderstatus, o_totalprice
                 FROM orders WHERE o_totalprice > 100000),
    spend AS (SELECT o_orderstatus,
                     SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec,
                     COUNT(*) AS n
              FROM big GROUP BY o_orderstatus)
    SELECT o_orderstatus, CAST(spend_dec AS DOUBLE) AS spend, n FROM spend
    """,
    tags=("compiler", "incremental", "cte"),
)
def x_program_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A WITH (CTE) view maintained INCREMENTALLY: the program
    compiler decomposes the WITH clause into hidden intermediate
    views — filter CTE → linear circuit, aggregate CTE → incremental
    aggregate, outer SELECT → linear — mirroring how the reference's
    Calcite planning erases CTEs into ordinary circuit sub-graphs
    (CalciteToDBSPCompiler.java:90). Driven over three orders
    snapshot deltas with deletes; the plain batch CTE SQL is the
    oracle. DECIMAL spend keeps the sum exact under any delta
    order."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram

    inc = IncrementalProgram(spark, _CTE_PROGRAM, optimize=True)
    plan = inc.plan()
    assert plan["big"] == "linear" and plan["v_cte"] == "linear", plan
    assert plan["spend"].startswith("aggregate"), plan
    for d in _order_slices(
        spark, sf_dir, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    ):
        inc.step({"orders": d})
    return inc.snapshot("v_cte").to_multiset_df()


_RECURSIVE_PROGRAM = """
CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR,
                       source VARCHAR, n_chars BIGINT);
CREATE VIEW edges AS
    SELECT DISTINCT doc_id % 23 AS src, ((doc_id * 7 + 3) % 29) % 23 AS dst
    FROM documents WHERE doc_id < 200;
CREATE RECURSIVE VIEW reach AS
SELECT src, dst FROM edges WHERE src < 3
UNION
SELECT r.src, e.dst FROM reach r, edges e WHERE r.dst = e.src;
"""


@query(
    "x_program_recursive",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT doc_id % 23 AS src, ((doc_id * 7 + 3) % 29) % 23 AS dst
        FROM documents WHERE doc_id < 200),
    reach AS (
        SELECT src, dst FROM edges WHERE src < 3
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src, dst FROM reach
    """,
    tags=("compiler", "incremental", "recursive"),
)
def x_program_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE RECURSIVE VIEW maintained across snapshot deltas:
    transitive reachability over a cyclic functional graph derived
    from documents, evaluated by semi-naive fixpoint (delta-bound
    self-reference, eager-checkpointed rounds) and recomputed per
    IncrementalProgram step with delta outputs. Beyond the reference
    SQL surface, inside its DBSP theory (recursive circuits, Budiu et
    al. VLDB'23 §6). DuckDB's WITH RECURSIVE ... UNION is the oracle."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.plans.zset import differentiate
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _RECURSIVE_PROGRAM, optimize=True)
    assert inc.plan()["reach"] == "recursive-fixpoint", inc.plan()
    d = load_table(spark, sf_dir, "documents")
    # grow + CHURN: step 2 deletes doc_ids ≡ 0 (mod 12) while adding
    # others, so the fixpoint is maintained by all three modes across
    # the run — cold (step 1), delete-and-rederive (step 2), and the
    # insert-only warm start (step 3) — all under the value oracle
    snapshots = [
        d.where(F.col("doc_id") % 3 == 0),
        d.where((F.col("doc_id") % 4 != 0) | (F.col("doc_id") % 3 == 1)),
        d,
    ]
    for z in differentiate(snapshots):
        inc.step({"documents": z})
    assert inc.recursive_dred_steps >= 1, "churn step must take the DRed path"
    assert inc.recursive_warm_steps >= 1, "growth step must warm-start"
    return inc.snapshot("reach").to_multiset_df()


_DELETE_PROGRAM = """
CREATE TABLE inv(item_id INTEGER, cat VARCHAR(5), qty INTEGER);
CREATE VIEW stock AS SELECT cat, SUM(qty) AS total_qty, COUNT(*) AS n
    FROM inv GROUP BY cat;
INSERT INTO inv VALUES (1, 'red', 5), (2, 'red', 7), (3, 'blue', 2), (4, 'blue', NULL);
DELETE FROM inv WHERE qty > 6;
INSERT INTO inv VALUES (2, 'red', 6);
DELETE FROM inv WHERE cat = 'green';
"""


@query(
    "x_program_delete",
    oracle="""
    WITH inv(item_id, cat, qty) AS (
        VALUES (1, 'red', 5), (3, 'blue', 2), (4, 'blue', NULL),
               (2, 'red', 6)
    )
    SELECT cat, CAST(SUM(qty) AS BIGINT) AS total_qty, COUNT(*) AS n
    FROM inv GROUP BY cat
    """,
    tags=("compiler", "delete"),
)
def x_program_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Program frontend with DELETE statements (reference:
    TableContents.java:43 tracks INSERT and DELETE to build table
    contents). Statement-order semantics under the driver gate: item 2
    is deleted (qty 7 > 6) then re-inserted with qty 6; the NULL qty
    row survives its DELETE predicate (UNKNOWN keeps the row); the
    no-match DELETE is a no-op. The oracle lists the surviving rows
    directly."""
    views = compile_batch(spark, _DELETE_PROGRAM)
    return views["stock"].withColumn(
        "total_qty", F.col("total_qty").cast("bigint")
    )


_RANGE_EXISTS_PROGRAM = """
CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT,
                      l_quantity DOUBLE, l_shipdate DATE);
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderdate DATE, o_totalprice DOUBLE);
CREATE VIEW v_shipped_late AS
    SELECT orders.o_orderkey, orders.o_custkey FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE lineitem.l_orderkey = orders.o_orderkey
                    AND lineitem.l_shipdate > orders.o_orderdate);
"""


@query(
    "y_program_range_exists",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE lineitem.l_orderkey = orders.o_orderkey
                    AND lineitem.l_shipdate > orders.o_orderdate)
    """,
    tags=("compiler", "incremental", "range-exists"),
)
def y_program_range_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-correlated EXISTS decorrelated to the touched-key range
    circuit (IncrementalRangeSemiAnti; reference
    CalciteToDBSPCompiler.java:213 visitCorrelate handles non-equi
    correlation the same way): orders with any line shipped after the
    order date. The equi anchor (l_orderkey = o_orderkey) buckets the
    state; the date comparison is the non-equi residual. Orders arrive
    in step 1, lineitem as three deltas with deletes — the plan is
    asserted non-naive and the snapshot equals the oracle's batch
    evaluation."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet, differentiate
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _RANGE_EXISTS_PROGRAM, optimize=True)
    assert inc.plan()["v_shipped_late"] == "range-semi-join-decorrelated", inc.plan()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    snapshots = [
        li.where(F.col("l_orderkey") % 3 == 0),
        li.where(F.col("l_orderkey") % 3 != 2),  # churn: some deleted
        li,
    ]
    deltas = differentiate(snapshots)
    inc.step({"lineitem": deltas[0], "orders": ZSet.from_df(orders)})
    for d in deltas[1:]:
        inc.step({"lineitem": d})
    return inc.snapshot("v_shipped_late").to_multiset_df()


_RANGE_SCALAR_PROGRAM = """
CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT,
                      l_quantity DOUBLE, l_shipdate DATE);
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderdate DATE, o_totalprice DOUBLE);
CREATE VIEW v_early_ship AS
    SELECT o_orderkey, o_custkey,
    (SELECT MAX(lineitem.l_shipdate) FROM lineitem
     WHERE lineitem.l_orderkey = orders.o_orderkey
       AND lineitem.l_shipdate < orders.o_orderdate) AS last_early_ship
    FROM orders;
"""


@query(
    "y_program_range_scalar",
    oracle="""
    SELECT o_orderkey, o_custkey,
           (SELECT MAX(lineitem.l_shipdate) FROM lineitem
            WHERE lineitem.l_orderkey = orders.o_orderkey
              AND lineitem.l_shipdate < orders.o_orderdate)
               AS last_early_ship
    FROM orders
    """,
    tags=("compiler", "incremental", "range-scalar"),
)
def y_program_range_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-correlated scalar aggregate decorrelated to the
    touched-key IncrementalRangeScalarAgg circuit (the 'latest-before'
    as-of aggregation; reference visitCorrelate parity): per order,
    the latest line shipped BEFORE the order date (NULL when none —
    scalar-subquery semantics). Orders in step 1, lineitem as three
    churning deltas; plan asserted non-naive, snapshot equals the
    oracle's batch evaluation."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet, differentiate
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _RANGE_SCALAR_PROGRAM, optimize=True)
    assert inc.plan()["v_early_ship"] == "range-scalar-agg", inc.plan()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    snapshots = [
        li.where(F.col("l_orderkey") % 3 == 0),
        li.where(F.col("l_orderkey") % 3 != 2),
        li,
    ]
    deltas = differentiate(snapshots)
    inc.step({"lineitem": deltas[0], "orders": ZSet.from_df(orders)})
    for d in deltas[1:]:
        inc.step({"lineitem": d})
    return inc.snapshot("v_early_ship").to_multiset_df()


_UPDATE_PROGRAM = """
CREATE TABLE acc(id INTEGER, bal INTEGER, tier VARCHAR(5));
CREATE VIEW balances AS SELECT tier, SUM(bal) AS total_bal, COUNT(*) AS n
    FROM acc GROUP BY tier;
INSERT INTO acc VALUES (1, 100, 'lo'), (2, 250, 'lo'), (3, 900, 'hi'),
                       (4, NULL, 'lo'), (5, 40, 'lo');
UPDATE acc SET bal = bal * 2, tier = 'hi' WHERE bal >= 250;
DELETE FROM acc WHERE id = 3;
UPDATE acc SET bal = 0 WHERE bal IS NULL;
UPDATE acc SET bal = bal + 1 WHERE tier = 'mid';
"""


@query(
    "y_program_update",
    oracle="""
    WITH acc(id, bal, tier) AS (
        VALUES (1, 100, 'lo'), (2, 500, 'hi'), (4, 0, 'lo'), (5, 40, 'lo')
    )
    SELECT tier, CAST(SUM(bal) AS BIGINT) AS total_bal, COUNT(*) AS n
    FROM acc GROUP BY tier
    """,
    tags=("compiler", "update"),
)
def y_program_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Program frontend with UPDATE statements (reference:
    TableModifyStatement.java:35 — every table-modify is a Z-set
    retract+insert; TableContents tracks statement order). Semantics
    pinned under the driver gate: both SET expressions of one UPDATE
    evaluate against the OLD row (id 2: bal 250→500 AND tier→'hi'
    from the pre-update bal); a row whose predicate is UNKNOWN is
    untouched (id 4's NULL bal fails bal >= 250, then a later
    IS NULL update rewrites it); statement order matters (id 3 is
    doubled, then deleted); a no-match UPDATE is a no-op. The oracle
    lists the surviving post-update rows directly."""
    views = compile_batch(spark, _UPDATE_PROGRAM)
    return views["balances"].withColumn(
        "total_bal", F.col("total_bal").cast("bigint")
    )


_RANGE_ANTI_PROGRAM = """
CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT,
                      l_quantity DOUBLE, l_shipdate DATE);
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderdate DATE, o_totalprice DOUBLE);
CREATE VIEW v_never_late AS
    SELECT orders.o_orderkey, orders.o_custkey FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE lineitem.l_orderkey = orders.o_orderkey
                        AND lineitem.l_shipdate > orders.o_orderdate
                        AND lineitem.l_quantity >= 2);
"""


@query(
    "y_program_range_anti",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE lineitem.l_orderkey = orders.o_orderkey
                        AND lineitem.l_shipdate > orders.o_orderdate
                        AND lineitem.l_quantity >= 2)
    """,
    tags=("compiler", "incremental", "range-anti"),
)
def y_program_range_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANTI twin of y_program_range_exists: range-correlated NOT
    EXISTS compiled to the touched-key range circuit's anti branch
    (_RangeSemiAntiOp; reference visitCorrelate parity). Orders with
    NO substantial line shipped after the order date — the b-only
    residual (l_quantity >= 2) rides along to pin the residual path
    under the driver gate. Same churn protocol as the exists twin:
    orders in step 1, lineitem as three deltas with deletes; plan
    asserted non-naive; snapshot equals the oracle's batch answer."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet, differentiate
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _RANGE_ANTI_PROGRAM, optimize=True)
    assert inc.plan()["v_never_late"] == "range-anti-join-decorrelated", inc.plan()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    snapshots = [
        li.where(F.col("l_orderkey") % 3 == 0),
        li.where(F.col("l_orderkey") % 3 != 2),
        li,
    ]
    deltas = differentiate(snapshots)
    inc.step({"lineitem": deltas[0], "orders": ZSet.from_df(orders)})
    for d in deltas[1:]:
        inc.step({"lineitem": d})
    return inc.snapshot("v_never_late").to_multiset_df()


_MERGE_PROGRAM = """
CREATE TABLE inv(sku INTEGER, qty INTEGER, status VARCHAR(10));
CREATE VIEW stock AS SELECT status, SUM(qty) AS total_qty, COUNT(*) AS n
    FROM inv GROUP BY status;
INSERT INTO inv VALUES (1, 10, 'live'), (2, 0, 'live'), (3, 5, 'hold'),
                       (4, NULL, 'hold');
MERGE INTO inv USING (VALUES (2, 7), (3, -5), (5, 20), (6, 0))
    AS s(sku, delta)
    ON inv.sku = s.sku
    WHEN MATCHED AND inv.qty + s.delta <= 0 THEN DELETE
    WHEN MATCHED THEN UPDATE SET qty = inv.qty + s.delta
    WHEN NOT MATCHED AND s.delta > 0 THEN INSERT VALUES (s.sku, s.delta, 'new')
    WHEN NOT MATCHED THEN INSERT (sku, status) VALUES (s.sku, 'empty');
MERGE INTO inv USING (VALUES (1, 'gold'), (6, 'silver')) AS t(sku, tag)
    ON inv.sku = t.sku AND inv.status = 'live'
    WHEN MATCHED THEN UPDATE SET status = t.tag;
"""


@query(
    "y_program_merge",
    oracle="""
    WITH inv(sku, qty, status) AS (
        VALUES (1, 10, 'gold'), (2, 7, 'live'), (4, NULL, 'hold'),
               (5, 20, 'new'), (6, NULL, 'empty')
    )
    SELECT status, CAST(SUM(qty) AS BIGINT) AS total_qty, COUNT(*) AS n
    FROM inv GROUP BY status
    """,
    tags=("compiler", "merge"),
)
def y_program_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SQL:2003 upsert) in the program frontend
    (compiler/program.py::MergeDef/_apply_merge) — the batch
    CDC-apply statement; extends the reference's table-modify set
    (TableModifyStatement.java tracks INSERT/DELETE; MERGE is the
    same Z-set retract+insert composition). Semantics pinned under
    the driver gate: clause order is first-match-wins (sku 3 hits
    the DELETE guard before the UPDATE; sku 5 hits the guarded
    INSERT, sku 6 falls through to the unguarded one with partial
    column list -> NULL qty); UPDATE SET sees target AND source
    columns; an UNKNOWN guard predicate does not fire (sku 4's NULL
    qty); a second MERGE with an extra ON conjunct (status = 'live')
    only retags matched rows. The oracle lists the expected
    post-merge table contents directly."""
    views = compile_batch(spark, _MERGE_PROGRAM)
    return views["stock"].withColumn(
        "total_qty", F.col("total_qty").cast("bigint")
    )


_MERGE2_DDL = """
CREATE TABLE dim(sku INTEGER, price INTEGER, status VARCHAR(10));
CREATE TABLE staging(sku INTEGER, price INTEGER);
CREATE VIEW dim_out AS SELECT sku, price, status FROM dim;
"""

_MERGE2_STMTS = """
INSERT INTO dim VALUES (1, 10, 'live'), (2, 20, 'live'), (3, 30, 'live'),
                       (4, 40, 'hold');
INSERT INTO staging VALUES (1, 11), (3, 30), (5, 55);
MERGE INTO dim USING staging AS s
    ON dim.sku = s.sku
    WHEN MATCHED AND dim.price <> s.price THEN UPDATE SET price = s.price
    WHEN NOT MATCHED THEN INSERT VALUES (s.sku, s.price, 'new')
    WHEN NOT MATCHED BY SOURCE AND dim.status = 'live' THEN DELETE
    WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale';
"""


@query(
    "y_program_merge2",
    oracle="""
    WITH dim(sku, price, status) AS (
        VALUES (1, 11, 'live'), (3, 30, 'live'), (4, 40, 'stale'),
               (5, 55, 'new')
    )
    SELECT sku, price, status FROM dim
    """,
    tags=("compiler", "merge", "cdc"),
)
def y_program_merge2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE from a TABLE-VALUED source (VERDICT r6 item 4): the real
    CDC-apply shape — a staging table loaded by INSERT statements,
    merged into a dimension with WHEN NOT MATCHED BY SOURCE clauses
    (full-sync: source-absent live rows delete, source-absent held
    rows mark stale). The reference's TableContents protocol likewise
    feeds statements from relations. Runs the SAME statement stream
    through BOTH frontends — compile_batch (global statement-order
    fold, compiler/program.py::bind_sources) and
    IncrementalProgram.step_statements (deltas derived from integrated
    state, the staging table resolved to its integrated Z-set) — and
    raises if they disagree, so the driver gate pins their agreement
    plus the standard's semantics: matched-and-changed updates (sku
    1), matched-unchanged untouched (sku 3), by-source delete (sku 2),
    by-source update (sku 4), not-matched insert (sku 5)."""
    from sql_to_dbsp_compiler_spark.compiler.program import (
        IncrementalProgram,
        compile_batch,
    )

    batch = compile_batch(spark, _MERGE2_DDL + _MERGE2_STMTS)["dim_out"]
    inc = IncrementalProgram(spark, _MERGE2_DDL)
    inc.step_statements(_MERGE2_STMTS)
    snap = inc.snapshot("dim_out").to_multiset_df()
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in snap.collect())
    if b != s:  # bounded program tables — a tiny local check
        raise AssertionError(f"batch/incremental MERGE disagree: {b} != {s}")
    return snap


_CDC_STMT_PROGRAM = """
CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,
                    o_orderdate DATE, o_totalprice DOUBLE);
CREATE VIEW cust_totals AS
    SELECT o_custkey, COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
    FROM orders GROUP BY o_custkey;
"""

_CDC_STMT_STREAM = """
DELETE FROM orders WHERE o_totalprice < 1000;
UPDATE orders SET o_totalprice = o_totalprice + 100.0
    WHERE o_custkey % 100 = 7;
MERGE INTO orders USING (VALUES (CAST(1 AS BIGINT), 500.0),
                                (CAST(2 AS BIGINT), -200.0),
                                (CAST(90000001 AS BIGINT), 42.0))
    AS adj(k, d)
    ON orders.o_orderkey = adj.k
    WHEN MATCHED THEN UPDATE SET o_totalprice = orders.o_totalprice + adj.d
    WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice) VALUES (adj.k, adj.d);
"""


@query(
    "y_program_cdc_statements",
    oracle="""
    WITH o1 AS (SELECT * FROM orders WHERE NOT (o_totalprice < 1000)),
    o2 AS (SELECT o_orderkey, o_custkey, o_orderdate,
                  CASE WHEN o_custkey % 100 = 7
                       THEN o_totalprice + 100.0 ELSE o_totalprice END
                      AS o_totalprice
           FROM o1),
    adj(k, d) AS (VALUES (CAST(1 AS BIGINT), 500.0),
                         (CAST(2 AS BIGINT), -200.0),
                         (CAST(90000001 AS BIGINT), 42.0)),
    upd AS (SELECT o_orderkey, o_custkey, o_orderdate,
                   CASE WHEN adj.k IS NOT NULL
                        THEN o_totalprice + adj.d ELSE o_totalprice END
                       AS o_totalprice
            FROM o2 LEFT JOIN adj ON o2.o_orderkey = adj.k),
    ins AS (SELECT k AS o_orderkey, CAST(NULL AS BIGINT) AS o_custkey,
                   CAST(NULL AS DATE) AS o_orderdate, d AS o_totalprice
            FROM adj
            WHERE NOT EXISTS (SELECT 1 FROM o2 WHERE o2.o_orderkey = adj.k)),
    fin AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    SELECT o_custkey, COUNT(*) AS n_orders,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total
    FROM fin GROUP BY o_custkey
    """,
    tags=("compiler", "incremental", "cdc", "merge"),
)
def y_program_cdc_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statement-stream input protocol under the driver gate:
    IncrementalProgram.step_statements derives Z-set deltas FROM the
    integrated state for a DELETE / UPDATE / MERGE transaction stream
    (the reference's TableContents statement-consumption model,
    TableModifyStatement.java:35), maintaining a grouped DECIMAL-
    exact aggregate view. Step 1 loads orders as a plain insert
    delta; the statement stream then deletes cheap orders, bumps one
    customer band's prices (old-row semantics), and MERGE-applies a
    keyed adjustment batch (two matched updates, one insert with a
    partial column list -> NULL group). The oracle replays the same
    transaction in plain SQL. Maintenance cost per statement is
    driven by the statement's matched slice, not the table size —
    the deltas are derived, consolidated, and stepped through the
    same incremental circuits as any other delta."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _CDC_STMT_PROGRAM, optimize=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    inc.step({"orders": orders})
    inc.step_statements(_CDC_STMT_STREAM)
    snap = inc.snapshot("cust_totals").to_multiset_df()
    return snap.select(
        "o_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round(F.col("total").cast("double"), 2).alias("total"),
    )


_DEDUP_STMT_PROGRAM = """
CREATE TABLE docs(doc_id BIGINT, text VARCHAR);
CREATE VIEW dup_pairs AS
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM docs a JOIN docs b ON a.text = b.text AND a.doc_id < b.doc_id;
"""

_DEDUP_STMT_STREAM = """
DELETE FROM docs WHERE doc_id % 16 = 1;
UPDATE docs SET text = 'duplicated sentinel passage' WHERE doc_id % 16 = 2;
MERGE INTO docs USING (VALUES (CAST(10001 AS BIGINT),
                               'duplicated sentinel passage'),
                              (CAST(10002 AS BIGINT), 'fresh unique text'),
                              (CAST(0 AS BIGINT), 'rewritten by merge'))
    AS s(id, t)
    ON docs.doc_id = s.id
    WHEN MATCHED THEN UPDATE SET text = s.t
    WHEN NOT MATCHED THEN INSERT (doc_id, text) VALUES (s.id, s.t);
"""


@query(
    "y_program_dedup_statements",
    oracle="""
    WITH d1 AS (SELECT doc_id, text FROM documents
                WHERE NOT (doc_id % 16 = 1)),
    d2 AS (SELECT doc_id,
                  CASE WHEN doc_id % 16 = 2
                       THEN 'duplicated sentinel passage' ELSE text END AS text
           FROM d1),
    s(id, t) AS (VALUES (CAST(10001 AS BIGINT),
                         'duplicated sentinel passage'),
                        (CAST(10002 AS BIGINT), 'fresh unique text'),
                        (CAST(0 AS BIGINT), 'rewritten by merge')),
    upd AS (SELECT doc_id,
                   CASE WHEN s.id IS NOT NULL THEN s.t ELSE d2.text END AS text
            FROM d2 LEFT JOIN s ON d2.doc_id = s.id),
    ins AS (SELECT id AS doc_id, t AS text FROM s
            WHERE NOT EXISTS (SELECT 1 FROM d2 WHERE d2.doc_id = s.id)),
    fin AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM fin a JOIN fin b ON a.text = b.text AND a.doc_id < b.doc_id
    """,
    tags=("compiler", "incremental", "cdc", "dedup", "merge"),
)
def y_program_dedup_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r8 #7: the signed-delta shapes of the standing-state
    dedup loop (delete a slice, update a slice to duplicate other
    text, MERGE a batch that both rewrites and inserts) driven as a
    DELETE / UPDATE / MERGE statement stream through the
    statement-protocol gate, maintaining the exact-duplicate PAIR
    view — the relational twin of y_dedup_delta_retract's semantics:
    deletions retract pairs, updates retract the old row's pairs and
    insert the new row's, all via derived Z-set deltas
    (IncrementalProgram.step_statements; reference
    TableModifyStatement.java:35 — every table modify is
    retract + insert). The oracle replays the identical transaction in
    plain SQL over the same corpus; the multi-step NATIVE replay
    (DuckDB executing each statement, snapshot after every step) is
    pinned by test_program_compiler.py::
    test_dedup_statement_sequence_native_replay. Maintenance cost per
    statement rides the statement's matched slice through the
    incremental join circuit, not the corpus."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    inc = IncrementalProgram(spark, _DEDUP_STMT_PROGRAM, optimize=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    inc.step({"docs": docs})
    inc.step_statements(_DEDUP_STMT_STREAM)
    return inc.snapshot("dup_pairs").to_multiset_df().select("id_a", "id_b")
