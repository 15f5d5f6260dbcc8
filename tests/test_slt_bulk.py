"""Bulk sqllogictest-style dual-engine validation (reference:
DBSP_JDBC_Executor.java:55 runs the public SLT corpus through a
JDBC-validated executor; README.md:252). A seeded grammar generates
~1000 expressions + dozens of statements in the Spark∩DuckDB dialect
subset; every one executes on both engines over identical fixture
tables and must agree value-for-value. A third pass routes a bulk of
CREATE VIEW programs through the incremental program frontend and
checks each view snapshot against DuckDB. A fourth pass routes the
ENTIRE statement bank through the incremental frontend and re-checks
every snapshot after a delete+insert mutation step — incremental
maintenance under retraction at SLT breadth."""

from __future__ import annotations

import duckdb
import pytest

from sql_to_dbsp_compiler_spark.compiler.slt import (
    T_ROWS,
    U_ROWS,
    make_fixture,
    run_expression_batches,
    run_statements,
    slt_expressions,
    slt_statements,
    to_duck_dialect,
    to_spark_dialect,
)


@pytest.fixture(scope="module")
def duck(spark):
    con = duckdb.connect()
    make_fixture(spark, con)
    yield con
    con.close()


def test_slt_expression_bulk(spark, duck):
    exprs = slt_expressions(seed=7, n=1000)
    assert len(exprs) == 1000
    mism = run_expression_batches(spark, duck, exprs)
    msg = "\n".join(f"  {m.sql}: {m.detail}" for m in mism[:10])
    assert not mism, f"{len(mism)} expression divergences:\n{msg}"


@pytest.mark.slow
def test_slt_statement_bulk(spark, duck):
    stmts = slt_statements(seed=11)
    assert len(stmts) >= 25
    mism = run_statements(spark, duck, stmts)
    msg = "\n".join(f"  {m.sql}: {m.detail}" for m in mism[:10])
    assert not mism, f"{len(mism)} statement divergences:\n{msg}"


def test_slt_views_through_program_frontend(spark, duck):
    """Bulk CREATE VIEW program through compiler/program.py: one
    program, many views of different recognizer shapes, one full-data
    step; every snapshot must equal DuckDB on the same SQL."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    views = {
        "v_lin": "SELECT id, a + b AS ab FROM t WHERE a > 0",
        "v_proj": "SELECT id, upper(coalesce(s, '')) AS su FROM t",
        "v_agg": "SELECT sign(a) AS g, sum(b) AS sb, count(*) AS n FROM t GROUP BY sign(a)",
        "v_hav": "SELECT b AS g, count(*) AS n FROM t GROUP BY b HAVING count(*) > 1",
        "v_hidden_hav": "SELECT a AS g, sum(b) AS sb FROM t GROUP BY a HAVING count(*) >= 1",
        "v_join": "SELECT t.id, u.v FROM t JOIN u ON t.id = u.k",
        "v_join_agg": "SELECT u.tag AS tag, sum(t.a) AS sa FROM t JOIN u ON t.id = u.k GROUP BY u.tag",
        "v_distinct": "SELECT DISTINCT sign(a) AS sg FROM t",
        "v_union": "SELECT id FROM t WHERE a > 0 UNION SELECT k AS id FROM u",
        "v_minmax": "SELECT b AS g, min(a) AS mn, max(a) AS mx FROM t GROUP BY b",
        "v_win": "SELECT id, a, row_number() OVER (PARTITION BY sign(a) ORDER BY id) AS rn FROM t",
        "v_case": "SELECT id, CASE WHEN a > b THEN 'gt' WHEN a = b THEN 'eq' ELSE 'lt' END AS cmp FROM t WHERE a IS NOT NULL AND b IS NOT NULL",
    }
    ddl = (
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        + "\n".join(
            f"CREATE VIEW {name} AS {to_spark_dialect(sql)};" for name, sql in views.items()
        )
    )
    inc = IncrementalProgram(spark, ddl, optimize=True)
    deltas = {
        "t": ZSet(
            spark.createDataFrame(
                [(*r, 1) for r in T_ROWS],
                "id int, a int, b int, s string, d double, ts timestamp, __weight long",
            )
        ),
        "u": ZSet(
            spark.createDataFrame(
                [(*r, 1) for r in U_ROWS], "k int, v int, tag string, __weight long"
            )
        ),
    }
    inc.step(deltas)
    from sql_to_dbsp_compiler_spark.compiler.slt import _row_key

    fails = []
    for name, sql in views.items():
        got = sorted(
            (tuple(r) for r in inc.snapshot(name).to_multiset_df().collect()),
            key=_row_key,
        )
        want = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=_row_key)
        if got != want:
            fails.append(f"{name}: spark={got[:3]} duck={want[:3]}")
    assert not fails, "\n".join(fails)


@pytest.mark.slow
def test_slt_statements_through_program_incremental(spark):
    """The WHOLE generated SLT statement bank as CREATE VIEWs through
    the incremental program frontend (optimized recognizers + naive
    D∘Q∘I fallback), checked against DuckDB TWICE: after the initial
    insert step and again after a mutation step (deletes + inserts on
    both base tables, mirrored on the DuckDB side). This is the SLT ×
    incremental gate: every statement shape must be maintained
    correctly under retraction, whichever circuit the recognizer
    picked."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.compiler.slt import _row_key
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    con = duckdb.connect()
    make_fixture(spark, con)
    stmts = slt_statements(seed=11)
    views = {f"v{i}": sql for i, sql in enumerate(stmts)}
    ddl = (
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), "
        "d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        + "\n".join(
            f"CREATE VIEW {n} AS {to_spark_dialect(sql)};" for n, sql in views.items()
        )
    )
    inc = IncrementalProgram(spark, ddl, optimize=True, checkpoint_every=1)

    t_schema = "id int, a int, b int, s string, d double, ts timestamp, __weight long"
    u_schema = "k int, v int, tag string, __weight long"

    def check(tag):
        fails = []
        for name, sql in views.items():
            got = sorted(
                (tuple(r) for r in inc.snapshot(name).to_multiset_df().collect()),
                key=_row_key,
            )
            want = sorted((tuple(r) for r in con.execute(to_duck_dialect(sql)).fetchall()), key=_row_key)
            if got != want:
                fails.append(f"[{tag}] {name} ({sql[:60]}...): spark={got[:3]} duck={want[:3]}")
        assert not fails, f"{len(fails)} divergences:\n" + "\n".join(fails[:8])

    inc.step({
        "t": ZSet(spark.createDataFrame([(*r, 1) for r in T_ROWS], t_schema)),
        "u": ZSet(spark.createDataFrame([(*r, 1) for r in U_ROWS], u_schema)),
    })
    check("insert")

    # mutation: retract three t rows and one u row, add fresh rows
    # (NULL-bearing and group-flipping) — mirror on DuckDB
    import datetime as dt

    t_del = [r for r in T_ROWS if r[0] in (2, 5, 9)]
    t_new = [
        (13, None, -2, "zz''q", 0.5, dt.datetime(2023, 8, 1, 1, 2, 3)),
        (14, 3, 3, None, None, None),
    ]
    u_del = [r for r in U_ROWS if r[0] == 3]
    u_new = [(9, 90, "w"), (4, None, None)]
    inc.step({
        "t": ZSet(spark.createDataFrame(
            [(*r, -1) for r in t_del] + [(*r, 1) for r in t_new], t_schema)),
        "u": ZSet(spark.createDataFrame(
            [(*r, -1) for r in u_del] + [(*r, 1) for r in u_new], u_schema)),
    })
    con.execute("DELETE FROM t WHERE id IN (2, 5, 9)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", t_new)
    con.execute("DELETE FROM u WHERE k = 3")
    con.executemany("INSERT INTO u VALUES (?,?,?)", u_new)
    check("mutate")
    con.close()


@pytest.mark.slow
def test_slt_random_statements_through_program_incremental(spark):
    """A seeded sample of the RANDOM statement pool as CREATE VIEWs
    through IncrementalProgram — the random shapes (grouped aggregates
    with DISTINCT, joins, windows, set-op chains, [NOT] IN / EXISTS /
    scalar subqueries, ordered limits) exercise whichever circuit the
    recognizer picks, checked against DuckDB after an insert step AND
    a delete+insert mutation step."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.compiler.slt import _row_key, slt_random_statements
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    con = duckdb.connect()
    make_fixture(spark, con)
    stmts = slt_random_statements(seed=41, n=60)
    assert len(stmts) >= 40
    views = {f"r{i}": sql for i, sql in enumerate(stmts)}
    ddl = (
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), "
        "d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        + "\n".join(
            f"CREATE VIEW {n} AS {to_spark_dialect(sql)};" for n, sql in views.items()
        )
    )
    inc = IncrementalProgram(spark, ddl, optimize=True, checkpoint_every=1)
    # the seeded pool must actually exercise the r5 range circuits —
    # not just hand-picked bank statements (VERDICT r5 item 7)
    kinds = set(inc.plan().values())
    assert kinds & {
        "range-semi-join-decorrelated",
        "range-anti-join-decorrelated",
        "range-scalar-agg",
    }, f"no range circuit recognized in the seeded pool: {kinds}"

    t_schema = "id int, a int, b int, s string, d double, ts timestamp, __weight long"
    u_schema = "k int, v int, tag string, __weight long"

    def check(tag):
        fails = []
        for name, sql in views.items():
            got = sorted(
                (tuple(r) for r in inc.snapshot(name).to_multiset_df().collect()),
                key=_row_key,
            )
            want = sorted((tuple(r) for r in con.execute(to_duck_dialect(sql)).fetchall()), key=_row_key)
            if got != want:
                fails.append(f"[{tag}] {name} ({sql[:60]}...): spark={got[:3]} duck={want[:3]}")
        assert not fails, f"{len(fails)} divergences:\n" + "\n".join(fails[:8])

    inc.step({
        "t": ZSet(spark.createDataFrame([(*r, 1) for r in T_ROWS], t_schema)),
        "u": ZSet(spark.createDataFrame([(*r, 1) for r in U_ROWS], u_schema)),
    })
    check("insert")

    import datetime as dt

    t_del = [r for r in T_ROWS if r[0] in (3, 7, 11)]
    t_new = [
        (15, -2, None, "it''s b", -0.25, dt.datetime(2024, 1, 5, 6, 7, 8)),
        (16, None, 4, "", 2.0, None),
    ]
    u_del = [r for r in U_ROWS if r[0] == 5]
    u_new = [(11, 40, "x"), (6, None, "q")]
    inc.step({
        "t": ZSet(spark.createDataFrame(
            [(*r, -1) for r in t_del] + [(*r, 1) for r in t_new], t_schema)),
        "u": ZSet(spark.createDataFrame(
            [(*r, -1) for r in u_del] + [(*r, 1) for r in u_new], u_schema)),
    })
    con.execute("DELETE FROM t WHERE id IN (3, 7, 11)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", t_new)
    con.execute("DELETE FROM u WHERE k = 5")
    con.executemany("INSERT INTO u VALUES (?,?,?)", u_new)
    check("mutate")
    con.close()


@pytest.mark.slow
def test_slt_random_statement_bulk(spark):
    """SQLsmith-lite pass: 150 seeded random statements composed from
    the shared-dialect pools, each run on both engines and compared
    value-for-value (order-insensitive with a total-order key).

    Self-contained fixture (not the module one): earlier tests route
    programs through IncrementalProgram, which re-binds the t/u Spark
    temp views; make_fixture restores them."""
    from sql_to_dbsp_compiler_spark.compiler.slt import slt_random_statements

    con = duckdb.connect()
    make_fixture(spark, con)
    stmts = slt_random_statements(seed=23, n=250)
    assert len(stmts) >= 170
    mism = run_statements(spark, con, stmts)
    msg = "\n".join(f"  {m.sql}: {m.detail}" for m in mism[:10])
    assert not mism, f"{len(mism)} random-statement divergences:\n{msg}"
    con.close()


@pytest.mark.slow
def test_slt_statements_maintained_through_statement_protocol(spark):
    """The SLT × incremental gate driven by the STATEMENT protocol
    (r6 step_statements) instead of hand-built deltas: the whole
    generated statement bank is maintained through a
    DELETE + UPDATE + INSERT + MERGE transaction whose Spark-side
    deltas are DERIVED from integrated state, with the identical
    mutations executed natively in DuckDB (MERGE mirrored as
    UPDATE+guarded-INSERT — DuckDB 1.0 has no MERGE), and every view
    snapshot re-compared. Catches any divergence between derived
    statement deltas and true table semantics across all recognized
    circuit kinds at once."""
    import datetime as dt  # noqa: F401  (timestamp literal goes via SQL)

    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.compiler.slt import _row_key
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    con = duckdb.connect()
    make_fixture(spark, con)
    stmts = slt_statements(seed=11)
    views = {f"v{i}": sql for i, sql in enumerate(stmts)}
    ddl = (
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), "
        "d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        + "\n".join(
            f"CREATE VIEW {n} AS {to_spark_dialect(sql)};" for n, sql in views.items()
        )
    )
    inc = IncrementalProgram(spark, ddl, optimize=True, checkpoint_every=1)
    t_schema = "id int, a int, b int, s string, d double, ts timestamp, __weight long"
    u_schema = "k int, v int, tag string, __weight long"
    inc.step({
        "t": ZSet(spark.createDataFrame([(*r, 1) for r in T_ROWS], t_schema)),
        "u": ZSet(spark.createDataFrame([(*r, 1) for r in U_ROWS], u_schema)),
    })

    inc.step_statements(
        "DELETE FROM t WHERE id IN (2, 5, 9);"
        "UPDATE t SET a = a + 1, b = -b WHERE a >= 4;"
        "INSERT INTO t VALUES (13, NULL, -2, 'zz''q', 0.5, "
        "TIMESTAMP '2023-08-01 01:02:03');"
        "MERGE INTO u USING (VALUES (3, 33, 'm'), (9, 90, 'w')) AS s(k, v, tag) "
        "ON u.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag "
        "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.v, s.tag);"
    )
    con.execute("DELETE FROM t WHERE id IN (2, 5, 9)")
    con.execute("UPDATE t SET a = a + 1, b = -b WHERE a >= 4")
    con.execute(
        "INSERT INTO t VALUES (13, NULL, -2, 'zz''q', 0.5, "
        "TIMESTAMP '2023-08-01 01:02:03')"
    )
    con.execute("UPDATE u SET v = 33, tag = 'm' WHERE k = 3")
    con.execute(
        "INSERT INTO u SELECT 9, 90, 'w' "
        "WHERE NOT EXISTS (SELECT 1 FROM u WHERE k = 9)"
    )

    fails = []
    for name, sql in views.items():
        got = sorted(
            (tuple(r) for r in inc.snapshot(name).to_multiset_df().collect()),
            key=_row_key,
        )
        want = sorted(
            (tuple(r) for r in con.execute(to_duck_dialect(sql)).fetchall()),
            key=_row_key,
        )
        if got != want:
            fails.append(f"{name} ({sql[:60]}...): spark={got[:3]} duck={want[:3]}")
    con.close()
    assert not fails, f"{len(fails)} divergences:\n" + "\n".join(fails[:8])


@pytest.mark.slow
def test_slt_statement_protocol_merge_subquery_and_by_source(spark):
    """The r7 MERGE surface through the statement-protocol × SLT gate:
    a SUBQUERY source over another program table (groupwise-max CDC
    dedup) with guarded matched UPDATE/DELETE, guarded NOT MATCHED
    insert, and BOTH NOT MATCHED BY SOURCE clause kinds. DuckDB 1.0
    has no MERGE; the mirror executes the standard's decomposition
    natively against a PRE-state snapshot (matched clauses first-match
    -wins, by-source classes key-disjoint from matched, inserts
    anti-joined against pre-merge contents), and every generated SLT
    view snapshot is re-compared afterwards."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.compiler.slt import _row_key
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    con = duckdb.connect()
    make_fixture(spark, con)
    stmts = slt_statements(seed=23)
    views = {f"v{i}": sql for i, sql in enumerate(stmts)}
    ddl = (
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), "
        "d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        + "\n".join(
            f"CREATE VIEW {n} AS {to_spark_dialect(sql)};" for n, sql in views.items()
        )
    )
    inc = IncrementalProgram(spark, ddl, optimize=True, checkpoint_every=1)
    t_schema = "id int, a int, b int, s string, d double, ts timestamp, __weight long"
    u_schema = "k int, v int, tag string, __weight long"
    inc.step({
        "t": ZSet(spark.createDataFrame([(*r, 1) for r in T_ROWS], t_schema)),
        "u": ZSet(spark.createDataFrame([(*r, 1) for r in U_ROWS], u_schema)),
    })

    inc.step_statements(
        "MERGE INTO u USING (SELECT id AS k2, MAX(a) AS a2 FROM t "
        "WHERE id <= 4 GROUP BY id) AS s "
        "ON u.k = s.k2 "
        "WHEN MATCHED AND s.a2 > 0 THEN UPDATE SET v = u.v + s.a2 "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED AND s.k2 % 2 = 0 THEN INSERT VALUES (s.k2, s.a2, 'n') "
        "WHEN NOT MATCHED BY SOURCE AND u.tag = 'x' THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'st';"
    )
    con.execute(
        "CREATE TEMP TABLE s_src AS SELECT id AS k2, MAX(a) AS a2 FROM t "
        "WHERE id <= 4 GROUP BY id"
    )
    con.execute("CREATE TEMP TABLE pre AS SELECT * FROM u")
    con.execute(
        "UPDATE u SET v = u.v + s.a2 FROM s_src s "
        "WHERE u.k = s.k2 AND s.a2 > 0"
    )
    con.execute(
        "DELETE FROM u USING s_src s "
        "WHERE u.k = s.k2 AND (s.a2 IS NULL OR s.a2 <= 0)"
    )
    con.execute(
        "DELETE FROM u WHERE u.tag = 'x' "
        "AND NOT EXISTS (SELECT 1 FROM s_src s WHERE s.k2 = u.k)"
    )
    con.execute(
        "UPDATE u SET tag = 'st' "
        "WHERE NOT EXISTS (SELECT 1 FROM s_src s WHERE s.k2 = u.k)"
    )
    con.execute(
        "INSERT INTO u SELECT k2, a2, 'n' FROM s_src s "
        "WHERE s.k2 % 2 = 0 "
        "AND NOT EXISTS (SELECT 1 FROM pre p WHERE p.k = s.k2)"
    )

    fails = []
    for name, sql in views.items():
        got = sorted(
            (tuple(r) for r in inc.snapshot(name).to_multiset_df().collect()),
            key=_row_key,
        )
        want = sorted(
            (tuple(r) for r in con.execute(to_duck_dialect(sql)).fetchall()),
            key=_row_key,
        )
        if got != want:
            fails.append(f"{name} ({sql[:60]}...): spark={got[:3]} duck={want[:3]}")
    con.close()
    assert not fails, f"{len(fails)} divergences:\n" + "\n".join(fails[:8])


_WF_SUBQ = (
    "SELECT k2, a2 FROM (SELECT id AS k2, a AS a2, "
    "ROW_NUMBER() OVER (ORDER BY a DESC NULLS LAST, id) AS rn FROM t) "
    "WHERE rn <= 3"
)
_WF_MERGE = (
    f"MERGE INTO u USING ({_WF_SUBQ}) AS s "
    'ON "u"."k" = s.k2 '
    'WHEN MATCHED AND s.a2 > 10 THEN UPDATE SET "v" = u.v + s.a2 '
    "WHEN MATCHED THEN DELETE "
    "WHEN NOT MATCHED AND s.k2 % 2 = 0 THEN INSERT VALUES (s.k2, s.a2, 'wf') "
    'WHEN NOT MATCHED BY SOURCE AND "u"."v" >= 20 THEN UPDATE SET tag = \'bs\';'
)


def _wf_merge_duck_mirror(con) -> None:
    """The standard's decomposition of _WF_MERGE executed natively in
    DuckDB against a pre-state snapshot (first-match-wins: the DELETE
    fires only when the first clause's guard is FALSE or UNKNOWN)."""
    con.execute(f"CREATE OR REPLACE TEMP TABLE s_src AS {_WF_SUBQ}")
    con.execute("CREATE OR REPLACE TEMP TABLE pre AS SELECT * FROM u")
    con.execute(
        "UPDATE u SET v = u.v + s.a2 FROM s_src s "
        "WHERE u.k = s.k2 AND s.a2 > 10"
    )
    con.execute(
        "DELETE FROM u USING s_src s "
        "WHERE u.k = s.k2 AND (s.a2 > 10) IS NOT TRUE"
    )
    con.execute(
        "UPDATE u SET tag = 'bs' WHERE v >= 20 "
        "AND NOT EXISTS (SELECT 1 FROM s_src s WHERE s.k2 = u.k)"
    )
    con.execute(
        "INSERT INTO u SELECT k2, a2, 'wf' FROM s_src s "
        "WHERE s.k2 % 2 = 0 "
        "AND NOT EXISTS (SELECT 1 FROM pre p WHERE p.k = s.k2)"
    )


@pytest.mark.slow
def test_slt_statement_protocol_merge_window_subquery_quoted_on(spark):
    """VERDICT r7 #8 shapes through the statement-protocol × SLT gate:
    a MERGE whose SUBQUERY source contains a WINDOW FUNCTION
    (ROW_NUMBER top-3 — the CDC 'latest/ranked slice' shape) and whose
    ON / guards / SET use double-QUOTED identifiers, mixed with a NOT
    MATCHED BY SOURCE clause. The identical transaction runs natively
    in DuckDB (standard's decomposition) and every generated SLT view
    snapshot is re-compared."""
    from sql_to_dbsp_compiler_spark.compiler.program import IncrementalProgram
    from sql_to_dbsp_compiler_spark.compiler.slt import _row_key
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    con = duckdb.connect()
    make_fixture(spark, con)
    stmts = slt_statements(seed=31)
    views = {f"v{i}": sql for i, sql in enumerate(stmts)}
    ddl = (
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), "
        "d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        + "\n".join(
            f"CREATE VIEW {n} AS {to_spark_dialect(sql)};" for n, sql in views.items()
        )
    )
    inc = IncrementalProgram(spark, ddl, optimize=True, checkpoint_every=1)
    inc.step({
        "t": ZSet(spark.createDataFrame(
            [(*r, 1) for r in T_ROWS],
            "id int, a int, b int, s string, d double, ts timestamp, __weight long",
        )),
        "u": ZSet(spark.createDataFrame(
            [(*r, 1) for r in U_ROWS], "k int, v int, tag string, __weight long"
        )),
    })
    inc.step_statements(_WF_MERGE)
    _wf_merge_duck_mirror(con)

    fails = []
    for name, sql in views.items():
        got = sorted(
            (tuple(r) for r in inc.snapshot(name).to_multiset_df().collect()),
            key=_row_key,
        )
        want = sorted(
            (tuple(r) for r in con.execute(to_duck_dialect(sql)).fetchall()),
            key=_row_key,
        )
        if got != want:
            fails.append(f"{name} ({sql[:60]}...): spark={got[:3]} duck={want[:3]}")
    con.close()
    assert not fails, f"{len(fails)} divergences:\n" + "\n".join(fails[:8])


def test_slt_dual_engine_merge_window_subquery_batch(spark):
    """The same r7-#8 MERGE through the BATCH frontend (compile_batch,
    dual-engine): the post-merge table contents must equal DuckDB's
    native decomposition row-for-row, and equal the statement-protocol
    frontend's snapshot — three engines, one answer."""
    from sql_to_dbsp_compiler_spark.compiler.program import (
        IncrementalProgram,
        compile_batch,
    )
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    con = duckdb.connect()
    make_fixture(spark, con)
    u_vals = ", ".join(
        "(%s, %s, %s)" % (
            k,
            "NULL" if v is None else v,
            "NULL" if tag is None else f"'{tag}'",
        )
        for k, v, tag in U_ROWS
    )
    prog = (
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), "
        "d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        "CREATE VIEW u_out AS SELECT k, v, tag FROM u;\n"
        f"INSERT INTO u VALUES {u_vals};\n" + _WF_MERGE
    )
    t_df = spark.createDataFrame(
        T_ROWS, "id int, a int, b int, s string, d double, ts timestamp"
    )
    got = sorted(
        (tuple(r) for r in compile_batch(spark, prog, sources={"t": t_df})["u_out"].collect()),
        key=lambda r: (r[0] is None, r[0]),
    )
    _wf_merge_duck_mirror(con)
    want = sorted(
        (tuple(r) for r in con.execute("SELECT k, v, tag FROM u").fetchall()),
        key=lambda r: (r[0] is None, r[0]),
    )
    con.close()
    assert got == want, f"batch={got} duck={want}"

    # third engine: the statement-protocol frontend on the same data
    inc = IncrementalProgram(
        spark,
        "CREATE TABLE t(id INTEGER, a INTEGER, b INTEGER, s VARCHAR(20), "
        "d DOUBLE, ts TIMESTAMP);\n"
        "CREATE TABLE u(k INTEGER, v INTEGER, tag VARCHAR(5));\n"
        "CREATE VIEW u_out AS SELECT k, v, tag FROM u;\n",
        optimize=True,
        checkpoint_every=1,
    )
    inc.step({
        "t": ZSet(spark.createDataFrame(
            [(*r, 1) for r in T_ROWS],
            "id int, a int, b int, s string, d double, ts timestamp, __weight long",
        )),
        "u": ZSet(spark.createDataFrame(
            [(*r, 1) for r in U_ROWS], "k int, v int, tag string, __weight long"
        )),
    })
    inc.step_statements(_WF_MERGE)
    got_inc = sorted(
        (tuple(r) for r in inc.snapshot("u_out").to_multiset_df().collect()),
        key=lambda r: (r[0] is None, r[0]),
    )
    assert got_inc == want, f"stmts={got_inc} duck={want}"
