"""CREATE RECURSIVE VIEW: semi-naive fixpoint evaluation.

Beyond the reference compiler's surface (no recursive queries in
doc/sql/) but inside the DBSP theory it implements — Budiu et al.
(VLDB'23) §6 builds recursive circuits as fixpoints of distinct.
Batch evaluation, incremental maintenance (recompute-per-step with
delta outputs), termination on cyclic graphs, the non-linear path,
and the UNION ALL rejection are all pinned here.
"""

from __future__ import annotations

import pytest

from sql_to_dbsp_compiler_spark.compiler.program import (
    IncrementalProgram,
    SqlProgram,
    compile_batch,
    compile_streaming,
)

CYCLIC = """
CREATE TABLE edge(src INTEGER, dst INTEGER);
INSERT INTO edge VALUES (0,1),(1,2),(2,3),(3,1),(5,6);
CREATE RECURSIVE VIEW reach AS
SELECT src, dst FROM edge WHERE src = 0
UNION
SELECT r.src, e.dst FROM reach r, edge e WHERE r.dst = e.src;
"""


def test_parse_flags_recursive():
    prog = SqlProgram.parse(CYCLIC)
    assert prog.views[0].recursive
    assert prog.views[0].name == "reach"


def test_batch_fixpoint_terminates_on_cycle(spark):
    out = compile_batch(spark, CYCLIC)
    rows = sorted((r.src, r.dst) for r in out["reach"].collect())
    # 1→2→3→1 is a cycle; set semantics close it after 3 rounds
    assert rows == [(0, 1), (0, 2), (0, 3)]


def test_downstream_view_composes_over_fixpoint(spark):
    prog = CYCLIC + "CREATE VIEW reach_count AS SELECT COUNT(*) AS n FROM reach;"
    out = compile_batch(spark, prog)
    assert out["reach_count"].collect()[0].n == 3


def test_nonlinear_recursion_rejected(spark):
    # reach⋈reach (two self-references): working-table semantics and
    # fixpoint semantics disagree (doubling misses odd path lengths
    # under the standard's binding), so — like Postgres — reject
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    INSERT INTO edge VALUES (1,2),(2,3),(3,4),(4,5);
    CREATE RECURSIVE VIEW tc AS
    SELECT src, dst FROM edge
    UNION
    SELECT a.src, b.dst FROM tc a, tc b WHERE a.dst = b.src;
    """
    with pytest.raises(ValueError, match="only once"):
        compile_batch(spark, prog)


def test_nonmonotone_recursive_term_rejected(spark):
    # aggregates / NOT IN inside a recursive term have no defined
    # meaning under working-table binding — rejected like mainstream
    # engines, with a pointer to move them downstream
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW r AS
    SELECT src, dst FROM edge WHERE src = 0
    UNION
    SELECT r2.src, max(e.dst) AS dst FROM r r2, edge e WHERE r2.dst = e.src;
    """
    with pytest.raises(ValueError, match="not allowed in"):
        compile_batch(spark, prog)
    prog2 = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE TABLE blocked(n INTEGER);
    CREATE RECURSIVE VIEW r AS
    SELECT src, dst FROM edge WHERE src = 0
    UNION
    SELECT r2.src, e.dst FROM r r2, edge e
    WHERE r2.dst = e.src AND e.dst NOT IN (SELECT n FROM blocked);
    """
    with pytest.raises(ValueError, match="not allowed in"):
        compile_batch(spark, prog2)


def test_union_all_recursion_rejected(spark):
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW r AS
    SELECT src, dst FROM edge UNION ALL
    SELECT a.src, e.dst FROM r a, edge e WHERE a.dst = e.src;
    """
    with pytest.raises(ValueError, match="UNION ALL recursion"):
        compile_batch(spark, prog)


def test_no_base_term_rejected(spark):
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW r AS SELECT a.src, a.dst FROM r a;
    """
    with pytest.raises(ValueError, match="UNION"):
        compile_batch(spark, prog)


def test_streaming_rejects_recursive(spark):
    with pytest.raises(ValueError, match="recursive view"):
        compile_streaming(spark, CYCLIC, stream_sources={})


@pytest.mark.slow
def test_incremental_maintains_fixpoint_with_deletes(spark):
    """Optimized flag on: the recursive view reports the
    recursive-fixpoint plan kind and its per-step deltas integrate to
    the batch fixpoint after inserts AND a retraction."""
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW reach AS
    SELECT src, dst FROM edge WHERE src = 0
    UNION
    SELECT r.src, e.dst FROM reach r, edge e WHERE r.dst = e.src;
    """
    ip = IncrementalProgram(spark, prog, optimize=True)
    assert ip.plan()["reach"] == "recursive-fixpoint"

    def zs(rows, w=1):
        from sql_to_dbsp_compiler_spark.plans.zset import ZSet

        df = spark.createDataFrame(rows, "src int, dst int")
        return ZSet.from_df(df) if w == 1 else ZSet.from_df(df).neg()

    d0 = ip.step({"edge": zs([(0, 1), (1, 2)])})
    assert sorted((r.src, r.dst) for r in d0["reach"].df.collect()) == [(0, 1), (0, 2)]
    d1 = ip.step({"edge": zs([(2, 7)])})
    assert sorted((r.src, r.dst) for r in d1["reach"].df.collect()) == [(0, 7)]
    # retract the middle edge: everything downstream of it disappears
    d2 = ip.step({"edge": zs([(1, 2)], w=-1)})
    got = sorted((r.src, r.dst, r["__weight"]) for r in d2["reach"].df.collect())
    assert got == [(0, 2, -1), (0, 7, -1)]
    snap = sorted(
        (r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect()
    )
    assert snap == [(0, 1)]


@pytest.mark.slow
def test_warm_start_matches_cold_recompute(spark):
    """Insert-only delta sequence: the warm-started fixpoint (DBSP
    delta-rule seed from the previous total) must equal a from-scratch
    IncrementalProgram fed the same data in one step — and the warm
    path must actually have been taken."""
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW reach AS
    SELECT src, dst FROM edge WHERE src = 0
    UNION
    SELECT r.src, e.dst FROM reach r, edge e WHERE r.dst = e.src;
    """
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    batches = [
        [(0, 1), (1, 2)],
        [(2, 3), (3, 4)],
        [(4, 1)],          # closes a cycle
        [(0, 9), (9, 2)],  # second root path into the cycle
    ]
    inc = IncrementalProgram(spark, prog, optimize=True)
    for b in batches:
        inc.step({"edge": ZSet.from_df(spark.createDataFrame(b, "src int, dst int"))})
    # first step has no previous fixpoint; the other three warm-start
    assert inc.recursive_warm_steps == len(batches) - 1

    cold = IncrementalProgram(spark, prog, optimize=True)
    allrows = [r for b in batches for r in b]
    cold.step({"edge": ZSet.from_df(spark.createDataFrame(allrows, "src int, dst int"))})
    warm_rows = sorted(
        (r.src, r.dst) for r in inc.snapshot("reach").to_multiset_df().collect()
    )
    cold_rows = sorted(
        (r.src, r.dst) for r in cold.snapshot("reach").to_multiset_df().collect()
    )
    assert warm_rows == cold_rows and len(warm_rows) > 0


def test_incremental_rejects_bad_recursion_at_construction(spark):
    """Malformed recursive views fail at IncrementalProgram
    construction, not on the first step."""
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW tc AS
    SELECT src, dst FROM edge
    UNION
    SELECT a.src, b.dst FROM tc a, tc b WHERE a.dst = b.src;
    """
    with pytest.raises(ValueError, match="only once"):
        IncrementalProgram(spark, prog, optimize=True)


def test_incremental_rejects_colliding_recursive_cte(spark):
    """A set-UNION recursive CTE whose name collides with a table
    cannot be expanded; construction fails with a rename hint instead
    of every step() raising Spark's unsupported-recursion error."""
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE TABLE reach(src INTEGER, dst INTEGER);
    CREATE VIEW v AS
    WITH RECURSIVE reach AS (
        SELECT src, dst FROM edge WHERE src = 0
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edge e ON r.dst = e.src)
    SELECT dst FROM reach;
    """
    with pytest.raises(ValueError, match="rename the CTE"):
        IncrementalProgram(spark, prog, optimize=True)


@pytest.mark.slow
def test_deep_recursion_respects_max_iters(spark):
    """max_iters is plumbed through compile_batch: a chain deeper than
    the bound raises, a raised bound succeeds."""
    rows = ", ".join(f"({i},{i + 1})" for i in range(250))
    prog = f"""
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    INSERT INTO edge VALUES {rows};
    CREATE RECURSIVE VIEW reach AS
    SELECT src, dst FROM edge WHERE src = 0
    UNION
    SELECT r.src, e.dst FROM reach r, edge e WHERE r.dst = e.src;
    """
    with pytest.raises(RuntimeError, match="no fixpoint"):
        compile_batch(spark, prog, max_iters=20)


def test_with_recursive_cte_union_set_in_view(spark):
    """WITH RECURSIVE ... UNION (set) inside an ordinary CREATE VIEW:
    Spark 4.x rejects the set form natively
    (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so compile_batch expands
    the CTE and runs our fixpoint — terminating on the cycle."""
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    INSERT INTO edge VALUES (0,1),(1,2),(2,3),(3,1);
    CREATE VIEW v AS
    WITH RECURSIVE reach AS (
        SELECT src, dst FROM edge WHERE src = 0
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edge e ON r.dst = e.src)
    SELECT dst FROM reach;
    """
    out = compile_batch(spark, prog)
    assert sorted(r.dst for r in out["v"].collect()) == [1, 2, 3]


def test_with_recursive_cte_union_all_native(spark):
    """UNION ALL recursion on acyclic data passes through to Spark's
    native recursive CTE — both engines agree it's a bag fixpoint."""
    prog = """
    CREATE TABLE seed(x INTEGER);
    INSERT INTO seed VALUES (1);
    CREATE VIEW v AS
    WITH RECURSIVE n AS (
        SELECT x FROM seed
        UNION ALL
        SELECT x + 1 AS x FROM n WHERE x < 5)
    SELECT x FROM n;
    """
    out = compile_batch(spark, prog)
    assert sorted(r.x for r in out["v"].collect()) == [1, 2, 3, 4, 5]


def test_incremental_with_recursive_cte(spark):
    """The CTE decomposition marks a recursive CTE as a hidden
    recursive view: IncrementalProgram maintains the outer view across
    deltas and the plan shows the fixpoint kind for the hidden CTE."""
    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE VIEW v AS
    WITH RECURSIVE reach AS (
        SELECT src, dst FROM edge WHERE src = 0
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edge e ON r.dst = e.src)
    SELECT dst FROM reach;
    """
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    inc = IncrementalProgram(spark, prog, optimize=True)
    assert inc.plan().get("reach") == "recursive-fixpoint", inc.plan()
    inc.step({"edge": ZSet.from_df(spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int"))})
    d = inc.step({"edge": ZSet.from_df(spark.createDataFrame([(2, 0)], "src int, dst int"))})
    assert sorted(r.dst for r in d["v"].df.collect()) == [0]
    snap = sorted(r.dst for r in inc.snapshot("v").to_multiset_df().collect())
    assert snap == [0, 1, 2]
    assert "reach" not in inc.step({})  # hidden CTE is not an output


@pytest.mark.slow
def test_recursive_view_driven_by_stream(spark, tmp_path):
    """Continuous transitive closure: a recursive view maintained by
    run_program_on_stream — each micro-batch of edges is an insert
    Z-set delta, warm-starting the fixpoint from the previous total;
    the final snapshot equals the batch fixpoint over all edges."""
    import glob
    import os
    import shutil

    from pyspark.sql.types import StructType

    from sql_to_dbsp_compiler_spark.streaming.incremental import (
        run_program_on_stream,
        stream_from_dir,
    )

    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW reach AS
    SELECT src, dst FROM edge WHERE src = 0
    UNION
    SELECT r.src, e.dst FROM reach r, edge e WHERE r.dst = e.src;
    """
    batches = [[(0, 1), (1, 2)], [(2, 3)], [(3, 1), (0, 9)]]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, b in enumerate(batches):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(b, "src int, dst int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0],
                    os.path.join(flat, f"batch_{i}.parquet"))
    schema = StructType.fromDDL("src int, dst int")
    inc = run_program_on_stream(
        spark, prog, "edge", stream_from_dir(spark, flat, schema)
    )
    assert inc.plan()["reach"] == "recursive-fixpoint"
    assert inc.recursive_warm_steps >= 1  # later micro-batches warm-start
    got = sorted(
        (r.src, r.dst) for r in inc.snapshot("reach").to_multiset_df().collect()
    )
    # closure from 0 over edges {0->1,1->2,2->3,3->1,0->9}
    assert got == [(0, 1), (0, 2), (0, 3), (0, 9)]


REACH_PROG = """
CREATE TABLE edge(src INTEGER, dst INTEGER);
CREATE RECURSIVE VIEW reach AS
SELECT src, dst FROM edge WHERE src = 0
UNION
SELECT r.src, e.dst FROM reach r, edge e WHERE r.dst = e.src;
"""


def _zs(spark, rows, w=1):
    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    df = spark.createDataFrame(rows, "src int, dst int")
    return ZSet.from_df(df) if w == 1 else ZSet.from_df(df).neg()


@pytest.mark.slow
def test_counting_used_for_retraction_steps(spark):
    """The delete step of the canonical scenario now goes through
    counting-based maintenance (derivation-count Z-set weights), not
    DRed and not cold recompute — and the counts state is exact."""
    ip = IncrementalProgram(spark, REACH_PROG, optimize=True)
    ip.step({"edge": _zs(spark, [(0, 1), (1, 2), (2, 3)])})
    assert ip.recursive_counting_steps == 0
    ip.step({"edge": _zs(spark, [(1, 2)], w=-1)})
    assert ip.recursive_counting_steps == 1
    assert ip.recursive_dred_steps == 0
    snap = sorted((r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect())
    assert snap == [(0, 1)]
    counts = sorted(tuple(r) for r in ip._rec_counts["reach"].df.collect())
    assert counts == [(0, 1, 1)]


def test_dred_used_when_counting_disabled(spark):
    """DRed remains the retraction fallback: with counting pinned off
    for the view, the delete step goes through delete-and-rederive
    with identical results."""
    ip = IncrementalProgram(spark, REACH_PROG, optimize=True)
    ip._rec_count_failed.add("reach")
    ip.step({"edge": _zs(spark, [(0, 1), (1, 2), (2, 3)])})
    ip.step({"edge": _zs(spark, [(1, 2)], w=-1)})
    assert ip.recursive_dred_steps == 1
    assert ip.recursive_counting_steps == 0
    snap = sorted((r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect())
    assert snap == [(0, 1)]


@pytest.mark.slow
def test_counting_alternate_support_diamond(spark):
    """The alternate-support acid test under counting: deleting one
    edge of a diamond decrements the count of facts on the shared
    suffix from 2 to 1 — they stay in the view, the emitted delta is
    EMPTY, and no rederivation pass ever runs."""
    ip = IncrementalProgram(spark, REACH_PROG, optimize=True)
    # diamond: 0->1->3 and 0->2->3, then 3->4
    ip.step({"edge": _zs(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])})
    d = ip.step({"edge": _zs(spark, [(1, 3)], w=-1)})
    assert ip.recursive_counting_steps == 1
    assert d["reach"].df.count() == 0
    snap = sorted((r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect())
    assert snap == [(0, 1), (0, 2), (0, 3), (0, 4)]
    counts = {(r.src, r.dst): r["__weight"] for r in ip._rec_counts["reach"].df.collect()}
    # both survivors on the shared suffix went 2 -> 1
    assert counts == {(0, 1): 1, (0, 2): 1, (0, 3): 1, (0, 4): 1}


def test_dred_rederives_alternate_support(spark):
    """The DRed acid test (counting pinned off): deleting one edge of
    a diamond must NOT drop facts that survive via the other path
    (pure overdeletion without rederivation would)."""
    ip = IncrementalProgram(spark, REACH_PROG, optimize=True)
    ip._rec_count_failed.add("reach")
    ip.step({"edge": _zs(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])})
    d = ip.step({"edge": _zs(spark, [(1, 3)], w=-1)})
    assert ip.recursive_dred_steps == 1
    # (0,3) and (0,4) survive via 0->2->3; delta must be EMPTY
    assert d["reach"].df.count() == 0
    snap = sorted((r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect())
    assert snap == [(0, 1), (0, 2), (0, 3), (0, 4)]


@pytest.mark.slow
def test_counting_cycle_diverges_to_dred(spark):
    """Cyclic derivations: the count fixpoint cannot terminate; the
    stall detector abandons counting quickly, marks the view failed
    permanently, and the step lands on DRed with correct results."""
    ip = IncrementalProgram(spark, REACH_PROG, optimize=True)
    ip.step({"edge": _zs(spark, [(0, 1), (1, 2), (2, 1)])})
    ip.step({"edge": _zs(spark, [(0, 1)], w=-1)})
    assert "reach" in ip._rec_count_failed
    assert ip.recursive_counting_steps == 0
    assert ip.recursive_dred_steps >= 1
    assert ip.snapshot("reach").to_multiset_df().count() == 0
    # later retractions don't retry counting
    ip.step({"edge": _zs(spark, [(0, 2)])})
    ip.step({"edge": _zs(spark, [(0, 2)], w=-1)})
    assert ip.recursive_counting_steps == 0


@pytest.mark.slow
def test_counting_stays_fresh_across_insert_steps(spark):
    """Once initialized, counting sees every subsequent step (an
    insert-only step must keep derivation counts fresh, or a later
    retraction would be wrong)."""
    ip = IncrementalProgram(spark, REACH_PROG, optimize=True)
    ip.step({"edge": _zs(spark, [(0, 1), (1, 2)])})
    ip.step({"edge": _zs(spark, [(1, 2)], w=-1)})      # init + retract
    ip.step({"edge": _zs(spark, [(1, 5), (5, 2), (0, 5)])})  # insert via counting
    assert ip.recursive_counting_steps == 2
    counts = {(r.src, r.dst): r["__weight"] for r in ip._rec_counts["reach"].df.collect()}
    # (0,5) has two derivations: base edge 0->5 and path 0->1->5
    assert counts == {(0, 1): 1, (0, 5): 2, (0, 2): 2}
    # retract the direct edge: (0,5)/(0,2) drop to 1, stay in the view
    d = ip.step({"edge": _zs(spark, [(0, 5)], w=-1)})
    assert d["reach"].df.count() == 0
    snap = sorted((r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect())
    assert snap == [(0, 1), (0, 2), (0, 5)]


@pytest.mark.slow
def test_counting_randomized_acyclic_matches_cold(spark):
    """Property test: seeded random insert/delete steps on ACYCLIC
    graphs (edges only i -> j with i < j) — counting stays eligible
    throughout, and after every step the maintained snapshot equals a
    fresh cold evaluation over the live edge set."""
    import random

    rng = random.Random(7)
    ip = IncrementalProgram(spark, REACH_PROG, optimize=True)
    live: set[tuple[int, int]] = set()
    for stepno in range(5):
        inserts = set()
        while len(inserts) < 4:
            i, j = rng.randrange(7), rng.randrange(7)
            if i != j and (min(i, j), max(i, j)) not in live:
                inserts.add((min(i, j), max(i, j)))
        deletes = set(rng.sample(sorted(live), min(2, len(live)))) if live else set()
        live = (live - deletes) | inserts
        delta = _zs(spark, sorted(inserts))
        if deletes:
            delta = delta.add(_zs(spark, sorted(deletes), w=-1))
        ip.step({"edge": delta})
        cold = IncrementalProgram(spark, REACH_PROG, optimize=True)
        cold.step({"edge": _zs(spark, sorted(live))})
        got = sorted(
            (r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect()
        )
        want = sorted(
            (r.src, r.dst) for r in cold.snapshot("reach").to_multiset_df().collect()
        )
        assert got == want, f"step {stepno}: {got} != {want}"
    assert "reach" not in ip._rec_count_failed
    assert ip.recursive_counting_steps >= 4  # every step after the first


@pytest.mark.slow
def test_dred_randomized_matches_cold(spark):
    """Property test: a seeded random sequence of mixed insert/delete
    steps on a random graph — after every step the DRed-maintained
    snapshot must equal a fresh cold evaluation over the current edge
    set."""
    import random

    from sql_to_dbsp_compiler_spark.plans.zset import ZSet

    prog = """
    CREATE TABLE edge(src INTEGER, dst INTEGER);
    CREATE RECURSIVE VIEW reach AS
    SELECT src, dst FROM edge WHERE src < 2
    UNION
    SELECT r.src, e.dst FROM reach r, edge e WHERE r.dst = e.src;
    """
    rng = random.Random(42)
    ip = IncrementalProgram(spark, prog, optimize=True)
    live: set[tuple[int, int]] = set()
    for stepno in range(6):
        inserts = set()
        while len(inserts) < 4:
            cand = (rng.randrange(8), rng.randrange(8))
            if cand not in live:
                inserts.add(cand)
        deletes = set(rng.sample(sorted(live), min(2, len(live)))) if live else set()
        live = (live - deletes) | inserts
        delta = ZSet.from_df(
            spark.createDataFrame(sorted(inserts), "src int, dst int")
        )
        if deletes:
            delta = delta.add(
                ZSet.from_df(
                    spark.createDataFrame(sorted(deletes), "src int, dst int")
                ).neg()
            )
        ip.step({"edge": delta})
        cold = IncrementalProgram(spark, prog, optimize=True)
        cold.step(
            {"edge": ZSet.from_df(spark.createDataFrame(sorted(live), "src int, dst int"))}
        )
        got = sorted(
            (r.src, r.dst) for r in ip.snapshot("reach").to_multiset_df().collect()
        )
        want = sorted(
            (r.src, r.dst) for r in cold.snapshot("reach").to_multiset_df().collect()
        )
        assert got == want, f"step {stepno}: {got} != {want}"
    # most steps carried deletes; each lands on counting when the
    # random graph stays acyclic-derivable, on DRed after divergence
    assert ip.recursive_dred_steps + ip.recursive_counting_steps >= 4


@pytest.mark.slow
def test_counting_survives_save_restore(spark, tmp_path):
    """Counting state is derived, not persisted: after save_state →
    restore (bootstrap insert-only replay), the next retraction
    re-initializes the derivation counts lazily and stays correct —
    the durability story for counting-maintained recursive views."""
    live = IncrementalProgram(spark, REACH_PROG, optimize=True)
    live.step({"edge": _zs(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])})
    live.step({"edge": _zs(spark, [(3, 4)], w=-1)})  # init counts
    assert live.recursive_counting_steps == 1
    state = str(tmp_path / "state")
    live.save_state(state)

    restored = IncrementalProgram.restore(spark, REACH_PROG, state)
    assert "reach" not in restored._rec_counts  # derived state rebuilt lazily
    # retraction after restore: counting re-initializes over the
    # restored world and the alternate-support semantics still hold
    d = restored.step({"edge": _zs(spark, [(1, 3)], w=-1)})
    assert restored.recursive_counting_steps >= 1
    assert d["reach"].df.count() == 0  # (0,3) survives via 0->2->3
    snap = sorted(
        (r.src, r.dst) for r in restored.snapshot("reach").to_multiset_df().collect()
    )
    assert snap == [(0, 1), (0, 2), (0, 3)]
