"""Guards on the driver contract file itself: every queries() entry
callable, oracle keys ⊆ query keys, entry() produces rows with a
stable schema across calls."""

from __future__ import annotations

import importlib
import sys


def _entry_mod():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_contract_shape(spark):
    m = _entry_mod()
    qs, oracles = m.queries(), m.oracle_sql()
    assert len(qs) >= 100
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_runs_and_schema_stable(spark):
    m = _entry_mod()
    df1 = m.entry(spark)
    df2 = m.entry(spark)
    assert df1.schema == df2.schema
    assert len(df1.take(1)) == 1
