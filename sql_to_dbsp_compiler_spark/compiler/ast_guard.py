"""Real-parser guard for the view-shape recognizer.

The recognizer in :mod:`.program` matches view SQL with regexes —
fast and dialect-tolerant, but a regex can be fooled by SQL it does
not fully tokenize (string literals containing keywords, quoted
identifiers, deeply nested parenthesized joins). This module parses
the view with DuckDB's bundled SQL parser (``json_serialize_sql`` —
a public, battle-tested parser that ships in this environment; the
reference uses Apache Calcite's parser the same way,
SQL-compiler CalciteCompiler.java) and extracts structural FEATURES
from the AST: joins, grouping, having, window functions, set ops,
subqueries, DISTINCT, CTEs, ORDER/LIMIT.

The guard then cross-checks the regex recognizer's conclusion against
those features: an op class that should never coexist with a feature
(e.g. a _LinearOp for a view whose AST contains a JOIN) is rejected
and the view falls back to the naive-but-always-correct path. So a
regex misparse can only LOSE optimization, never change results.

Views whose SQL DuckDB cannot parse (Spark-only syntax such as the
``window(ts, '1 hour')`` grouping shim) skip the guard — the regexes
remain the only recognizer for those, as before.
"""

from __future__ import annotations

import json
from typing import Any


def parse_features(sql: str) -> "set[str] | None":
    """Parse ``sql`` with DuckDB and return its structural feature
    set, or None when the statement doesn't parse (dialect gap)."""
    try:
        import duckdb

        # json_serialize_sql requires a constant VARCHAR — inline the
        # statement as an escaped literal, not a bind parameter.
        lit = sql.replace("'", "''")
        payload = duckdb.sql(f"SELECT json_serialize_sql('{lit}')").fetchone()[0]
        ast = json.loads(payload)
    except Exception:
        return None
    if ast.get("error"):
        return None
    feats: set[str] = set()
    stmts = ast.get("statements") or []
    if not stmts:
        return None
    _walk(stmts[0].get("node"), feats, depth=0)
    return feats


def _walk(node: Any, feats: "set[str]", depth: int) -> None:
    if isinstance(node, list):
        for item in node:
            _walk(item, feats, depth)
        return
    if not isinstance(node, dict):
        return
    ntype = node.get("type")
    nclass = node.get("class")
    if ntype == "SELECT_NODE":
        if depth > 0:
            feats.add("subquery")
        if node.get("group_expressions"):
            feats.add("group_by")
        if node.get("having"):
            feats.add("having")
        if node.get("where_clause"):
            feats.add("where")
        cte = node.get("cte_map") or {}
        if cte.get("map"):
            feats.add("cte")
        for mod in node.get("modifiers") or []:
            mt = mod.get("type", "")
            if "DISTINCT" in mt:
                feats.add("distinct")
            elif "LIMIT" in mt:
                feats.add("limit")
            elif "ORDER" in mt:
                feats.add("order_by")
        for k, v in node.items():
            if k != "type":
                _walk(v, feats, depth)
        return
    if ntype == "JOIN" or ntype == "CROSS_PRODUCT":
        feats.add("join")
        how = (node.get("join_type") or "").upper()
        if how in ("LEFT", "RIGHT", "FULL", "OUTER"):
            feats.add("outer_join")
        if how in ("SEMI", "ANTI"):
            feats.add("semi_anti_join")
    elif ntype == "SET_OPERATION_NODE":
        feats.add("setop")
    elif ntype == "SUBQUERY" or nclass == "SUBQUERY":
        feats.add("subquery")
    elif nclass == "WINDOW":
        feats.add("window")
    elif nclass == "FUNCTION":
        name = (node.get("function_name") or "").lower()
        if name in ("sum", "count", "avg", "min", "max") and not node.get("over"):
            feats.add("aggregate_fn")
    for k, v in node.items():
        if k != "type":
            _walk(v, feats, depth + (1 if ntype == "SUBQUERY" or nclass == "SUBQUERY" else 0))


# op-class name → features that must NOT be present (a hit means the
# regex recognizer misread the view). Only structural impossibilities
# are listed; shapes legitimately built from a feature (e.g. _TopKOp
# from a window subquery) simply aren't constrained on it.
_FORBIDDEN_FEATURES: dict[str, set[str]] = {
    "_LinearOp": {"join", "group_by", "having", "setop", "window", "distinct",
                  "limit", "order_by", "subquery", "aggregate_fn"},
    "_DistinctOp": {"join", "group_by", "having", "setop", "window", "limit",
                    "order_by", "subquery", "aggregate_fn"},
    "_AggOp": {"join", "setop", "window", "limit", "order_by", "subquery"},
    "_GlobalAggOp": {"join", "setop", "window", "limit", "order_by", "subquery",
                     "group_by"},
    "_WinFnOp": {"join", "group_by", "having", "setop", "limit", "subquery"},
    "_JoinOp": {"group_by", "having", "setop", "window", "limit", "order_by",
                "subquery", "aggregate_fn"},
    "_OuterJoinOp": {"group_by", "having", "setop", "window", "limit",
                     "order_by", "subquery", "aggregate_fn"},
    "_MultiJoinOp": {"group_by", "having", "setop", "window", "limit",
                     "order_by", "subquery", "aggregate_fn"},
    "_MultiJoinAggOp": {"setop", "window", "limit", "order_by", "subquery"},
    "_JoinAggOp": {"setop", "window", "limit", "order_by", "subquery"},
    "_AliasOuterJoinAggOp": {"setop", "window", "limit", "order_by", "subquery"},
    "_UnionAllOp": {"window", "limit", "order_by", "subquery"},
    "_UnionChainOp": {"window", "limit", "order_by", "subquery"},
    "_SetOpOp": {"window", "limit", "order_by", "subquery"},
    "_SetOpChainOp": {"window", "limit", "order_by", "subquery"},
    "_SetExprOp": {"window", "limit", "order_by", "subquery"},
    # UNNEST parses as a (cross) join in DuckDB; no grouping/windowing
    # may coexist with the linear flatmap shape.
    "_FlatMapOp": {"group_by", "having", "setop", "window", "limit",
                   "order_by", "distinct", "aggregate_fn"},
    # decorrelated EXISTS/IN: the subquery is expected; anything
    # aggregate- or group-shaped means the regex misread the view.
    "_SemiAntiOp": {"group_by", "having", "setop", "window", "limit",
                    "order_by", "distinct", "aggregate_fn"},
    # range-correlated EXISTS: same shape, non-equi residual allowed.
    "_RangeSemiAntiOp": {"group_by", "having", "setop", "window", "limit",
                         "order_by", "distinct", "aggregate_fn"},
    # NULL-aware NOT IN: the subquery is intrinsic, same exclusions.
    "_NotInOp": {"group_by", "having", "setop", "window", "limit",
                 "order_by", "distinct", "aggregate_fn"},
    "_KeyedNotInOp": {"group_by", "having", "setop", "window", "limit",
                      "order_by", "distinct", "aggregate_fn"},
    # scalar-agg subquery: subquery + aggregate_fn are intrinsic.
    "_ScalarSubqueryOp": {"join", "setop", "window", "limit", "order_by",
                          "distinct", "having", "group_by"},
    "_RangeScalarSubqOp": {"join", "setop", "window", "limit", "order_by",
                           "distinct", "having", "group_by"},
    "_GroupingSetsOp": {"join", "setop", "window", "limit", "order_by",
                        "subquery", "having", "distinct"},
}


def consistent(op: object, sql: str) -> bool:
    """True when the recognized op's class is structurally compatible
    with the parsed AST (or the SQL doesn't parse in DuckDB — then
    the regexes are the only authority, unchanged behavior)."""
    cls = type(op).__name__
    forbidden = _FORBIDDEN_FEATURES.get(cls)
    if forbidden is None:
        return True
    feats = parse_features(sql)
    if feats is None:
        return True
    return not (feats & forbidden)
