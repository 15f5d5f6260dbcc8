"""Local replica of the driver's correctness gate.

Runs a registry query on Spark and its oracle on DuckDB over the same
parquet, canonicalizes both results (columns sorted by name, rows
sorted by value), and compares EXACTLY — stricter than any reasonable
value-hash, so passing here predicts passing the driver's gate.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pandas as pd

from sql_to_dbsp_compiler_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def driver_canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Replicate the DRIVER's canonicalization, failure modes included.

    The driver sorts columns by name, runs a raw pandas
    ``sort_values`` over all columns, and value-hashes cells. Our own
    :func:`canonicalize` stringifies list cells first, which HID a
    whole failure class: a query returning a bare ``array<...>``
    column passes locally but reds out at the driver with
    ``TypeError: unhashable type: 'list'`` (r1 ``array_functions``,
    r5 ``x_agg_boolean_set``). This replica keeps the driver's
    behavior: unsortable/unhashable cells raise. Run it on every
    oracled query's Spark output BEFORE the value compare so the
    contract bug fails locally first.
    """
    cols = sorted(pdf.columns)
    out = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        for v in out[c]:
            if v is not None:
                hash(v)  # raises TypeError on list/dict/ndarray cells
    return out


def _canon_cell(v: object) -> str:
    if v is None:
        return "NULL"
    if type(v).__module__ == "numpy" and hasattr(v, "item") and not hasattr(v, "__len__"):
        v = v.item()  # numpy scalar → Python scalar (int8 → int, bool_ → bool)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # pandas can't distinguish double NULL from NaN
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, int):
        return str(v)
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    # itertuples, NOT iterrows: iterrows coerces each row to a common
    # dtype, silently turning an int8 oracle column into float64 when
    # the row also has floats — which masked a driver hash mismatch
    # (numeric_functions r3: DuckDB sign()→int8 vs Spark signum→double).
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in t)
        for t in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ]
        for i, a, b in diffs[:5]:
            problems.append(f"row {i} (cols {s_cols}):\n  spark : {a}\n  oracle: {b}")
        extra = len(s_rows) - len(o_rows)
        if not diffs and extra:
            tail = s_rows[-1] if extra > 0 else o_rows[-1]
            problems.append(f"extra rows on {'spark' if extra > 0 else 'oracle'} side, e.g. {tail}")
    return problems
