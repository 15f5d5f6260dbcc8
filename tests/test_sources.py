"""Round-trip tests for file sources/sinks (SURVEY §2.4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_csv,
    write_parquet,
)
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(src, path)
    back = read_csv(spark, path, src.schema)
    assert _rows(back) == _rows(src)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_json")
    src.write.mode("overwrite").json(path)
    back = read_jsonl(spark, path, src.schema)
    assert _rows(back) == _rows(src)


def test_partitioned_parquet_write_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_parquet(src, path, partition_by=["o_orderstatus"], num_files=2)
    back = spark.read.parquet(path)
    assert back.count() == src.count()
    # partition pruning: reading one status only touches its directory
    one = back.where(F.col("o_orderstatus") == "F")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    statuses = [d for d in os.listdir(path) if d.startswith("o_orderstatus=")]
    assert len(statuses) >= 2


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC sink + source roundtrip preserves values; filters push
    into the ORC scan like parquet."""
    from sql_to_dbsp_compiler_spark.sources.files import read_orc, write_orc
    from sql_to_dbsp_compiler_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(n, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))

    filtered = back.where(F.col("n_regionkey") == 2).select("n_name")
    plan = spark._jvm.PythonSQLUtils.explainString(filtered._jdf.queryExecution(), "formatted")
    assert "PushedFilters: [" in plan and "n_regionkey" in plan


def test_metadata_rowcount_matches_count_and_refuses_unsafe(spark, sf_dir):
    """rowcount()'s parquet-footer fast path: exact on plain scans and
    rowcount-preserving plans (projection/repartition), None on any
    cardinality-changing node — auto-scaling operators must never pay
    a full scan to learn |corpus|."""
    from pyspark.sql import functions as F

    from sql_to_dbsp_compiler_spark.sources.tables import (
        load_table,
        metadata_rowcount,
        rowcount,
    )

    e = load_table(spark, sf_dir, "embeddings")
    assert metadata_rowcount(e) == e.count()
    proj = e.repartition(8, F.col("vec_id")).select("vec_id")
    assert metadata_rowcount(proj) == e.count()
    assert metadata_rowcount(e.where(F.col("vec_id") > 10)) is None
    assert metadata_rowcount(e.join(e.select("vec_id"), "vec_id")) is None
    assert metadata_rowcount(e.limit(3)) is None
    assert metadata_rowcount(spark.range(5)) is None
    assert rowcount(e.limit(3)) == 3  # fallback counting job


def test_metadata_rowcount_url_encoded_paths_and_bad_footers(
    spark, tmp_path
):
    """ADVICE r4: inputFiles() returns URIs — a path with a space
    arrives URL-encoded (%20) and must be unquoted before the footer
    read, and an unreadable footer falls back to None (→ counting
    job) rather than crashing the planning path."""
    from sql_to_dbsp_compiler_spark.sources.tables import (
        metadata_rowcount,
        rowcount,
    )

    d = str(tmp_path / "with space")
    spark.range(7).write.parquet(d)
    back = spark.read.parquet(d)
    assert any("%20" in f for f in back.inputFiles())
    assert metadata_rowcount(back) == 7

    bad = str(tmp_path / "bad")
    spark.range(3).coalesce(1).write.parquet(bad)
    back2 = spark.read.parquet(bad)
    import glob as _glob
    import os as _os

    for f in _glob.glob(_os.path.join(bad, "*.parquet")):
        with open(f, "r+b") as fh:  # corrupt the footer magic
            fh.seek(-4, 2)
            fh.write(b"XXXX")
    assert metadata_rowcount(back2) is None  # clean None, no raise
    assert rowcount(spark.range(4)) == 4  # non-parquet plans still count
