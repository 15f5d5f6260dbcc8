"""Edge-case semantics queries (reference: EndToEndTests.java,
postgres/PostgresNumericTests.java — NULL-propagating aggregates,
empty-group behavior, division/modulo sign rules, string boundary
cases, LIKE escapes, greatest/least NULL handling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "agg_empty_input",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s,
           MIN(o_totalprice) AS mn,
           MAX(o_totalprice) AS mx,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_d
    FROM orders WHERE o_totalprice < 0
    """,
    tags=("edge", "aggregate"),
)
def agg_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate over zero rows: COUNT=0, every other aggregate
    NULL — one output row, not zero (ANSI + reference semantics)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") < 0)
    return o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("o_totalprice")).cast("double").alias("s"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.min("o_orderdate").alias("first_d"),
    )


@query(
    "groupby_empty_input",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders WHERE o_totalprice < 0
    GROUP BY o_orderstatus
    """,
    tags=("edge", "aggregate"),
)
def groupby_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY over zero rows: zero output rows (vs. one for global)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") < 0)
    return o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "division_modulo_semantics",
    oracle="""
    SELECT v.a, v.b,
           v.a / v.b AS true_div,
           CAST(FLOOR(CAST(v.a AS DOUBLE) / v.b) AS BIGINT) AS floor_div,
           v.a % v.b AS mod_trunc,
           CAST(v.a AS DOUBLE) / 4 AS div_by_int
    FROM (VALUES (7, 2), (-7, 2), (7, -2), (-7, -2), (0, 3)) AS v(a, b)
    """,
    tags=("edge", "numeric"),
)
def division_modulo_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign rules: `/` on integers is true division (double) in both
    engines; floor division is spelled FLOOR(a/b) (NB DuckDB's `//`
    TRUNCATES toward zero, it does not floor); `%` is
    truncation-signed in both (reference: doc/sql/integer.rst)."""
    df = spark.createDataFrame(
        [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 3)], schema="a int, b int"
    )
    return df.select(
        "a",
        "b",
        (F.col("a") / F.col("b")).alias("true_div"),
        F.floor(F.col("a") / F.col("b")).cast("bigint").alias("floor_div"),
        (F.col("a") % F.col("b")).alias("mod_trunc"),
        (F.col("a").cast("double") / 4).alias("div_by_int"),
    )


@query(
    "string_boundaries",
    oracle="""
    SELECT c_custkey,
           substring(c_name, 100, 5) AS past_end,
           substring(c_name, 1, 0) AS zero_len,
           substring(c_name, length(c_name), 10) AS tail_over,
           c_name || '' AS concat_empty,
           CAST(length(trim('')) AS BIGINT) AS empty_trim_len,
           replace(c_name, c_name, '') AS replaced_all,
           lpad(c_name, 5, 'x') AS truncating_pad
    FROM customer WHERE c_custkey <= 100
    """,
    tags=("edge", "string"),
)
def string_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.substring(name, 100, 5).alias("past_end"),
        F.substring(name, 1, 0).alias("zero_len"),
        F.expr("substring(c_name, length(c_name), 10)").alias("tail_over"),
        F.concat(name, F.lit("")).alias("concat_empty"),
        F.length(F.trim(F.lit(""))).cast("bigint").alias("empty_trim_len"),
        F.replace(name, name, F.lit("")).alias("replaced_all"),
        F.lpad(name, 5, "x").alias("truncating_pad"),
    )


@query(
    "like_escape",
    oracle="""
    SELECT s, s LIKE '100!%' ESCAPE '!' AS is_pct,
           s LIKE 'a!_b' ESCAPE '!' AS is_underscore,
           s LIKE '100%' AS pct_wild
    FROM (VALUES ('100%'), ('100x'), ('a_b'), ('axb')) AS t(s)
    """,
    tags=("edge", "string"),
)
def like_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with ESCAPE: escaped wildcards match literally."""
    df = spark.createDataFrame([("100%",), ("100x",), ("a_b",), ("axb",)], schema="s string")
    return df.select(
        "s",
        F.expr("s LIKE '100!%' ESCAPE '!'").alias("is_pct"),
        F.expr("s LIKE 'a!_b' ESCAPE '!'").alias("is_underscore"),
        F.col("s").like("100%").alias("pct_wild"),
    )


@query(
    "greatest_least_nulls",
    oracle="""
    SELECT c_custkey,
           greatest(c_acctbal, o_totalprice) AS g,
           least(c_acctbal, o_totalprice) AS l,
           greatest(c_acctbal, NULL) AS g_null
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    WHERE c_custkey <= 150
    """,
    tags=("edge", "null"),
)
def greatest_least_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatest/least skip NULLs (only all-NULL yields NULL) — same in
    both engines, unlike strict ANSI."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 150)
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000)
    return c.join(o, cond, "left").select(
        "c_custkey",
        F.greatest(F.col("c_acctbal"), F.col("o_totalprice")).alias("g"),
        F.least(F.col("c_acctbal"), F.col("o_totalprice")).alias("l"),
        F.greatest(F.col("c_acctbal"), F.lit(None).cast("double")).alias("g_null"),
    )


@query(
    "distinct_on_groupwise_first",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_date
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    """,
    tags=("edge", "window"),
)
def distinct_on_groupwise_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON / groupwise-first (each customer's earliest order)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_date"),
        )
    )


@query(
    "division_by_zero_null",
    oracle="""
    SELECT v.a, v.b,
           CASE WHEN v.b = 0 THEN NULL
                ELSE CAST(TRUNC(CAST(v.a AS DOUBLE) / v.b) AS BIGINT) END AS div_null,
           CASE WHEN v.b = 0 THEN NULL ELSE v.a % v.b END AS mod_null,
           CASE WHEN v.b = 0 OR v.a = 0 THEN NULL
                ELSE CAST(TRUNC(2.0 / TRUNC(CAST(v.a AS DOUBLE) / v.b)) AS BIGINT)
           END AS nested_div
    FROM (VALUES (1, 0), (7, 2), (-7, 0), (-7, 2), (0, 0), (0, 3)) AS v(a, b)
    """,
    tags=("edge", "numeric"),
)
def division_by_zero_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TOTAL division: a zero divisor yields NULL, not
    a runtime error, and NULL propagates through enclosing arithmetic
    (reference EndToEndTests divZeroTest / nestedDivTest /
    customDivisionTest: SELECT 1/0 -> NULL row). Our session runs ANSI
    mode (where `/` raises), so reference division is spelled with
    functions/numeric_fns.division; the nested case 2/(a/b) goes NULL
    when the inner division is NULL (b=0) or zero (a=0)."""
    from sql_to_dbsp_compiler_spark.functions.numeric_fns import division, total_mod

    df = spark.createDataFrame(
        [(1, 0), (7, 2), (-7, 0), (-7, 2), (0, 0), (0, 3)], schema="a int, b int"
    )
    inner = division(F.col("a"), F.col("b"))
    return df.select(
        "a",
        "b",
        inner.alias("div_null"),
        total_mod(F.col("a"), F.col("b")).alias("mod_null"),
        division(F.lit(2).cast("int"), inner).alias("nested_div"),
    )


@query(
    "char_smallint_types",
    oracle="""
    SELECT i,
           CASE WHEN i BETWEEN -128 AND 127
                THEN CAST(CAST(i AS TINYINT) AS BIGINT) END AS tiny_v,
           CASE WHEN i BETWEEN -32768 AND 32767
                THEN CAST(CAST(i AS SMALLINT) AS BIGINT) END AS small_v,
           CASE WHEN i BETWEEN -128 AND 127
                THEN CAST(CAST(i AS TINYINT) AS VARCHAR) END AS tiny_str,
           rpad(s, 5, ' ') AS char5,
           CAST(length(rpad(s, 5, ' ')) AS BIGINT) AS char5_len,
           rpad(s, 5, ' ') || '|' || rpad(s, 3, ' ') AS char_concat
    FROM (VALUES (-32768, 'ab'), (-128, 'a'), (-1, 'abcdef'), (0, ''),
                 (42, 'xyz'), (127, 'hello world'), (32767, 'zz')) v(i, s)
    """,
    tags=("edge", "types"),
)
def char_smallint_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TINYINT/SMALLINT surfaces and CHAR(n) pad semantics
    (reference: doc/sql/types.rst, CastTests.java). Narrow-int casts
    are range-guarded (overflow semantics differ across engines: the
    reference errors, Spark wraps, DuckDB errors — the engine exposes
    in-range casts and NULL out of range). CHAR(n) pads/truncates to
    exactly n chars; Spark's CAST(x AS CHAR(n)) deliberately treats
    char as string (CharVarcharUtils), so the engine maps CHAR(n)
    values to explicit rpad semantics — identical to the reference's
    space-padded CHAR comparison/concat behavior."""
    df = spark.createDataFrame(
        [(-32768, "ab"), (-128, "a"), (-1, "abcdef"), (0, ""),
         (42, "xyz"), (127, "hello world"), (32767, "zz")],
        schema="i int, s string",
    )
    in_tiny = F.col("i").between(-128, 127)
    in_small = F.col("i").between(-32768, 32767)
    char5 = F.rpad(F.col("s"), 5, " ")
    return df.select(
        "i",
        F.when(in_tiny, F.col("i").cast("tinyint").cast("bigint")).alias("tiny_v"),
        F.when(in_small, F.col("i").cast("smallint").cast("bigint")).alias("small_v"),
        F.when(in_tiny, F.col("i").cast("tinyint").cast("string")).alias("tiny_str"),
        char5.alias("char5"),
        F.length(char5).cast("bigint").alias("char5_len"),
        F.concat(char5, F.lit("|"), F.rpad(F.col("s"), 3, " ")).alias("char_concat"),
    )


@query(
    "interval_year_month",
    oracle="""
    SELECT CAST(d AS VARCHAR) AS d,
           CAST(CAST(d + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_1mo,
           CAST(CAST(d + (INTERVAL 1 YEAR + INTERVAL 6 MONTHS) AS DATE) AS VARCHAR) AS plus_1y6mo,
           CAST(CAST(d - INTERVAL 2 YEAR AS DATE) AS VARCHAR) AS minus_2y,
           CAST(CAST(d + INTERVAL 25 MONTHS AS DATE) AS VARCHAR) AS plus_25mo,
           CAST(date_diff('month', DATE '1995-01-01', d) AS BIGINT) AS months_from_95,
           CAST(date_diff('year', DATE '1995-01-01', d) AS BIGINT) AS years_from_95
    FROM (VALUES (DATE '1996-01-31'), (DATE '1996-02-29'), (DATE '1999-12-31'),
                 (DATE '1997-06-15'), (DATE '1994-03-01'), (CAST(NULL AS DATE))) v(d)
    """,
    tags=("edge", "datetime", "types"),
)
def interval_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-month INTERVAL family (reference lib/sqllib/src/interval.rs
    has both day-time and year-month families; interval_arith covers
    day-time). Month-end clamping edges: Jan 31 + 1 MONTH = Feb 29 in
    a leap year in both engines; YEAR TO MONTH literals and month/year
    boundary-crossing diffs. DuckDB promotes date + interval to
    TIMESTAMP, so the oracle casts back to DATE; everything serialized
    as strings for exact comparison."""
    rows = [("1996-01-31",), ("1996-02-29",), ("1999-12-31",),
            ("1997-06-15",), ("1994-03-01",), (None,)]
    df = spark.createDataFrame(rows, schema="d string").select(
        F.col("d").cast("date").alias("d")
    )
    start = F.lit("1995-01-01").cast("date")
    return df.select(
        F.col("d").cast("string").alias("d"),
        (F.col("d") + F.expr("INTERVAL 1 MONTH")).cast("string").alias("plus_1mo"),
        (F.col("d") + F.expr("INTERVAL '1-6' YEAR TO MONTH")).cast("string").alias("plus_1y6mo"),
        (F.col("d") - F.expr("INTERVAL 2 YEAR")).cast("string").alias("minus_2y"),
        (F.col("d") + F.expr("INTERVAL 25 MONTHS")).cast("string").alias("plus_25mo"),
        F.floor(F.months_between(F.col("d"), start)).cast("bigint").alias("months_from_95"),
        (F.year("d") - 1995).cast("bigint").alias("years_from_95"),
    )


@query(
    "cast_matrix2",
    oracle="""
    SELECT s,
           CASE WHEN regexp_matches(trim(s), '^[+-]?[0-9]+$')
                THEN TRY_CAST(s AS BIGINT) END AS as_int,
           TRY_CAST(s AS DOUBLE) AS as_double,
           TRY_CAST(s AS BOOLEAN) AS as_bool,
           CAST(TRY_CAST(s AS DATE) AS VARCHAR) AS as_date,
           CAST(TRY_CAST(s AS TIMESTAMP) AS VARCHAR) AS as_ts
    FROM (VALUES ('42'), ('-7'), ('  19 '), ('3.5e2'), ('true'), ('false'),
                 ('1996-02-29'), ('1997-02-30'), ('1996-02-29 17:32:01'),
                 ('not a number'), (''), (CAST(NULL AS VARCHAR))) v(s)
    """,
    tags=("edge", "cast"),
)
def cast_matrix2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-parsing cast lattice (reference: CastTests.java,
    lib/sqllib/src/casts.rs — the 319-fn cast matrix's string rows).
    The engine exposes safe-cast semantics via try_cast (Spark 4 runs
    ANSI mode, where plain CAST throws on malformed input):
    unparseable → NULL, matching DuckDB TRY_CAST and the reference's
    nullable cast family. Covers int/double/bool/date/timestamp
    parsing incl. whitespace trim, scientific notation, leap-day
    validity (1997-02-30 → NULL), empty string, and NULL propagation.
    One documented divergence: Spark parses integers digits-only
    ('3.5e2' → NULL) where DuckDB accepts scientific notation; the
    oracle encodes Spark's rule with a digits-only regex guard."""
    rows = [("42",), ("-7",), ("  19 ",), ("3.5e2",), ("true",), ("false",),
            ("1996-02-29",), ("1997-02-30",), ("1996-02-29 17:32:01",),
            ("not a number",), ("",), (None,)]
    df = spark.createDataFrame(rows, schema="s string")
    return df.select(
        "s",
        F.col("s").try_cast("bigint").alias("as_int"),
        F.col("s").try_cast("double").alias("as_double"),
        F.col("s").try_cast("boolean").alias("as_bool"),
        F.col("s").try_cast("date").cast("string").alias("as_date"),
        F.col("s").try_cast("timestamp").cast("string").alias("as_ts"),
    )


@query(
    "cast_decimal_rescale",
    oracle="""
    WITH v AS (SELECT s, CAST(s AS DECIMAL(14,4)) AS d
               FROM (VALUES ('123.4567'), ('123.455'), ('-123.455'), ('0.005'),
                            ('-0.005'), ('99999.99'), ('-99999.99'), ('0.0'),
                            ('1.9999'), ('-1.9999')) t(s)),
    r AS (SELECT s, d,
                 trunc(d*100 + CASE WHEN d >= 0 THEN 0.5 ELSE -0.5 END)/100 AS h2,
                 trunc(d + CASE WHEN d >= 0 THEN 0.5 ELSE -0.5 END) AS h0
          FROM v)
    SELECT s,
           CAST(CAST(h2 AS DECIMAL(10,2)) AS VARCHAR) AS rescale_2,
           CAST(CAST(h0 AS DECIMAL(10,0)) AS VARCHAR) AS rescale_0,
           CAST(TRY_CAST(CAST(h2 AS DECIMAL(14,2)) AS DECIMAL(4,2)) AS VARCHAR) AS narrow_42,
           CAST(CAST(d AS DECIMAL(20,8)) AS VARCHAR) AS widen_8,
           CAST(d AS DOUBLE) AS as_double,
           CAST(CAST(trunc(d) AS BIGINT) AS VARCHAR) AS as_bigint
    FROM r
    """,
    tags=("edge", "cast", "decimal"),
)
def cast_decimal_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(p,s) rescaling lattice (reference lib/sqllib/src/
    casts.rs decimal rows; postgres semantics): scale-narrowing casts
    ROUND half-away-from-zero (123.455→(10,2)→123.46, -0.005→(10,0)→0
    ... -0.005 rounds to -0.01 at scale 2), precision overflow →
    NULL (TRY_CAST / Spark safe cast), widening is exact, and
    decimal→bigint truncates toward zero (1.9999→1, -1.9999→-1).
    DOCUMENTED DIVERGENCES (the engine keeps the reference's postgres
    semantics; the oracle reproduces them explicitly): DuckDB's
    decimal rescale CAST truncates where Spark/postgres round
    half-away-from-zero, so the oracle spells half-away as
    trunc(d*100 ± 0.5)/100 rather than relying on cast. (DuckDB's
    round() itself IS half-away-from-zero on both the DECIMAL and
    DOUBLE overloads — verified 2.5→3, ±5e-11→±1e-10 at scale 10 —
    which is why postgres_numeric_edges may use round(decimal, 10)
    directly; the explicit trunc form here predates that check and is
    equivalent.) DuckDB's decimal→BIGINT cast ROUNDS where
    Spark/postgres truncate — the oracle wraps it in trunc()."""
    rows = [("123.4567",), ("123.455",), ("-123.455",), ("0.005",),
            ("-0.005",), ("99999.99",), ("-99999.99",), ("0.0",),
            ("1.9999",), ("-1.9999",)]
    df = spark.createDataFrame(rows, schema="s string")
    d = F.col("s").cast("decimal(14,4)")
    return df.select(
        "s",
        d.cast("decimal(10,2)").cast("string").alias("rescale_2"),
        d.cast("decimal(10,0)").cast("string").alias("rescale_0"),
        d.try_cast("decimal(4,2)").cast("string").alias("narrow_42"),
        d.cast("decimal(20,8)").cast("string").alias("widen_8"),
        d.cast("double").alias("as_double"),
        d.cast("bigint").cast("string").alias("as_bigint"),
    )


@query(
    "interval_string_casts",
    oracle="""
    WITH v AS (SELECT s FROM (VALUES ('1-2'), ('-0-7'), ('11-11'), ('-99-11'),
                                     ('0-0'), (CAST(NULL AS VARCHAR))) t(s)),
    p AS (SELECT s,
                 CASE WHEN s IS NULL THEN NULL
                      WHEN s LIKE '-%' THEN -1 ELSE 1 END AS sg,
                 CASE WHEN s LIKE '-%' THEN substring(s, 2) ELSE s END AS body
          FROM v),
    m AS (SELECT s, sg * (try_cast(split_part(body, '-', 1) AS BIGINT) * 12
                          + try_cast(split_part(body, '-', 2) AS BIGINT)) AS months
          FROM p)
    SELECT s,
           months AS ym_months,
           CASE WHEN months IS NULL THEN NULL
                ELSE (CASE WHEN months < 0 THEN '-' ELSE '' END
                      || CAST(abs(months) // 12 AS VARCHAR) || '-'
                      || CAST(abs(months) % 12 AS VARCHAR)) END AS ym_canon,
           CASE WHEN months IS NULL THEN NULL
                ELSE (CASE WHEN months < 0 THEN '-' ELSE '' END
                      || CAST(abs(months) // 12 AS VARCHAR) || '-'
                      || CAST(abs(months) % 12 AS VARCHAR)) END AS ym_spark_body,
           CAST(TRUE AS BOOLEAN) AS bad_ym_is_null,
           CAST(TRUE AS BOOLEAN) AS bad_dts_is_null
    FROM m
    """,
    tags=("edge", "cast", "interval"),
)
def interval_string_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string↔INTERVAL cast lattice, YEAR TO MONTH half (reference
    lib/sqllib/src/casts.rs interval rows; CastTests.java): parse
    'Y-M' with optional sign into a real YearMonthIntervalType, total
    months via the interval→INT cast, and the canonical 'Y-M' body of
    the interval→string cast (Spark prints the verbose SQL-standard
    form INTERVAL 'body' YEAR TO MONTH; the body is extracted and must
    equal the arithmetic canonical form the oracle rebuilds).
    Unparseable strings → NULL via try_cast (the reference's safe-cast
    row)."""
    df = spark.createDataFrame(
        [("1-2",), ("-0-7",), ("11-11",), ("-99-11",), ("0-0",), (None,)],
        schema="s string",
    )
    iv = F.expr("CAST(s AS INTERVAL YEAR TO MONTH)")
    months = F.expr("CAST(CAST(s AS INTERVAL YEAR TO MONTH) AS INT)").cast("bigint")
    canon = F.when(
        months.isNotNull(),
        F.concat(
            F.when(months < 0, F.lit("-")).otherwise(F.lit("")),
            (F.abs(months) / 12).cast("bigint").cast("string"),
            F.lit("-"),
            (F.abs(months) % 12).cast("string"),
        ),
    )
    spark_body = F.regexp_extract(iv.cast("string"), "'(.+)'", 1)
    return df.select(
        "s",
        months.alias("ym_months"),
        canon.alias("ym_canon"),
        F.when(months.isNotNull(), spark_body).alias("ym_spark_body"),
        F.expr("try_cast('1/2' AS INTERVAL YEAR TO MONTH)").isNull().alias("bad_ym_is_null"),
        F.expr("try_cast('xx' AS INTERVAL DAY TO SECOND)").isNull().alias("bad_dts_is_null"),
    )


@query(
    "interval_daytime_casts",
    oracle="""
    WITH v AS (SELECT s FROM (VALUES ('3 04:05:06.789'), ('-1 00:30:00'),
                                     ('0 00:00:00'), ('14 23:59:59.999'),
                                     ('-0 00:00:06.789'), (CAST(NULL AS VARCHAR))) t(s)),
    p AS (SELECT s,
                 CASE WHEN s IS NULL THEN NULL
                      WHEN s LIKE '-%' THEN -1 ELSE 1 END AS sg,
                 CASE WHEN s LIKE '-%' THEN substring(s, 2) ELSE s END AS body
          FROM v),
    f AS (SELECT s, sg,
                 try_cast(split_part(body, ' ', 1) AS BIGINT) AS d,
                 try_cast(split_part(split_part(body, ' ', 2), ':', 1) AS BIGINT) AS h,
                 try_cast(split_part(split_part(body, ' ', 2), ':', 2) AS BIGINT) AS mi,
                 try_cast(split_part(split_part(body, ' ', 2), ':', 3) AS DECIMAL(12,6)) AS sec
          FROM p)
    SELECT s,
           sg * (((d * 24 + h) * 60 + mi) * 60000000 + CAST(sec * 1000000 AS BIGINT))
               AS total_micros,
           -- interval→BIGINT truncates toward zero (6.789 → 6, -6.789 → -6)
           sg * (((d * 24 + h) * 60 + mi) * 60 + CAST(trunc(sec) AS BIGINT))
               AS total_secs,
           sg * d AS e_day, sg * h AS e_hour, sg * mi AS e_minute,
           CAST(sg * sec * 1000000 AS BIGINT) AS e_sec_micros
    FROM f
    """,
    tags=("edge", "cast", "interval"),
)
def interval_daytime_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string↔INTERVAL cast lattice, DAY TO SECOND half (reference
    lib/sqllib/src/casts.rs interval rows): parse signed
    'D HH:MM:SS[.fff]' into a DayTimeIntervalType; totals via the
    interval→BIGINT cast (truncates toward zero — pinned) plus an
    exact microsecond total from EXTRACT fields; signed field extracts
    (all fields carry the interval's sign, e.g. '-1 00:30:00' →
    day=-1, minute=-30 — SQL-standard interval extraction)."""
    df = spark.createDataFrame(
        [("3 04:05:06.789",), ("-1 00:30:00",), ("0 00:00:00",),
         ("14 23:59:59.999",), ("-0 00:00:06.789",), (None,)],
        schema="s string",
    )
    day = F.expr("EXTRACT(DAY FROM CAST(s AS INTERVAL DAY TO SECOND))").cast("bigint")
    hour = F.expr("EXTRACT(HOUR FROM CAST(s AS INTERVAL DAY TO SECOND))").cast("bigint")
    minute = F.expr("EXTRACT(MINUTE FROM CAST(s AS INTERVAL DAY TO SECOND))").cast("bigint")
    sec = F.expr("EXTRACT(SECOND FROM CAST(s AS INTERVAL DAY TO SECOND))")  # decimal(8,6)
    sec_micros = (sec * 1000000).cast("bigint")
    total_micros = (
        ((day * 24 + hour) * 60 + minute) * F.lit(60000000).cast("bigint") + sec_micros
    )
    total_secs = F.expr(
        "CAST(CAST(s AS INTERVAL DAY TO SECOND) AS BIGINT)"
    )
    return df.select(
        "s",
        total_micros.alias("total_micros"),
        total_secs.alias("total_secs"),
        day.alias("e_day"), hour.alias("e_hour"), minute.alias("e_minute"),
        sec_micros.alias("e_sec_micros"),
    )


@query(
    "varchar_truncate_cast",
    oracle="""
    SELECT s,
           substring(s, 1, 3) AS v3,
           substring(s, 1, 5) AS v5,
           CAST(length(substring(s, 1, 5)) AS BIGINT) AS v5_len,
           left(rpad(coalesce(s, ''), 4, ' '), 4) AS c4,
           substring(s, 1, 5) = 'abcde' AS v5_eq,
           substring(s || 'Z', 1, 2) AS concat_then_trunc
    FROM (VALUES ('abcdefgh'), ('abc'), (''), ('héllo wörld'),
                 ('abcde'), ('ab cd ef'), (CAST(NULL AS VARCHAR))) t(s)
    """,
    tags=("edge", "cast", "string"),
)
def varchar_truncate_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARCHAR(n) truncation-on-cast (reference lib/sqllib/src/
    casts.rs VARCHAR rows; doc/sql/types.rst): the reference cast
    keeps the first n characters (code points, so unicode is safe);
    Spark's CAST(x AS VARCHAR(n)) deliberately keeps full strings
    (CharVarcharUtils), so the engine exposes the reference semantics
    as cast_varchar/cast_char (functions/string_fns.py) — truncation,
    length after truncation, CHAR(4) truncate-or-pad, post-truncation
    equality, and truncation of a concat result."""
    from sql_to_dbsp_compiler_spark.functions.string_fns import cast_char, cast_varchar

    df = spark.createDataFrame(
        [("abcdefgh",), ("abc",), ("",), ("héllo wörld",),
         ("abcde",), ("ab cd ef",), (None,)],
        schema="s string",
    )
    s = F.col("s")
    return df.select(
        "s",
        cast_varchar(s, 3).alias("v3"),
        cast_varchar(s, 5).alias("v5"),
        F.length(cast_varchar(s, 5)).cast("bigint").alias("v5_len"),
        cast_char(F.coalesce(s, F.lit("")), 4).alias("c4"),
        (cast_varchar(s, 5) == F.lit("abcde")).alias("v5_eq"),
        cast_varchar(F.concat(s, F.lit("Z")), 2).alias("concat_then_trunc"),
    )


@query(
    "x_decimal_math",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS dec_v,
           round(ln(CAST(o_totalprice AS DECIMAL(12,2))), 9) AS dec_ln,
           round(log10(CAST(o_totalprice AS DECIMAL(12,2))), 9) AS dec_log10,
           CAST(CAST(o_totalprice AS DECIMAL(12,2))
                * CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS dec_sq,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                     / CAST(o_orderkey % 7 + 1 AS DECIMAL(4,0))
                AS DECIMAL(20,6)) AS VARCHAR) AS dec_div,
           CAST(CAST(o_totalprice AS DECIMAL(12,2))
                % CAST(100 AS DECIMAL(5,2)) AS VARCHAR) AS dec_mod,
           CAST(round(CAST(o_totalprice AS DECIMAL(12,2)), 1) AS VARCHAR)
               AS dec_round1,
           CAST(round(CAST(o_totalprice AS DECIMAL(12,2)), -2) AS VARCHAR)
               AS dec_roundneg2
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("edge", "decimal", "functions"),
)
def x_decimal_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference sqllib's DECIMAL math family (lib/sqllib/src/
    lib.rs: ln_decimal, log10_decimal, times_decimal_decimal,
    div_decimal_decimal, mod_decimal_decimal, round_decimal): exact
    multiply/mod surfaced as strings, division rescaled to an explicit
    DECIMAL(20,6) on both engines. NOTE on dec_div parity (ADVICE r4):
    pinning the result type does NOT fully pin semantics — DuckDB's
    decimal/decimal division goes through DOUBLE before the cast
    rounds, while Spark rounds an exact DECIMAL(_,7) quotient. The two
    pipelines agree here because the divisors (1..7 over 2-dp
    dividends) produce at most 7 significant fractional digits, far
    inside double's 15-16-digit precision, so the double intermediate
    is exact and never lands near a 6-dp rounding boundary. Widening
    the divisor set beyond what a double can represent exactly would
    require computing the Spark quotient via double too.
    transcendentals (ln/log10) on decimal inputs produce doubles
    rounded to 9 dp, and round-to-negative-digits keeps decimal
    semantics (HALF_UP away from zero on both engines)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    d = F.col("o_totalprice").cast("decimal(12,2)")
    div = (d / (F.col("o_orderkey") % 7 + 1).cast("decimal(4,0)")).cast(
        "decimal(20,6)"
    )
    return o.select(
        "o_orderkey",
        d.cast("string").alias("dec_v"),
        F.round(F.log(d), 9).alias("dec_ln"),
        F.round(F.log10(d), 9).alias("dec_log10"),
        (d * d).cast("string").alias("dec_sq"),
        div.cast("string").alias("dec_div"),
        (d % F.lit(100).cast("decimal(5,2)")).cast("string").alias("dec_mod"),
        F.round(d, 1).cast("string").alias("dec_round1"),
        F.round(d, -2).cast("string").alias("dec_roundneg2"),
    )
