"""Statistics aggregates, multiset set-ops, bit ops, regex functions
(reference: postgres/PostgresNumericTests.java for stddev/variance,
EndToEndTests for set ops, doc/sql/{integer,string}.rst).

Variance/stddev are computed from DECIMAL-exact Σx and Σx² with one
final double expression, so they are deterministic under any
partitioning — Spark's builtin var_samp (running double accumulation)
is not, which is exactly why a 1000-executor job would return
different low bits each run."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "except_all_intersect_all",
    oracle="""
    WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000),
         b AS (SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000)
    SELECT 'except_all' AS op, k, COUNT(*) AS n FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
    UNION ALL
    SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
    UNION ALL
    SELECT 'union_distinct' AS op, k, CAST(1 AS BIGINT) AS n FROM (SELECT k FROM a UNION SELECT k FROM b)
    """,
    tags=("setop",),
)
def except_all_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL / INTERSECT ALL (Z-set subtraction with
    weights kept) + UNION DISTINCT, disambiguated by an op column."""
    a = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("k"))
    )
    b = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("k"))
    )
    ea = a.exceptAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "k", "n"
    )
    ia = a.intersectAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "k", "n"
    )
    ud = a.union(b).distinct().select(
        F.lit("union_distinct").alias("op"), "k", F.lit(1).cast("bigint").alias("n")
    )
    return ea.unionByName(ia).unionByName(ud)


@query(
    "variance_stddev",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
                        * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           (sxx - sx * sx / n) / (n - 1) AS var_samp,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_samp,
           (sxx - sx * sx / n) / n AS var_pop
    FROM s
    """,
    tags=("statistics", "aggregate"),
)
def variance_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample/population variance and stddev from exact Σx, Σx²."""
    o = load_table(spark, sf_dir, "orders")
    d = dec2("o_totalprice")
    s = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).cast("double").alias("sx"),
        F.sum(d * d).cast("double").alias("sxx"),
    )
    var_s = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    var_p = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    return s.select(
        "o_orderstatus",
        "n",
        var_s.alias("var_samp"),
        F.sqrt(var_s).alias("stddev_samp"),
        var_p.alias("var_pop"),
    )


@query(
    "median_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.25) AS q1_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("statistics", "aggregate"),
)
def median_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (Spark percentile == DuckDB
    quantile_cont). The exact form sorts per group — at 100 TB use
    approx_percentile (t-digest) unless exactness is contractual."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("median_qty"),
        F.percentile(F.col("l_quantity"), F.lit(0.25)).alias("q1_qty"),
        F.percentile(F.col("l_quantity"), F.lit(0.9)).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "bitwise_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS and_mask,
           CAST(l_orderkey | 4096 AS BIGINT) AS or_flag,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS xored,
           CAST(l_orderkey << 2 AS BIGINT) AS shl,
           CAST(l_orderkey >> 3 AS BIGINT) AS shr
    FROM lineitem WHERE l_orderkey <= 600
    """,
    tags=("functions", "integer"),
)
def bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 600)
    k = F.col("l_orderkey")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("and_mask"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("or_flag"),
        k.bitwiseXOR(F.col("l_partkey")).cast("bigint").alias("xored"),
        F.shiftleft(k, 2).cast("bigint").alias("shl"),
        F.shiftright(k, 3).cast("bigint").alias("shr"),
    )


@query(
    "regex_functions",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_extract(text, '([0-9]+)', 1) AS first_number,
           regexp_matches(text, 'table.*scan') AS has_table_scan,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_prefix
    FROM (SELECT doc_id, substr(text, 1, 60) AS text FROM documents WHERE doc_id < 100)
    """,
    tags=("functions", "string", "regex"),
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface on a bounded prefix (patterns chosen inside the
    Java/RE2 common dialect)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", F.substring(F.col("text"), 1, 60).alias("text"))
    )
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, "([a-z]+)", 1).alias("first_word"),
        F.regexp_extract(t, "([0-9]+)", 1).alias("first_number"),
        t.rlike("table.*scan").alias("has_table_scan"),
        F.regexp_replace(t, "[aeiou]", "_").alias("devoweled_prefix"),
    )


@query("approx_sketches", tags=("statistics", "approximate", "rows-only"))
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for the 100 TB regime: HLL++ distinct counts
    and t-digest percentiles — fixed-size mergeable state instead of
    exact sort/set memory. No SQL oracle (approximate by design);
    tests/test_sketches.py bounds the error vs exact."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_supps"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(5000)).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n"),
    )


_CM_WORDS = "list_filter(string_split(text, ' '), w -> w <> '')"
_CM_PROBES = ("table", "value", "row", "scan", "the", "a", "spark", "fast")


@query(
    "x_sketch_countmin",
    oracle=f"""
    WITH occ AS (SELECT unnest({_CM_WORDS}) AS w FROM documents),
    wc AS (SELECT w, COUNT(*) AS cnt FROM occ GROUP BY w),
    h AS (
        SELECT w, cnt,
               CAST('0x' || substring(md5(w), 1, 15) AS BIGINT)
                   % 2147483647 AS h1,
               CAST('0x' || substring(md5(w), 17, 15) AS BIGINT)
                   % 2147483647 AS h2
        FROM wc
    ),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    cells AS (
        SELECT j, ((h1 + j * h2) % 2147483647) % 256 AS bucket,
               SUM(cnt) AS c
        FROM h CROSS JOIN js
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT unnest(['table', 'value', 'row', 'scan', 'the', 'a',
                       'spark', 'fast']) AS word
    ),
    ph AS (
        SELECT word,
               CAST('0x' || substring(md5(word), 1, 15) AS BIGINT)
                   % 2147483647 AS h1,
               CAST('0x' || substring(md5(word), 17, 15) AS BIGINT)
                   % 2147483647 AS h2
        FROM probes
    ),
    pest AS (
        SELECT p.word,
               MIN(COALESCE(c.c, 0)) AS cm_est
        FROM ph p
        CROSS JOIN js
        LEFT JOIN cells c
          ON c.j = js.j
         AND c.bucket = ((p.h1 + js.j * p.h2) % 2147483647) % 256
        GROUP BY p.word
    )
    SELECT p.word,
           CAST(COALESCE(wc.cnt, 0) AS BIGINT) AS true_count,
           CAST(pest.cm_est AS BIGINT) AS cm_est
    FROM probes p
    LEFT JOIN wc ON wc.w = p.word
    LEFT JOIN pest ON pest.word = p.word
    """,
    tags=("statistics", "sketch", "llm"),
)
def x_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimates, built from the
    engine-agnostic md5 double-hash family (same construction as the
    oracle-verified MinHash in llm/dedup.py): depth d=4, width w=256,
    hash_j(x) = ((h1 + j*h2) mod P) mod w with P = 2^31-1 and (h1,
    h2) the two 60-bit md5 halves. Unlike HLL/t-digest the sketch is
    a deterministic function of the multiset, so DuckDB reproduces
    every cell — and the estimate — bit-for-bit.

    Scale shape: one shuffle to count distinct words, then the sketch
    is d*w = 1024 cells regardless of corpus size; probe estimation
    is a broadcast join against those cells. The mergeability that
    makes count-min right at 100 TB (cells add across partitions) is
    exactly what the groupBy-SUM expresses."""
    P, W, D = 2147483647, 256, 4
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        F.explode(F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")).alias("w")
    )
    wc = occ.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    h = wc.select(
        "w",
        "cnt",
        (F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long") % P).alias("h1"),
        (F.conv(F.substring(F.md5("w"), 17, 15), 16, 10).cast("long") % P).alias("h2"),
    )
    js = spark.range(D).select(F.col("id").cast("int").alias("j"))
    cells = (
        h.crossJoin(F.broadcast(js))
        .select(
            "j",
            (((F.col("h1") + F.col("j") * F.col("h2")) % P) % W).alias("bucket"),
            "cnt",
        )
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("c"))
    )
    probes = spark.createDataFrame([(w,) for w in _CM_PROBES], "word string")
    ph = probes.select(
        "word",
        (F.conv(F.substring(F.md5("word"), 1, 15), 16, 10).cast("long") % P).alias("h1"),
        (F.conv(F.substring(F.md5("word"), 17, 15), 16, 10).cast("long") % P).alias("h2"),
    )
    pest = (
        ph.crossJoin(F.broadcast(js))
        .withColumn("bucket", ((F.col("h1") + F.col("j") * F.col("h2")) % P) % W)
        .join(F.broadcast(cells), ["j", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_est"))
    )
    # pre-filter word counts to the probe set (pushed-down IN filter)
    # so the broadcast is <=len(probes) rows, never the full vocabulary
    wc_probe = wc.filter(F.col("w").isin(list(_CM_PROBES))).withColumnRenamed(
        "w", "word"
    )
    return (
        probes.join(F.broadcast(wc_probe), "word", "left")
        .join(F.broadcast(pest), "word", "left")
        .select(
            "word",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("true_count"),
            F.col("cm_est").cast("bigint").alias("cm_est"),
        )
    )


@query(
    "x_bloom_prune",
    oracle="""
    WITH build AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_totalprice > 400000.0
    ),
    bh AS (
        SELECT k,
               CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
                   % 2147483647 AS h1,
               CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 17, 15) AS BIGINT)
                   % 2147483647 AS h2
        FROM build
    ),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    bits AS (
        SELECT DISTINCT j, ((h1 + j * h2) % 2147483647) % 4096 AS cell
        FROM bh CROSS JOIN js
    ),
    ph AS (
        SELECT c_custkey,
               CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
                    AS BIGINT) % 2147483647 AS h1,
               CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 17, 15)
                    AS BIGINT) % 2147483647 AS h2
        FROM customer
    ),
    probe AS (
        SELECT p.c_custkey,
               COUNT(b.cell) AS hits
        FROM ph p
        CROSS JOIN js
        LEFT JOIN bits b
          ON b.j = js.j
         AND b.cell = ((p.h1 + js.j * p.h2) % 2147483647) % 4096
        GROUP BY p.c_custkey
    )
    SELECT pr.c_custkey,
           pr.hits = 4 AS bloom_pass,
           bu.k IS NOT NULL AS is_member
    FROM probe pr
    LEFT JOIN build bu ON bu.k = pr.c_custkey
    """,
    tags=("statistics", "sketch", "join"),
)
def x_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, relationally expressed with the
    engine-agnostic md5 double-hash family: build a d=4 / m=4096
    Bloom filter over the distinct customer keys of high-value orders,
    then probe every customer — `bloom_pass` is the filter's verdict,
    `is_member` the exact semi-join truth, so false positives are
    visible (never false negatives, the Bloom guarantee).

    Scale shape: the filter is at most d*m = 16384 (j, cell) rows
    independent of build-side size — the distinct bit-set is what a
    100 TB pre-shuffle prune ships to every executor (broadcast),
    standing in for spark.sql.optimizer.runtime.bloomFilter with
    deterministic, oracle-reproducible hashing. Probe-side work is one
    broadcast join, no shuffle of the big side."""
    P, M, D = 2147483647, 4096, 4

    def _h(col, idx):
        s = F.md5(col.cast("string"))
        h1 = F.conv(F.substring(s, 1, 15), 16, 10).cast("long") % P
        h2 = F.conv(F.substring(s, 17, 15), 16, 10).cast("long") % P
        return ((h1 + idx * h2) % P) % M

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    build = o.filter(F.col("o_totalprice") > 400000.0).select(
        F.col("o_custkey").alias("k")
    ).distinct()
    js = spark.range(D).select(F.col("id").cast("int").alias("j"))
    bits = (
        build.crossJoin(F.broadcast(js))
        .select("j", _h(F.col("k"), F.col("j")).alias("cell"))
        .distinct()
    )
    probe = (
        c.select("c_custkey")
        .crossJoin(F.broadcast(js))
        .withColumn("cell", _h(F.col("c_custkey"), F.col("j")))
        .join(F.broadcast(bits.withColumn("__hit", F.lit(1))), ["j", "cell"], "left")
        .groupBy("c_custkey")
        .agg(F.count("__hit").alias("hits"))
    )
    return (
        probe.join(
            F.broadcast(build.withColumn("__m", F.lit(1))),
            probe.c_custkey == F.col("k"),
            "left",
        )
        .select(
            "c_custkey",
            (F.col("hits") == D).alias("bloom_pass"),
            F.col("__m").isNotNull().alias("is_member"),
        )
    )


@query(
    "x_agg_boolean_set",
    oracle="""
    SELECT o_orderpriority AS pri,
           bool_and(o_totalprice > 5000) AS all_big,
           bool_or(o_orderstatus = 'F') AS any_f,
           COUNT(*) AS n,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
               AS statuses
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("aggregate", "boolean"),
)
def x_agg_boolean_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's remaining aggregate family: EVERY/SOME/ANY
    (RustSqlRuntimeLibrary.java:66-68 — boolean aggregates) as Spark
    bool_and/bool_or, and SET_AGG (:70) as sorted collect_set joined
    to a string — raw array output columns are not hashable by the
    driver's pandas canonicalizer, so the sorted set is emitted as a
    comma-joined string (same contract as array_functions). Map-side
    partial aggregation applies to all four — booleans fold to one
    byte per group, the set is bounded by the status domain."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.bool_and(F.col("o_totalprice") > 5000).alias("all_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
        F.count("*").alias("n"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
    )


@query(
    "x_sketch_hll",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM events
    ),
    slots AS (SELECT event_type, h % 512 AS bucket, h >> 9 AS w FROM h),
    regs AS (
        SELECT event_type, bucket,
               MAX(CASE WHEN w > 0 THEN 52 - length(bin(w)) ELSE 52 END) AS m
        FROM slots GROUP BY event_type, bucket
    ),
    agg AS (
        SELECT event_type,
               COUNT(*) AS n_present,
               SUM(CAST(1 AS BIGINT) << CAST(52 - m AS INTEGER)) AS int_sum
        FROM regs GROUP BY event_type
    ),
    est AS (
        SELECT event_type,
               512 - n_present AS v,
               (0.7213 / (1 + 1.079 / 512)) * 512.0 * 512.0
                   / ((int_sum + (512 - n_present)
                       * (CAST(1 AS BIGINT) << 52)) / pow(2.0, 52)) AS raw_e
        FROM agg
    ),
    ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
           FROM events GROUP BY event_type)
    SELECT e.event_type,
           round(CASE WHEN e.raw_e <= 2.5 * 512 AND e.v > 0
                      THEN 512.0 * ln(512.0 / e.v) ELSE e.raw_e END,
                 6) AS est_distinct,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           round(round(CASE WHEN e.raw_e <= 2.5 * 512 AND e.v > 0
                            THEN 512.0 * ln(512.0 / e.v) ELSE e.raw_e END, 6)
                 / ex.exact_distinct - 1, 6) AS rel_err
    FROM est e JOIN ex USING (event_type)
    """,
    tags=("statistics", "sketch", "llm"),
)
def x_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) per
    group, ORACLE-EXACT: the register array is a deterministic
    function of the md5 hash (bucket = low 9 bits, rho = leading-zero
    rank of the remaining 51), and the harmonic sum folds as an exact
    INTEGER (sum of 2^(52-M_j) fits a BIGINT) so no float-order
    nondeterminism exists anywhere — unlike Spark's built-in
    approx_count_distinct whose HLL++ internals are engine-specific.
    Small-range linear counting (m*ln(m/V)) and the raw harmonic
    estimate are both exercised across the test SFs.

    Scale shape: ONE shuffle to max 512 registers per group (map-side
    partial max), then a per-group constant-size fold — the sketch is
    mergeable across partitions by construction, which is what makes
    HLL the 100 TB cardinality tool. Estimates round to 6 dp (ln's
    last ulp differs between JVM and libm)."""
    m = 512
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    slots = e.select(
        "event_type", (h % m).alias("bucket"), F.shiftright(h, 9).alias("w")
    )
    rho = F.when(F.col("w") > 0, F.lit(52) - F.length(F.bin(F.col("w")))).otherwise(
        F.lit(52)
    )
    regs = slots.groupBy("event_type", "bucket").agg(F.max(rho).alias("m"))
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - m AS INT))")
        ).alias("int_sum"),
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    int_full = F.col("int_sum") + (F.lit(m) - F.col("n_present")) * F.shiftleft(
        F.lit(1).cast("long"), 52
    )
    raw_e = F.lit(alpha) * m * m / (int_full / F.pow(F.lit(2.0), 52))
    v = F.lit(m) - F.col("n_present")
    est = F.round(
        F.when((raw_e <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v))
        .otherwise(raw_e),
        6,
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return (
        agg.select("event_type", est.alias("est_distinct"))
        .join(ex, "event_type")
        .select(
            "event_type",
            "est_distinct",
            "exact_distinct",
            F.round(F.col("est_distinct") / F.col("exact_distinct") - 1, 6).alias(
                "rel_err"
            ),
        )
    )


@query(
    "x_event_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
           GROUP BY e.user_id)
    SELECT u.user_id, s1.t1 AS signup_ts, s2.t2 AS click_ts,
           s3.t3 AS purchase_ts,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     WHEN s1.t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS funnel_stage
    FROM u LEFT JOIN s1 USING (user_id)
           LEFT JOIN s2 USING (user_id)
           LEFT JOIN s3 USING (user_id)
    """,
    tags=("analytics", "events", "funnel"),
)
def x_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → first click AFTER it →
    first purchase AFTER that) per user — the product-analytics shape
    that needs event SEQUENCING, not mere presence: each stage's
    timestamp is the min over events strictly later than the previous
    stage. Three grouped mins, each joined back on user_id (equi-joins
    a 100 TB event log shuffles by user anyway; stages 2-3 shrink to
    converting users only)."""
    e = load_table(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    s2 = (
        e.join(s1, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("signup_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    s3 = (
        e.join(s2, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("click_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .when(F.col("signup_ts").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("funnel_stage"),
        )
    )


@query(
    "x_sessionize_events",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM o
    ),
    numbered AS (
        SELECT user_id, event_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           -- microsecond granularity: at the storage resolution
           -- boundary-counting (DuckDB date_diff) and elapsed-time
           -- truncation (Spark timestampdiff) agree exactly
           CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
               AS duration_us
    FROM numbered GROUP BY user_id, session_no
    """,
    tags=("analytics", "events", "session"),
)
def x_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a TABLE (complement of the
    session-WINDOW aggregates in nexmark/streaming): a >30-min gap
    starts a new session; session ids come from the classic
    lag-detect + running-sum-of-starts trick — two window passes over
    ONE user_id exchange (same partitioning, Catalyst reuses it),
    then a grouped rollup per session. Deterministic under ts ties
    via the event_id tiebreak."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy(
            "user_id", F.col("session_no").cast("bigint").alias("session_no")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .withColumn(
            "duration_us",
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end)"
            ).cast("bigint"),
        )
    )


@query(
    "x_robust_stats_winsorized",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    ),
    c AS (
        SELECT e.event_type,
               CAST(least(greatest(e.value, q.p05), q.p95)
                    AS DECIMAL(18,6)) AS w
        FROM events e JOIN q USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(w) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*)
               AS winsorized_mean,
           CAST(MIN(w) AS DOUBLE) AS w_min,
           CAST(MAX(w) AS DOUBLE) AS w_max
    FROM c GROUP BY event_type
    """,
    tags=("statistics", "robust", "aggregate"),
)
def x_robust_stats_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) robust mean per group — the
    outlier-resistant aggregation quality-score pipelines use instead
    of a raw mean. The clamped values sum as DECIMAL(38,6), so the
    mean is deterministic under any partitioning (a double sum's
    low bits depend on reduction order); the percentile bounds
    interpolate identically in both engines (the median_quantiles
    precedent). Two shuffles: the percentile agg (tiny result,
    broadcast back onto the scan) and the grouped fold."""
    e = load_table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.05)).alias("p05"),
        F.percentile(F.col("value"), F.lit(0.95)).alias("p95"),
    )
    w = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).cast(
        "decimal(18,6)"
    )
    c = e.join(F.broadcast(q), "event_type").select("event_type", w.alias("w"))
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum("w").cast("decimal(38,6)").cast("double") / F.count(F.lit(1))
        ).alias("winsorized_mean"),
        F.min("w").cast("double").alias("w_min"),
        F.max("w").cast("double").alias("w_max"),
    )


@query(
    "y_hll_rollup",
    oracle="""
    WITH h AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM events
    ),
    slots AS (SELECT event_type, day, h % 512 AS bucket, h >> 9 AS w FROM h),
    regs_day AS (
        SELECT event_type, day, bucket,
               MAX(CASE WHEN w > 0 THEN 52 - length(bin(w)) ELSE 52 END) AS m
        FROM slots GROUP BY event_type, day, bucket
    ),
    est_day AS (
        SELECT event_type, day,
               512 - COUNT(*) AS v,
               (0.7213 / (1 + 1.079 / 512)) * 512.0 * 512.0
                   / ((SUM(CAST(1 AS BIGINT) << CAST(52 - m AS INTEGER))
                       + (512 - COUNT(*)) * (CAST(1 AS BIGINT) << 52))
                      / pow(2.0, 52)) AS raw_e
        FROM regs_day GROUP BY event_type, day
    ),
    day_final AS (
        SELECT event_type, day,
               CASE WHEN raw_e <= 2.5 * 512 AND v > 0
                    THEN 512.0 * ln(512.0 / v) ELSE raw_e END AS est
        FROM est_day
    ),
    regs_merged AS (
        SELECT event_type, bucket, MAX(m) AS m
        FROM regs_day GROUP BY event_type, bucket
    ),
    est_merged AS (
        SELECT event_type,
               512 - COUNT(*) AS v,
               (0.7213 / (1 + 1.079 / 512)) * 512.0 * 512.0
                   / ((SUM(CAST(1 AS BIGINT) << CAST(52 - m AS INTEGER))
                       + (512 - COUNT(*)) * (CAST(1 AS BIGINT) << 52))
                      / pow(2.0, 52)) AS raw_e
        FROM regs_merged GROUP BY event_type
    )
    SELECT em.event_type,
           CAST(d.n_days AS BIGINT) AS n_days,
           round(CASE WHEN em.raw_e <= 2.5 * 512 AND em.v > 0
                      THEN 512.0 * ln(512.0 / em.v) ELSE em.raw_e END, 4)
               AS est_merged,
           round(d.sum_day_est, 4) AS sum_day_est,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
    FROM est_merged em
    JOIN (SELECT event_type, COUNT(*) AS n_days,
                 SUM(round(est, 6)) AS sum_day_est
          FROM day_final GROUP BY event_type) d USING (event_type)
    JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type) ex USING (event_type)
    """,
    tags=("statistics", "sketch", "llm"),
)
def y_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register ROLLUP — the property that makes sketches the
    100 TB cardinality tool: per-(event_type, day) register arrays
    merge LOSSLESSLY to the event_type level by bucket-wise MAX, so a
    pre-aggregated daily sketch table answers coarser distinct-count
    questions without rescanning raw events (Agarwal et al.,
    "Mergeable Summaries"; reference parity: the HLL pipeline of
    x_sketch_hll lifted to a two-level hierarchy). Output per type:
    the merged estimate (union semantics — users deduplicate across
    days), the SUM of per-day estimates (≥ merged; the gap is the
    cross-day overlap a naive per-day rollup double-counts), and the
    exact distinct for reference. Deterministic end-to-end: registers
    are md5-derived integers, the harmonic fold is exact BIGINT
    arithmetic (see x_sketch_hll), estimates round before the
    float-order-free single-row sums."""
    m = 512
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    slots = e.select(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        (h % m).alias("bucket"),
        F.shiftright(h, 9).alias("w"),
    )
    rho = F.when(F.col("w") > 0, F.lit(52) - F.length(F.bin(F.col("w")))).otherwise(
        F.lit(52)
    )
    # ONE register shuffle at the finest grain; every coarser level is
    # a bucket-wise MAX over 512-row groups (mergeable, no rescan)
    regs_day = slots.groupBy("event_type", "day", "bucket").agg(F.max(rho).alias("m"))

    def estimate(regs: DataFrame, keys: list[str], ndp: int) -> DataFrame:
        agg = regs.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - m AS INT))")
            ).alias("int_sum"),
        )
        alpha = 0.7213 / (1 + 1.079 / m)
        int_full = F.col("int_sum") + (F.lit(m) - F.col("n_present")) * F.shiftleft(
            F.lit(1).cast("long"), 52
        )
        raw_e = F.lit(alpha) * m * m / (int_full / F.pow(F.lit(2.0), 52))
        v = F.lit(m) - F.col("n_present")
        est = F.round(
            F.when(
                (raw_e <= 2.5 * m) & (v > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / v),
            ).otherwise(raw_e),
            ndp,
        )
        return agg.select(*keys, est.alias("est"))

    day_est = estimate(regs_day, ["event_type", "day"], 6)
    merged = estimate(
        regs_day.groupBy("event_type", "bucket").agg(F.max("m").alias("m")),
        ["event_type"],
        4,
    )
    per_day = day_est.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.sum("est"), 4).alias("sum_day_est"),
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return (
        merged.select("event_type", F.col("est").alias("est_merged"))
        .join(per_day, "event_type")
        .join(ex, "event_type")
        .select("event_type", "n_days", "est_merged", "sum_day_est", "exact_distinct")
    )


@query(
    "y_retention_cohorts",
    oracle="""
    WITH act AS (
        SELECT user_id, date_trunc('week', ts) AS week
        FROM events GROUP BY user_id, date_trunc('week', ts)
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id),
    sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_week)
    SELECT c.cohort_week,
           (epoch_us(a.week) - epoch_us(c.cohort_week)) // 604800000000
               AS weeks_since,
           COUNT(*) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(CAST(COUNT(*) AS DOUBLE) / s.cohort_size, 9) AS retention
    FROM act a JOIN cohort c USING (user_id)
    JOIN sizes s ON s.cohort_week = c.cohort_week
    GROUP BY c.cohort_week,
             (epoch_us(a.week) - epoch_us(c.cohort_week)) // 604800000000,
             s.cohort_size
    """,
    tags=("statistics", "analytics", "events"),
)
def y_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics rollup
    (users bucketed by first-active week; per cohort, the share still
    active k weeks later). Scale shape: distinct (user, week) pairs in
    one map-side-combined shuffle, cohorts as a MIN aggregate over
    that (no second scan of raw events), sizes broadcast back. User
    activity histories never co-locate beyond the user_id shuffle —
    no per-user sort, no window. weeks_since is exact integer
    microsecond arithmetic over the Monday-aligned week starts (both
    engines truncate weeks to Monday; weeks are a fixed 604800 s in
    the UTC session, so the epoch quotient is exact)."""
    e = load_table(spark, sf_dir, "events")
    act = (
        e.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("week"),
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                (F.unix_micros("week") - F.unix_micros("cohort_week"))
                / F.lit(604800000000)
            )
            .cast("bigint")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 9
            ).alias("retention"),
        )
    )


@query(
    "y_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(value AS DECIMAL(18,6)) AS v,
               epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS t_next
        FROM events
    ),
    seg AS (
        SELECT user_id, v * (t_next - t) AS num_part, t_next - t AS dur
        FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_segments,
           CAST(SUM(dur) AS BIGINT) AS span_us,
           round(CAST(SUM(num_part) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 9)
               AS twa_value
    FROM seg GROUP BY user_id
    """,
    tags=("statistics", "analytics", "events", "window"),
)
def y_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of a sampled metric — the
    correct mean for irregularly-sampled series (a value 'holds'
    until the next observation; plain AVG over-weights bursts). Each
    value is weighted by its hold duration in MICROSECONDS (the one
    granularity both engines agree on for elapsed time) and the fold
    is exact: value → DECIMAL(18,6), duration → BIGINT, so Σ v·Δt and
    Σ Δt are order-independent decimal/integer sums under any
    partitioning — only the final division is float. One user_id
    shuffle with an in-partition (ts, event_id) sort; no
    driver-side state."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (nanos parquet → truncated); unix_micros
    # needs LTZ — the cast is value-preserving under the pinned UTC
    # session timezone
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    seq = e.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        t_us.alias("t"),
        F.lead(t_us).over(w).alias("t_next"),
    ).where(F.col("t_next").isNotNull())
    seg = seq.select(
        "user_id",
        (F.col("v") * (F.col("t_next") - F.col("t"))).alias("num_part"),
        (F.col("t_next") - F.col("t")).alias("dur"),
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dur").cast("bigint").alias("span_us"),
        F.round(
            F.sum("num_part").cast("double") / F.sum("dur").cast("double"), 9
        ).alias("twa_value"),
    )


@query(
    "y_salted_join_skew",
    oracle="""
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(SUM(CAST(e.value AS DECIMAL(18,6))), 6) AS total_value,
           c.c_name
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type <> 'error'
    GROUP BY e.user_id, c.c_name
    """,
    tags=("join", "skew", "operators"),
)
def y_salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting operator (operators/skew.py::salted_join) under
    the driver gate: events⋈customer on the skewed user key with the
    probe side scattered across 8 salt replicas of the build side —
    result provably identical to the plain join (the oracle IS the
    plain join). This is the static fallback for the key-hotter-than-
    one-task regime AQE's skew split can't fix (a single key
    oversized even after splitting); the post-join aggregate uses a
    DECIMAL-exact sum so the value hash is partition-order-free."""
    from sql_to_dbsp_compiler_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").where(F.col("event_type") != "error")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = salted_join(e, c, "user_id", "c_custkey", salt=8)
    return joined.groupBy("user_id", "c_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("total_value"),
    ).select("user_id", "n_events", "total_value", "c_name")


@query(
    "y_skyline_pareto",
    oracle="""
    SELECT a.p_partkey, a.p_brand, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (SELECT 1 FROM part b
        WHERE b.p_brand = a.p_brand
          AND b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    """,
    tags=("skyline", "operators"),
)
def y_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 2-D SKYLINE (Pareto frontier): parts not dominated
    within their brand — no other same-brand part is cheaper-or-equal
    AND bigger-or-equal with one strict. The textbook plan is the
    oracle's quadratic NOT EXISTS self-join; the engine plan is the
    sort-based linear scan (Borzsony/Kossmann/Stocker ICDE'01
    specialized to 2-D): collapse to one row per (brand, price) with
    the group's max size (one hash agg), then a per-brand
    cumulative-max window over price order — a row survives iff it
    carries its price group's max size and strictly exceeds every
    cheaper group's max. Ties on both dims survive together (neither
    strictly dominates), pinned by duplicate prices in the data.
    Scale: one shuffle on (brand, price), one windowed pass per
    brand; no self-join, nothing quadratic, parallel across brands."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    g = p.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("__gmax")
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g2 = g.withColumn("__m1", F.max("__gmax").over(w))
    return (
        p.join(g2, ["p_brand", "p_retailprice"])
        .where(
            (F.col("__m1").isNull() | (F.col("__m1") < F.col("p_size")))
            & (F.col("p_size") == F.col("__gmax"))
        )
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
    )


@query(
    "y_grouped_corr",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(value AS DECIMAL(18,6)) AS x,
               CAST(CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS DECIMAL(18,6)) AS y
        FROM events
    ),
    s AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM b GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
               AS corr_value_hour
    FROM s
    """,
    tags=("statistics", "aggregate"),
)
def y_grouped_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation (value vs hour-of-day per event
    type) computed EXACTLY from five decimal-widened sums
    (n, Σx, Σy, Σxy, Σx², Σy²) with the final ratio in double — the
    one-pass textbook decomposition. The builtin corr() aggregates
    doubles in partition order (non-deterministic low bits at 1000
    executors); decimal sums are associative-exact, so the value hash
    is stable under ANY partitioning — the same determinism pattern
    as every money aggregate in this repo. One scan, one hash
    aggregate."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("x"),
        F.hour("ts").cast("bigint").cast("decimal(18,6)").alias("y"),
    )
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            9,
        ).alias("corr_value_hour"),
    )


@query(
    "y_benford_digits",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(substring(CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit
        FROM events WHERE value >= 1
    ),
    c AS (SELECT event_type, digit, COUNT(*) AS n FROM d GROUP BY 1, 2),
    t AS (SELECT event_type, SUM(n) AS total FROM c GROUP BY event_type)
    SELECT c.event_type, c.digit, CAST(c.n AS BIGINT) AS n,
           round(CAST(c.n AS DOUBLE) / t.total, 9) AS obs_share,
           round(log10(1.0 + 1.0 / c.digit), 9) AS benford_share
    FROM c JOIN t ON c.event_type = t.event_type
    """,
    tags=("statistics", "quality"),
)
def y_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit per event type — the classic
    fabricated-data / instrumentation-bug detector (natural
    multi-scale positive values follow P(d) = log10(1+1/d); uniform
    or templated generators don't). The first digit comes from the
    INTEGER part via bigint-to-string (FLOOR then cast — engines
    format integers identically, where float-to-string and
    log10-near-power-of-10 both have cross-engine edge risk).
    Integer counts and one small join; every share divides exact
    counts."""
    e = load_table(spark, sf_dir, "events").where(F.col("value") >= 1)
    d = e.select(
        "event_type",
        F.substring(
            F.floor("value").cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("digit"),
    )
    c = d.groupBy("event_type", "digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (
        c.join(t, "event_type")
        .select(
            "event_type",
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n").cast("double") / F.col("total"), 9).alias("obs_share"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 9).alias("benford_share"),
        )
    )


@query(
    "y_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(FLOOR(epoch(ts) * 1000000) AS BIGINT) AS s_us,
               CAST(FLOOR(epoch(ts) * 1000000) AS BIGINT)
                   + CAST(round(value * 1000000) AS BIGINT) AS e_us
        FROM events WHERE user_id <= 50
    ),
    m AS (
        SELECT user_id, event_id, s_us, e_us,
               MAX(e_us) OVER (PARTITION BY user_id
                               ORDER BY s_us, e_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max
        FROM iv
    ),
    isl AS (
        SELECT user_id, s_us, e_us,
               SUM(CASE WHEN prev_max IS NULL OR s_us > prev_max
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id
                         ORDER BY s_us, e_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS island
        FROM m
    ),
    spans AS (
        SELECT user_id, island,
               MIN(s_us) AS s0, MAX(e_us) AS e1
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(e1 - s0) AS BIGINT) AS covered_us
    FROM spans GROUP BY user_id
    """,
    tags=("window", "intervals", "gaps-islands"),
)
def y_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: merge each user's overlapping activity
    intervals ([ts, ts + value seconds), microsecond-exact integer
    endpoints) and report merged-island count + total covered time —
    the canonical SQL pattern for uptime/coverage/billing dedup. A
    new island starts when an interval begins AFTER the running max
    end of everything before it (exclusive-frame cumulative max);
    the island id is the running sum of those starts. All integer
    arithmetic, two windows over ONE user_id sort order, one
    aggregate — no self-join, no recursion (the naive formulation is
    a quadratic interval self-join; the bucketized variant of that
    join lives in operators/interval_join.py for the cross-relation
    case)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    # ts is TIMESTAMP_NTZ; unix_micros needs LTZ (session is UTC)
    s_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    iv = e.select(
        "user_id",
        "event_id",
        s_us.alias("s_us"),
        (s_us + F.round(F.col("value") * 1_000_000).cast("bigint")).alias("e_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.withColumn("prev_max", F.max("e_us").over(w_prev))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("s_us") > F.col("prev_max")),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).over(w_run),
    )
    spans = isl.groupBy("user_id", "island").agg(
        F.min("s_us").alias("s0"), F.max("e_us").alias("e1")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("e1") - F.col("s0")).cast("bigint").alias("covered_us"),
    )


@query(
    "y_event_rate_anomaly",
    oracle="""
    WITH hc AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type, h, c,
               COUNT(*) OVER w AS k,
               SUM(c) OVER w AS sc,
               SUM(c * c) OVER w AS scc
        FROM hc
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h, CAST(c AS BIGINT) AS c,
           CAST(k AS BIGINT) AS k_trailing,
           round((c - CAST(sc AS DOUBLE) / k)
                 / sqrt((k * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc)
                        / (CAST(k AS DOUBLE) * (k - 1))), 9) AS z
    FROM t
    WHERE k >= 12
      AND (k * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc) > 0
    """,
    tags=("statistics", "window", "monitoring"),
)
def y_event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score rate-anomaly detector over the hourly event
    series per type — the standard ingest-monitoring primitive (a
    pipeline stall or a bot burst shows as |z| spiking). Mean and
    variance of the TRAILING 24 observed hours come from exact
    integer window sums (Σc, Σc²) — sample variance via the
    k·Σc²−(Σc)² identity, divisions only at the end — so the hash is
    stable anywhere. Requires ≥12 trailing points and nonzero
    variance; the current hour is excluded from its own baseline
    (1 PRECEDING). Two shuffles total: the hourly count aggregate,
    then one window over event_type."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    hc = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    t = hc.select(
        "event_type",
        "h",
        "c",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("c").over(w).alias("sc"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("scc"),
    )
    k = F.col("k").cast("double")
    sc, scc = F.col("sc").cast("double"), F.col("scc").cast("double")
    var_num = F.col("k") * scc - sc * F.col("sc").cast("double")
    return (
        t.where((F.col("k") >= 12) & (var_num > 0))
        .select(
            "event_type",
            "h",
            F.col("c").cast("bigint").alias("c"),
            F.col("k").cast("bigint").alias("k_trailing"),
            F.round(
                (F.col("c") - sc / k) / F.sqrt(var_num / (k * (k - 1))), 9
            ).alias("z"),
        )
    )


@query(
    "y_share_of_parent",
    oracle="""
    WITH c AS (
        SELECT source, lang, COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source, lang
    )
    SELECT source, lang, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY source), 9) AS share_in_source,
           round(CAST(n AS DOUBLE) / SUM(n) OVER (), 9) AS share_of_corpus,
           round(CAST(chars AS DOUBLE)
                 / SUM(chars) OVER (PARTITION BY source), 9)
               AS char_share_in_source
    FROM c
    """,
    tags=("statistics", "window", "rollup"),
)
def y_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent metrics (lang within source,
    source slice of corpus, char-weighted share) — the mixture report
    read before every domain-reweighting decision. Window aggregates
    over the GROUPED relation: the base aggregate reduces documents
    to |source|x|lang| rows, so the share windows run over dozens of
    rows, not the corpus — one scan, one hash aggregate, two tiny
    window passes. All shares divide exact integer sums."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    w_src = Window.partitionBy("source")
    w_all = Window.partitionBy()
    return c.select(
        "source",
        "lang",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.sum("n").over(w_src), 9).alias(
            "share_in_source"
        ),
        F.round(F.col("n").cast("double") / F.sum("n").over(w_all), 9).alias(
            "share_of_corpus"
        ),
        F.round(
            F.col("chars").cast("double") / F.sum("chars").over(w_src), 9
        ).alias("char_share_in_source"),
    )
