"""Tokenizer-training queries: BPE pair statistics (oracle-gated) and
iterative BPE merge learning (Python-replica-gated; see llm/bpe.py).

`x_bpe_pair_counts` is the first iteration of BPE as one SQL-shaped
pass — adjacent character pairs weighted by word frequency — and is
exactly reproducible in DuckDB, so it anchors the iterative learner's
starting state to the oracle. `x_bpe_learn` is the k-iteration loop
(genuinely not SQL-expressible; the driver records rows-only and the
exact gate lives in tests/test_bpe.py against a pure-Python replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.llm.bpe import learn_bpe, pair_counts, word_counts
from sql_to_dbsp_compiler_spark.llm.text import token_count_whitespace
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table

_TOPN = 20


@query(
    "x_bpe_pair_counts",
    oracle=f"""
    WITH w AS (
        SELECT word, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word <> '' GROUP BY word
    ), p AS (
        SELECT substring(word, i, 1) AS left_sym,
               substring(word, i + 1, 1) AS right_sym,
               n
        FROM w, unnest(generate_series(1, length(word) - 1)) AS t(i)
        WHERE length(word) >= 2
    )
    SELECT left_sym, right_sym, CAST(sum(n) AS BIGINT) AS pair_n
    FROM p GROUP BY left_sym, right_sym
    ORDER BY pair_n DESC, left_sym, right_sym LIMIT {_TOPN}
    """,
    tags=("llm", "tokenizer"),
)
def x_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} adjacent character pairs weighted by word frequency —
    BPE iteration zero. Two shuffles total (word groupBy, pair
    groupBy), both with map-side partial aggregation; the pair space
    is at most |charset|² so the second shuffle is tiny regardless of
    corpus size. Ordering is fully deterministic (count, then pair)."""
    d = load_table(spark, sf_dir, "documents")
    wc = word_counts(d)
    syms = F.filter(F.split(F.col("word"), ""), lambda s: s != "")
    pc = pair_counts(wc.select(syms.alias("syms"), "n"))
    return (
        pc.select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            F.col("n").cast("bigint").alias("pair_n"),
        )
        .orderBy(F.desc("pair_n"), "left_sym", "right_sym")
        .limit(_TOPN)
    )


@query("x_bpe_learn", oracle=None, tags=("llm", "tokenizer", "iterative"))
def x_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight learned BPE merges (merge_idx, left, right, pair_count).
    Iterative — each merge rewrites the vocabulary the next iteration
    counts, so there is no single-query oracle; tests/test_bpe.py pins
    the result against a pure-Python replica of the algorithm and
    x_bpe_pair_counts anchors iteration zero to DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(spark, d, num_merges=8)
    return spark.createDataFrame(
        merges, "merge_idx int, left string, right string, pair_count long"
    )


# --------------------------------------------------------------------
# x_token_budget_mix — per-source token-budget mixture selection
# --------------------------------------------------------------------

# token budget per source (tokens, whitespace count) — the mixture
# recipe a pretraining run pins ("N tokens of web, M of code, ...").
# Sized so the cut is exercised at every test SF (per-source totals
# are ~1.3k tokens at sf0.01, ~13k at sf0.1).
_BUDGETS = {"src0": 400, "src1": 900, "src2": 2000}
_BUDGET_DEFAULT = 700
_BUDGET_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _BUDGETS.items()
)


@query(
    "x_token_budget_mix",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), w -> w <> ''))
                   AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h,
               CASE source {_BUDGET_CASE} ELSE {_BUDGET_DEFAULT} END
                   AS budget
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tokens, budget,
               sum(n_tokens) OVER (PARTITION BY source
                                   ORDER BY h, doc_id) AS cum_tokens
        FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= budget
    """,
    tags=("llm", "training", "mixing"),
)
def x_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing under token budgets: each source contributes
    documents in a deterministic md5(doc_id) shuffle order until its
    token budget is exhausted (running window sum, cut at the budget).
    This is how a pretraining recipe pins "N tokens of web, M of
    wiki": reproducible across engines, reruns, and repartitioning
    because the selection order is a content hash, not rand() or
    partition order.

    Scale shape: ONE window shuffle partitioned by source. The
    per-source sort is the honest cost of an exact budget cut; at
    100 TB with few sources the sort is the skew risk, so a real run
    would pre-aggregate n_tokens per doc (done here scan-side) and,
    if a source dominates, two-phase it: hash-range prefix-sum the
    per-bucket token totals, broadcast the cut bucket, and sort only
    within it. The exact windowed form is the oracle-checkable
    semantics both share."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
    )
    budget = F.lit(_BUDGET_DEFAULT)
    for k, v in _BUDGETS.items():
        budget = F.when(F.col("source") == k, v).otherwise(budget)
    t = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        budget.alias("budget"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= F.col("budget"))
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


# --------------------------------------------------------------------
# x_equidepth_hist — exact equi-depth histogram (ANALYZE statistics)
# --------------------------------------------------------------------

_HIST_BUCKETS = 16


@query(
    "x_equidepth_hist",
    oracle=f"""
    WITH q AS (
        SELECT quantile_disc(value,
            [{", ".join(f"{b}/{_HIST_BUCKETS}.0" for b in range(1, _HIST_BUCKETS + 1))}])
            AS qs
        FROM events
    ), b AS (SELECT unnest(generate_series(1, {_HIST_BUCKETS})) AS bucket)
    SELECT CAST(b.bucket AS INT) AS bucket, q.qs[b.bucket] AS upper_bound
    FROM q, b
    """,
    tags=("profiling", "stats", "histogram"),
)
def x_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram of events.value: the 16 discrete
    quantile upper bounds (the statistics a cost-based optimizer keeps
    per column, computed the ANALYZE way). Discrete quantiles
    (percentile_disc semantics — an actual data value, no
    interpolation) make the result engine-exact, so the oracle matches
    bit-for-bit where continuous percentiles would diverge in float
    interpolation order.

    Scale shape: Spark evaluates all 16 quantiles in ONE sort-based
    aggregate pass (a single `percentile_disc` array literal would do
    the same; the per-bucket rows here keep the output shape
    relational). For 100 TB production use the swap is
    approx_percentile with a pinned accuracy — the documented
    trade; exact is kept because the oracle pins it value-for-value."""
    d = load_table(spark, sf_dir, "events")
    qs = [
        F.expr(
            f"percentile_disc({b}/{_HIST_BUCKETS}.0) WITHIN GROUP (ORDER BY value)"
        ).alias(f"q{b}")
        for b in range(1, _HIST_BUCKETS + 1)
    ]
    wide = d.agg(*qs)
    stack = ", ".join(
        f"{b}, q{b}" for b in range(1, _HIST_BUCKETS + 1)
    )
    return wide.selectExpr(
        f"stack({_HIST_BUCKETS}, {stack}) AS (bucket, upper_bound)"
    ).select(F.col("bucket").cast("int").alias("bucket"), "upper_bound")


@query(
    "x_group_sample",
    oracle="""
    SELECT lang, doc_id, rn FROM (
        SELECT lang, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                    AS BIGINT) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
    tags=("llm", "training", "sampling"),
)
def x_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling (5 docs per language by
    md5(doc_id) order) — the eval-set / human-review draw that must be
    reproducible across engines and reruns, unlike rand() or
    TABLESAMPLE. WindowGroupLimit trims each map partition to its
    per-group top-5 candidates before the single rank shuffle."""
    from sql_to_dbsp_compiler_spark.operators.topk import topk_per_group

    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    return (
        topk_per_group(d, ["lang"], [F.col("h"), F.col("doc_id")], 5)
        .withColumn("rn", F.col("rn").cast("bigint"))
        .select("lang", "doc_id", "rn")
    )


@query(
    "x_group_sample_weighted",
    oracle="""
    SELECT lang, doc_id, n_chars, es_key, rn FROM (
        SELECT lang, doc_id, n_chars,
               round(-ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                                  1, 15)) AS BIGINT)
                          % 1000000000 + 0.5) / 1e9) / n_chars, 9) AS es_key,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY round(-ln((CAST(('0x' ||
                        substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 1000000000 + 0.5) / 1e9) / n_chars, 9),
                        doc_id)
                    AS BIGINT) AS rn
        FROM documents WHERE n_chars > 0
    ) WHERE rn <= 5
    """,
    tags=("llm", "training", "sampling"),
)
def x_group_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED k-per-group sampling without replacement (Efraimidis &
    Spirakis 2006 A-ES): per doc the key is −ln(u)/w with u a
    deterministic md5 uniform and w = n_chars; the k smallest keys per
    group are a without-replacement draw with inclusion probability
    ∝ weight — longer documents are proportionally likelier to be
    drawn. Keys round to 9 dp (JVM/libm ln ulp; ties break on doc_id),
    so the draw is reproducible across engines. Same
    WindowGroupLimit shape as the uniform x_group_sample: per-group
    top-k trims map-side before the one rank shuffle."""
    from sql_to_dbsp_compiler_spark.operators.topk import topk_per_group

    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1_000_000_000
        + 0.5
    ) / 1.0e9
    d = d.select(
        "lang", "doc_id", "n_chars",
        F.round(-F.log(u) / F.col("n_chars"), 9).alias("es_key"),
    )
    return (
        topk_per_group(d, ["lang"], [F.col("es_key"), F.col("doc_id")], 5)
        .withColumn("rn", F.col("rn").cast("bigint"))
        .select("lang", "doc_id", "n_chars", "es_key", "rn")
    )


# --------------------------------------------------------------------
# x_shard_manifest — fixed-size training-shard layout + manifest
# --------------------------------------------------------------------

_SHARD_TOKENS = 4096


@query(
    "x_shard_manifest",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), w -> w <> ''))
                   AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens, h,
               sum(n_tokens) OVER (ORDER BY h, doc_id) - n_tokens AS start
        FROM t
    )
    SELECT CAST(start // {_SHARD_TOKENS} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           arg_min(doc_id, h || '|' || lpad(CAST(doc_id AS VARCHAR), 20, '0'))
               AS first_doc,
           arg_max(doc_id, h || '|' || lpad(CAST(doc_id AS VARCHAR), 20, '0'))
               AS last_doc
    FROM c GROUP BY 1
    """,
    tags=("llm", "training", "layout"),
)
def x_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard layout: the whole corpus streams in a
    deterministic md5 shuffle order and is cut into fixed
    token-budget shards; the manifest records per shard the doc
    count, token count, and first/last document. A doc belongs to the
    shard where its token stream STARTS (the pack_sequences rule).

    The global running total is the canonical single-sort bottleneck
    (ONE ordering over the whole corpus), so the Spark path uses the
    TWO-PHASE prefix sum (operators/prefix_sum.py): hash-prefix
    buckets → tiny offset table → bounded per-bucket sorts. The
    oracle's single-window form is the semantics both must equal."""
    from sql_to_dbsp_compiler_spark.operators.prefix_sum import prefix_sum_by_hash

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        token_count_whitespace(F.col("text")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.lit(0).alias("__g"),  # constant key: one global stream
    )
    c = prefix_sum_by_hash(t, "__g", "h", ["doc_id"], "n_tokens", "cum")
    c = c.withColumn("start", F.col("cum") - F.col("n_tokens"))
    # scalar order key (md5 is fixed-width hex, doc_id zero-padded):
    # DuckDB's arg_min/arg_max take scalar keys only
    ordk = F.concat(
        F.col("h"), F.lit("|"), F.lpad(F.col("doc_id").cast("string"), 20, "0")
    )
    return (
        c.groupBy(
            F.floor(F.col("start") / _SHARD_TOKENS).cast("bigint").alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
            F.min_by("doc_id", ordk).alias("first_doc"),
            F.max_by("doc_id", ordk).alias("last_doc"),
        )
    )


# --------------------------------------------------------------------
# x_bpe_encode — apply learned merges (the tokenizer's ENCODE half)
# --------------------------------------------------------------------

_BPE_MERGES_PATH = "/root/repo/.artifacts/bpe_merges.parquet"
_BPE_N_MERGES = 8

# The oracle applies the same persisted merge list as a fixed-depth
# fold of replace() calls (merge i's pattern/replacement come from
# scalar subqueries against the artifact). Encoding representation:
# every symbol is wrapped as (sym), so a merge is the literal
# replacement (l)(r) -> (lr) — token boundaries can never be shared
# between adjacent matches, which keeps engine replace() semantics
# (left-to-right, non-overlapping) identical to the per-array walk
# BPE uses. Token count per word = number of '(' in the encoding.
_ENC_INIT = "regexp_replace(word, '(.)', '(\\1)', 'g')"
_ENC_FOLD = _ENC_INIT
for _i in range(_BPE_N_MERGES):
    _ENC_FOLD = (
        f"replace({_ENC_FOLD}, "
        f"(SELECT '(' || left_sym || ')(' || right_sym || ')' FROM m "
        f"WHERE merge_idx = {_i}), "
        f"(SELECT '(' || left_sym || right_sym || ')' FROM m "
        f"WHERE merge_idx = {_i}))"
    )


@query(
    "x_bpe_encode",
    oracle=f"""
    WITH m AS (SELECT merge_idx, left_sym, right_sym
               FROM read_parquet('{_BPE_MERGES_PATH}/*.parquet')),
    w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS word
          FROM documents),
    enc AS (SELECT doc_id, word, {_ENC_FOLD} AS e FROM w)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(word)) AS BIGINT) AS n_char_tokens,
           CAST(SUM(length(e) - length(replace(e, '(', ''))) AS BIGINT)
               AS n_bpe_tokens,
           round(CAST(SUM(length(e) - length(replace(e, '(', '')))
                      AS DOUBLE) / SUM(length(word)), 6) AS compression
    FROM enc GROUP BY doc_id
    """,
    tags=("llm", "tokenizer"),
)
def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's ENCODE half (x_bpe_learn is the learn half):
    apply the learned merge list in rank order, each merge replacing
    left-to-right non-overlapping adjacent pairs. Symbols are wrapped
    as (sym) so replacements can never share a boundary — string
    replace() then has exactly the BPE array-walk semantics in both
    engines, which makes per-doc BPE token counts (the number a
    token-budget pipeline actually needs) fully oracle-gated: merges
    persist to parquet and DuckDB re-applies the identical fold.
    Scale shape: the merge chain is a pure per-row expression over
    the exploded word stream (broadcast-free: merges are inlined
    literals built driver-side from the tiny artifact), one groupBy
    doc."""
    import os

    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(spark, d, num_merges=_BPE_N_MERGES)
    os.makedirs(os.path.dirname(_BPE_MERGES_PATH), exist_ok=True)
    spark.createDataFrame(
        [(i, l, r) for i, l, r, _n in merges],
        "merge_idx int, left_sym string, right_sym string",
    ).repartition(1).write.mode("overwrite").parquet(_BPE_MERGES_PATH)

    w = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " ", -1), lambda x: x != "")
        ).alias("word"),
    )
    enc = F.regexp_replace(F.col("word"), "(.)", "($1)")
    for _i, l, r, _n in merges:
        enc = F.replace(enc, F.lit(f"({l})({r})"), F.lit(f"({l}{r})"))
    w = w.withColumn("e", enc)
    n_bpe = F.length("e") - F.length(F.replace(F.col("e"), F.lit("("), F.lit("")))
    return w.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.length("word")).cast("bigint").alias("n_char_tokens"),
        F.sum(n_bpe).cast("bigint").alias("n_bpe_tokens"),
        F.round(
            F.sum(n_bpe).cast("double") / F.sum(F.length("word")), 6
        ).alias("compression"),
    )


# --------------------------------------------------------------------
# x_cooccurrence_pmi — corpus word-association statistics
# --------------------------------------------------------------------

# Fractions of |corpus|, NOT absolute counts: an absolute df cap is a
# scale bug (at 10x the data every word crosses it and the result
# silently empties — caught by the sf0.1 spot check).
_PMI_MAX_DF_FRAC = 0.8   # drop words in more docs (stopword-ish)
_PMI_MIN_PAIR_FRAC = 0.01  # pair support floor


@query(
    "x_cooccurrence_pmi",
    oracle=f"""
    WITH n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    dw AS (
        SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, ' '),
                                                   x -> x <> '')) AS w
        FROM documents
    ),
    df AS (SELECT w, COUNT(*) AS d FROM dw GROUP BY w),
    kept AS (SELECT dw.doc_id, dw.w FROM dw JOIN df USING (w) CROSS JOIN n
             WHERE df.d <= {_PMI_MAX_DF_FRAC} * n.n_docs),
    pairs AS (
        SELECT a.doc_id, a.w AS w1, b.w AS w2
        FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.w < b.w
    ),
    pc AS (SELECT w1, w2, COUNT(*) AS n_ab FROM pairs GROUP BY w1, w2),
    scored AS (
        SELECT pc.w1, pc.w2, pc.n_ab, d1.d AS n_a, d2.d AS n_b,
               round(ln((CAST(pc.n_ab AS DOUBLE) * n.n_docs)
                        / (d1.d * CAST(d2.d AS DOUBLE))), 6) AS pmi
        FROM pc JOIN df d1 ON pc.w1 = d1.w
                JOIN df d2 ON pc.w2 = d2.w
                CROSS JOIN n
        WHERE pc.n_ab >= {_PMI_MIN_PAIR_FRAC} * n.n_docs
    )
    SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, pmi
    FROM scored
    QUALIFY ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) <= 50
    """,
    tags=("llm", "statistics", "corpus"),
)
def x_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over document-level word
    co-occurrence (the classic collocation/association statistic):
    PMI(a,b) = ln(P(a,b) / P(a)P(b)) with document-frequency
    probabilities, a df cap dropping stopword-ish terms (they pair
    with everything — Zipfian join fanout AND zero signal, the same
    guard as the dedup shingle joins), and a pair-support floor.
    Top-50 pairs by PMI with a total tie-break order.

    Scale shape: pairs are enumerated INSIDE each doc's (capped,
    sorted) distinct-word array — F.transform over the array, one
    linear explode, never a doc-keyed self-join shuffle of the token
    table; pair counts are one groupBy; df tables join back small.
    The oracle's equivalent self-join states the same semantics
    declaratively."""
    d = load_table(spark, sf_dir, "documents")
    dw = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col("text"), " ", -1), lambda x: x != "")
            )
        ).alias("w"),
    )
    from sql_to_dbsp_compiler_spark.sources.tables import rowcount

    n_docs = rowcount(d.select("doc_id").distinct())
    dfreq = dw.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
    kept = dw.join(dfreq.where(F.col("d") <= _PMI_MAX_DF_FRAC * n_docs), "w")
    # in-doc pair enumeration over the sorted word array (linear)
    arr = kept.groupBy("doc_id").agg(F.sort_array(F.collect_list("w")).alias("ws"))
    pairs = arr.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ws"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ws"), i + 2,
                            F.greatest(F.size("ws") - i - 1, F.lit(1)),
                        ),
                        lambda y: F.struct(x.alias("w1"), y.alias("w2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    scored = (
        pc.where(F.col("n_ab") >= _PMI_MIN_PAIR_FRAC * n_docs)
        .join(F.broadcast(dfreq.withColumnRenamed("d", "n_a")), pc.w1 == dfreq.w)
        .drop("w")
        .join(
            F.broadcast(dfreq.withColumnRenamed("d", "n_b")),
            F.col("w2") == dfreq.w,
        )
        .drop("w")
        .select(
            "w1", "w2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.log(
                    F.col("n_ab").cast("double") * n_docs
                    / (F.col("n_a") * F.col("n_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # TakeOrderedAndProject: per-partition heaps, no global sort
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(50)


@query(
    "y_zipf_slope",
    oracle="""
    WITH tok AS (
        SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x <> '')))
            AS word
        FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
    rk AS (SELECT word, cnt,
                  row_number() OVER (ORDER BY cnt DESC, word) AS rnk
           FROM freq),
    top AS (SELECT rnk, ln(CAST(rnk AS DOUBLE)) AS x,
                   ln(CAST(cnt AS DOUBLE)) AS y
            FROM rk WHERE rnk <= 200),
    s AS (SELECT COUNT(*) AS n,
                 list_reduce(list(x ORDER BY rnk), (a, b) -> a + b) AS sx,
                 list_reduce(list(y ORDER BY rnk), (a, b) -> a + b) AS sy,
                 list_reduce(list(x * y ORDER BY rnk), (a, b) -> a + b) AS sxy,
                 list_reduce(list(x * x ORDER BY rnk), (a, b) -> a + b) AS sxx
          FROM top)
    SELECT CAST(n AS BIGINT) AS n_words,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS zipf_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9)
               AS intercept
    FROM s
    """,
    tags=("llm", "statistics", "vocab"),
)
def y_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law slope of the corpus vocabulary — a one-number corpus
    health diagnostic (natural text sits near slope -1; templated or
    deduplicated-to-death corpora drift): OLS fit of ln(freq) against
    ln(rank) over the top 200 words.

    Bit-exact without regr_slope: the builtin aggregate sums in
    partition order (non-deterministic float association), so the four
    regression sums are SEQUENTIAL folds over rank-sorted arrays on
    both engines, and the slope/intercept are plain arithmetic on
    identical doubles. Plan: one tokenize+count shuffle, a 200-row
    TakeOrderedAndProject (no global sort), and a single-row fold —
    corpus-size-independent beyond the count."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
        ).alias("w0")
    ).select(F.lower("w0").alias("word"))
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    # top-200 FIRST via TakeOrderedAndProject (partial top-k per
    # partition, no global sort of the vocab); the ranking window then
    # runs over 200 rows, not the corpus vocabulary.
    top200 = freq.orderBy(F.col("cnt").desc(), F.col("word")).limit(200)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    top = (
        top200.withColumn("rnk", F.row_number().over(w))
        .select(
            "rnk",
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    arrs = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(F.collect_list(F.struct("rnk", "x", "y"))).alias("__a"),
    )

    def fold(expr):
        return F.aggregate(
            F.transform(F.col("__a"), expr), F.lit(0.0), lambda acc, v: acc + v
        )

    s = arrs.select(
        F.col("n"),
        fold(lambda t: t["x"]).alias("sx"),
        fold(lambda t: t["y"]).alias("sy"),
        fold(lambda t: t["x"] * t["y"]).alias("sxy"),
        fold(lambda t: t["x"] * t["x"]).alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_words"),
        F.round(slope, 9).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 9).alias("intercept"),
    )


@query(
    "y_heavy_hitters",
    oracle="""
    WITH tok AS (
        SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x <> '')))
            AS word
        FROM documents
    )
    SELECT word, COUNT(*) AS cnt
    FROM tok GROUP BY word
    HAVING COUNT(*) >= (SELECT COUNT(*) // 256 FROM tok) + 1
    """,
    tags=("llm", "statistics", "sketch"),
)
def y_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT φ=1/256 heavy hitters over the corpus token stream via
    Misra–Gries candidates + exact recount
    (operators/heavy_hitters.py) — the scale path for frequent-token
    detection when the vocabulary is too large to group-by: a plain
    groupBy shuffles EVERY distinct key (billions at 100 TB), while
    this shuffles ≤ k candidates per partition plus one broadcast
    semi-join recount. Candidates are provably a superset of every
    word with frequency ≥ N/256 (mergeable-summaries bound), and the
    recount makes the output exact — so a plain GROUP BY ... HAVING
    is the value oracle. Output: every word with count > N/256."""
    from sql_to_dbsp_compiler_spark.operators.heavy_hitters import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
        ).alias("w0")
    ).select(F.lower("w0").alias("word"))
    return heavy_hitters(tok, "word", k=256)


@query(
    "y_vocab_coverage",
    oracle="""
    WITH tok AS (
        SELECT lower(unnest(list_filter(string_split(text, ' '), x -> x <> '')))
            AS word
        FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
    rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rnk
           FROM freq),
    tot AS (SELECT SUM(cnt) AS total FROM freq),
    ks AS (SELECT CAST(unnest([100, 1000, 10000]) AS INTEGER) AS k)
    SELECT k,
           CAST(SUM(CASE WHEN rnk <= k THEN cnt ELSE 0 END) AS BIGINT)
               AS covered_tokens,
           round(CAST(SUM(CASE WHEN rnk <= k THEN cnt ELSE 0 END) AS DOUBLE)
                 / (SELECT total FROM tot), 9) AS coverage_share
    FROM rk CROSS JOIN ks GROUP BY k
    """,
    tags=("llm", "statistics", "vocab"),
)
def y_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage@k curve: the fraction of all token
    OCCURRENCES covered by the k most frequent words (k = 100 / 1k /
    10k) — the first question asked when sizing a tokenizer vocab or
    diagnosing OOV pressure per corpus slice. Exact integer
    arithmetic end-to-end (counts and conditional sums; only the
    final share divides as double), so partition order can't move
    the hash. Plan: one tokenize+count shuffle; the ranking runs
    over a TakeOrderedAndProject top-10k slice (partial top-k per
    partition, never a global vocab sort); the 3-row k relation
    broadcast-joins the slice. The corpus total comes from the full
    frequency table's single-row aggregate, not the slice."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
        ).alias("w0")
    ).select(F.lower("w0").alias("word"))
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).persist()
    tot = freq.agg(F.sum("cnt").alias("total"))
    topk = freq.orderBy(F.col("cnt").desc(), F.col("word")).limit(10000)
    ranked = topk.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("word")))
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(100), F.lit(1000), F.lit(10000))).alias("k0")
    ).select(F.col("k0").cast("int").alias("k"))
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("covered_tokens")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "covered_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("total").cast("double"),
                9,
            ).alias("coverage_share"),
        )
    )
