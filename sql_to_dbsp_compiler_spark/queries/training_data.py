"""Training-data curation queries (SURVEY §2.5 extensions): the ops a
large-scale LLM pretraining pipeline runs between raw corpus and
training shards — stratified sampling, sequence packing, entity/PII
redaction, n-gram statistics, and contamination checks. Every query is
oracle-gated: the strategies are chosen to be deterministic and
engine-agnostic (hash-based sampling, concat-then-chunk packing) so
DuckDB reproduces them bit-for-bit.

Names sort after the current driver audit window on purpose — they
join the rotation next round without displacing never-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.llm.text import token_count_whitespace
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table

# Per-language keep-rates (percent) for stratified downsampling: the
# typical pretraining mix upsamples low-resource languages relative to
# English. Deterministic: membership depends only on doc_id.
_RATES = {"en": 25, "de": 60, "es": 60, "fr": 60, "zh": 40}
_RATE_DEFAULT = 10
_PACK_BUDGET = 256  # tokens per training sequence (small for test SFs)


@query(
    "train_sample_stratified",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS bucket,
               CASE lang
                   {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())}
                   ELSE {_RATE_DEFAULT}
               END AS rate
        FROM documents
    )
    SELECT doc_id, lang, bucket FROM b WHERE bucket < rate
    """,
    tags=("llm", "training"),
)
def train_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus mixing: a doc is
    kept iff ``md5(doc_id) mod 100`` falls below its language's
    keep-rate. Hash-bucket membership (not rand()) makes the sample
    reproducible across runs/engines and stable under re-partitioning
    — the property a 100 TB curation pipeline needs so that reruns and
    incremental updates select the same documents. Pure column
    expressions, no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.lit(_RATE_DEFAULT)
    for k, v in _RATES.items():
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("__rate"))
        .where(F.col("bucket") < F.col("__rate"))
        .drop("__rate")
    )


@query(
    "train_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), w -> w <> ''))
                   AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS chunk_id,
           CAST((cum - n_tokens) % {_PACK_BUDGET} AS BIGINT) AS chunk_offset
    FROM c
    """,
    tags=("llm", "training"),
)
def train_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the GPT-style pretraining
    layout): within each source shard, documents are concatenated in
    doc_id order and cut into fixed token-budget chunks; each doc's
    chunk is the budget-division of the token stream position where it
    starts. One window shuffle per shard key — the cumulative sum is a
    running aggregate, never a self-join; at 100 TB the per-source
    window parallelizes across shards (sources), the natural unit of
    training-data layout."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", token_count_whitespace(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    return t.select("doc_id", "source", "n_tokens", start).select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("__start") / _PACK_BUDGET).alias("chunk_id"),
        (F.col("__start") % _PACK_BUDGET).alias("chunk_offset"),
    )


# Redaction patterns: entity terms that occur in the corpus plus
# PII-shaped patterns (digit runs) that exercise the same plumbing.
# RE2∩Java-regex subset: no lookaround, no backrefs.
_REDACT_ENTITY = "customer|supplier"
_REDACT_NUM = "[0-9]{4,}"


@query(
    "train_pii_redact",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_REDACT_ENTITY}'))
               AS n_entities,
           len(regexp_extract_all(text, '{_REDACT_NUM}')) AS n_numbers,
           regexp_replace(regexp_replace(text, '{_REDACT_ENTITY}',
                                         '<ENTITY>', 'g'),
                          '{_REDACT_NUM}', '<NUM>', 'g') AS redacted
    FROM documents
    WHERE regexp_matches(text, '{_REDACT_ENTITY}')
       OR regexp_matches(text, '{_REDACT_NUM}')
    """,
    tags=("llm", "training"),
)
def train_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity/PII redaction pass: count and replace sensitive spans
    (named entities here; digit-run patterns stand in for phone/SSN
    shapes) with typed placeholder tokens. Pure regexp column
    expressions — JVM-side, codegen'd, zero shuffle; the regex subset
    is RE2∩Java so the oracle's matches are identical."""
    d = load_table(spark, sf_dir, "documents")
    ent, num = F.lit(_REDACT_ENTITY), F.lit(_REDACT_NUM)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", ent, F.lit(0)))
        .cast("bigint")
        .alias("n_entities"),
        F.size(F.regexp_extract_all("text", num, F.lit(0)))
        .cast("bigint")
        .alias("n_numbers"),
        F.regexp_replace(
            F.regexp_replace("text", _REDACT_ENTITY, "<ENTITY>"),
            _REDACT_NUM,
            "<NUM>",
        ).alias("redacted"),
    ).where((F.col("n_entities") > 0) | (F.col("n_numbers") > 0))


@query(
    "train_topk_ngrams",
    oracle="""
    WITH w AS (
        SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    bg AS (
        SELECT lang, unnest([ws[i] || ' ' || ws[i+1]
                             FOR i IN range(1, len(ws))]) AS bigram
        FROM w
    ),
    cnt AS (
        SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram
    )
    SELECT lang, bigram, n FROM cnt
    QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY n DESC, bigram) <= 5
    """,
    tags=("llm", "training"),
)
def train_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: top-5 word bigrams per language by
    frequency (row_number with a total tie-break order so both engines
    pick identical winners). Shape: explode → count (map-side partial
    agg) → per-group top-k via WindowGroupLimit — rank pushes below
    the exchange, so only each partition's top rows shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " ", -1), lambda x: x != "")
    w = d.select("lang", ws.alias("__ws"))
    bigrams = w.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("__ws") - 1, F.lit(0))),
                lambda i: F.concat_ws(
                    " ", F.element_at("__ws", i), F.element_at("__ws", i + 1)
                ),
            )
        ).alias("bigram"),
    ).where(F.col("bigram") != "")
    cnt = bigrams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    )
    return cnt.withColumn("__rn", rn).where(F.col("__rn") <= 5).drop("__rn")


# Canary phrases for decontamination: phrases that DO occur in the
# synthetic corpus, standing in for benchmark strings.
_CANARIES = ("slow fast table", "batch window spark", "key agg row")


@query(
    "train_contamination",
    oracle=f"""
    WITH canary(phrase) AS (
        VALUES {', '.join(f"('{c}')" for c in _CANARIES)}
    )
    SELECT d.doc_id, c.phrase
    FROM documents d JOIN canary c
      ON position(c.phrase IN d.text) > 0
    """,
    tags=("llm", "training"),
)
def train_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: find documents containing any
    canary phrase (one row per doc × matching phrase). The canary list
    is broadcast (tiny literal dim), so the scan stays a single pass
    over the corpus with the `contains` predicate evaluated JVM-side —
    the decontamination shape used before training runs."""
    d = load_table(spark, sf_dir, "documents")
    canary = d.sparkSession.createDataFrame(
        d.sparkSession.sparkContext.parallelize([(c,) for c in _CANARIES], 1),
        "phrase string",
    )  # one-slice local table: the broadcast build reads 1 task, not 32
    return d.join(
        F.broadcast(canary), F.col("text").contains(F.col("phrase"))
    ).select("doc_id", "phrase")


_DUCK_WORDS = "list_filter(string_split(text, ' '), w -> w <> '')"
_DUCK_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    + f" ELSE {_RATE_DEFAULT} END"
)


@query(
    "train_pipeline_end2end",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang, source, text, {_DUCK_WORDS} AS words
        FROM documents
    ),
    q AS (
        SELECT doc_id, lang, source,
               len(words) AS n_words,
               len(list_distinct(words)) * 1.0 / len(words) AS distinct_ratio,
               md5(array_to_string(list_sort(list_distinct(words)), ' ')) AS fp
        FROM w
    ),
    f AS (SELECT * FROM q WHERE n_words >= 20 AND distinct_ratio >= 0.4),
    k AS (
        SELECT * FROM f
        QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)
    ),
    s AS (
        SELECT * FROM k
        WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100 < {_DUCK_RATE}
    ),
    c AS (
        SELECT doc_id, lang, source, n_words,
               SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM s
    )
    SELECT doc_id, lang, source,
           CAST(n_words AS BIGINT) AS n_tokens,
           CAST((cum - n_words) // {_PACK_BUDGET} AS BIGINT) AS chunk_id,
           CAST((cum - n_words) % {_PACK_BUDGET} AS BIGINT) AS chunk_offset
    FROM c
    """,
    tags=("llm", "training"),
)
def train_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE curation pipeline, end to end in one plan: quality filter
    (length + repetition) → exact dedup (bag-of-words fingerprint,
    keep min doc_id) → stratified hash sampling → sequence packing.
    Two shuffles total at any corpus size — one window over the
    fingerprint for the dedup keep-decision, one window over the shard
    key for packing; the quality and sampling stages are pure column
    predicates fused into the scan. This is the composition a user
    runs nightly over the whole corpus, so the whole chain being
    oracle-verified (not just each stage) is the point."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
    q = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(ws).cast("bigint").alias("n_words"),
        (F.size(F.array_distinct(ws)).cast("double") / F.size(ws)).alias(
            "distinct_ratio"
        ),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(ws)), " ").cast("binary")
        ).alias("fp"),
    ).where((F.col("n_words") >= 20) & (F.col("distinct_ratio") >= 0.4))
    keep = q.withColumn(
        "__mn", F.min("doc_id").over(W.partitionBy("fp"))
    ).where(F.col("doc_id") == F.col("__mn"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.lit(_RATE_DEFAULT)
    for kk, v in _RATES.items():
        rate = F.when(F.col("lang") == kk, v).otherwise(rate)
    sampled = keep.where(bucket < rate)
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum("n_words").over(w) - F.col("n_words")).alias("__start")
    return sampled.select("doc_id", "lang", "source", "n_words", start).select(
        "doc_id",
        "lang",
        "source",
        F.col("n_words").alias("n_tokens"),
        F.floor(F.col("__start") / _PACK_BUDGET).alias("chunk_id"),
        (F.col("__start") % _PACK_BUDGET).alias("chunk_offset"),
    )


_MIX_TARGETS = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}  # /100
_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_TARGETS.items())


@query(
    "train_domain_mix",
    oracle=f"""
    WITH w(lang, tw) AS (VALUES {_MIX_VALUES}),
    n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY lang),
    m AS (SELECT MIN(n.cnt * 100 // w.tw) AS mt
          FROM n JOIN w ON n.lang = w.lang),
    b AS (SELECT w.lang, (w.tw * m.mt) // 100 AS budget
          FROM w CROSS JOIN m),
    r AS (SELECT doc_id, lang,
                 CAST(ROW_NUMBER() OVER (PARTITION BY lang
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                      AS BIGINT) AS rn
          FROM documents)
    SELECT r.doc_id, r.lang, r.rn
    FROM r JOIN b ON r.lang = b.lang WHERE r.rn <= b.budget
    """,
    tags=("llm", "training"),
)
def train_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota corpus mixing: given target mixture weights per
    language, compute the largest total corpus that respects the
    target proportions given what each language actually has
    (M = min_g floor(100·count_g / weight_g), budget_g =
    floor(weight_g·M / 100) — ALL INTEGER arithmetic, so both engines
    agree exactly), then keep each language's first budget_g documents
    in deterministic md5 order. This is the exact-quota counterpart of
    `train_sample_stratified` (shuffle-free hash-rate sampling,
    approximate proportions): one tiny count aggregate, a broadcast of
    the 5-row budget table, and ONE window shuffle partitioned by
    lang.

    Scale note: at 100 TB a single dominant language makes the
    per-lang window partition hot; the md5 sort key makes any
    partial-rank optimization safe, and when exact quotas aren't
    required the hash-rate path (no shuffle at all) is the production
    default. Languages without a target weight are dropped (inner
    join), matching a curated-mixture spec."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("long").alias("cnt"))
    tw = F.lit(None).cast("long")
    for k, v in _MIX_TARGETS.items():
        tw = F.when(F.col("lang") == k, F.lit(v).cast("long")).otherwise(tw)
    n = counts.select("lang", "cnt", tw.alias("tw")).where(F.col("tw").isNotNull())
    m = n.agg(F.min(F.expr("cnt * 100 div tw")).alias("mt"))
    budgets = (
        spark.createDataFrame(
            spark.sparkContext.parallelize(
                [(k, v) for k, v in _MIX_TARGETS.items()], 1
            ),
            "lang string, tw long",
        )
        .crossJoin(F.broadcast(m))
        .select("lang", F.expr("tw * mt div 100").alias("budget"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rn")
    )
    return ranked.join(F.broadcast(budgets), "lang").where(
        F.col("rn") <= F.col("budget")
    ).select("doc_id", "lang", "rn")


@query(
    "train_dedup_report",
    oracle="""
    WITH f AS (
        SELECT lang,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(string_split(text, ' '), w -> w <> ''))), ' '))
                   AS fp
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dups,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) AS dup_rate
    FROM f GROUP BY lang
    """,
    tags=("llm", "training", "dedup"),
)
def train_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability: per-language exact-duplication report
    (docs, unique content fingerprints, duplicate count and rate) —
    the summary a curation run logs before deciding dedup thresholds.
    One hash-groupBy over the 32-byte fingerprint; COUNT(DISTINCT)
    over a pre-hashed key is the cheap spelling of the dedup volume
    estimate at any scale."""
    from sql_to_dbsp_compiler_spark.llm.text import fingerprint

    d = load_table(spark, sf_dir, "documents").select(
        "lang", fingerprint(F.col("text")).alias("fp")
    )
    n = F.count("*").cast("long")
    u = F.count_distinct(F.col("fp")).cast("long")
    return d.groupBy("lang").agg(
        n.alias("n_docs"),
        u.alias("n_unique"),
        (n - u).alias("n_dups"),
        ((n - u).cast("double") / n).alias("dup_rate"),
    )


@query(
    "x_line_dedup",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), wp AS (
        SELECT doc_id, unnest(ws) AS wd, unnest(range(0, len(ws))) AS i
        FROM w
    ), segs AS (
        SELECT doc_id, i // 3 AS seg_idx,
               string_agg(wd, ' ' ORDER BY i) AS seg
        FROM wp GROUP BY doc_id, i // 3
    ), f AS (
        SELECT seg FROM segs GROUP BY seg
        HAVING count(DISTINCT doc_id) >= 2
    ), flagged AS (
        SELECT s.doc_id, s.seg_idx, s.seg,
               s.seg IN (SELECT seg FROM f) AS is_dup
        FROM segs s
    )
    SELECT doc_id,
           count(*) AS n_segs,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           coalesce(string_agg(CASE WHEN NOT is_dup THEN seg END,
                               ' ' ORDER BY seg_idx), '') AS kept_text
    FROM flagged GROUP BY doc_id
    """,
    tags=("llm", "training", "dedup"),
)
def x_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-level line deduplication (Wenzek et al.
    2020): split every document into fixed 3-word segments (the
    synthetic corpus has no newlines, so positional word-chunks stand
    in for lines), count each segment's document frequency across the
    WHOLE corpus, and drop every occurrence of any segment appearing
    in >= 2 distinct documents; re-emit the per-document residual
    text plus drop statistics.

    Dropping ALL occurrences (rather than CCNet's keep-first) makes
    the operator order-independent — the property that matters
    distributed: no "first occurrence" exists across 1000 executors
    without imposing a global order. Plan shape at 100 TB: one
    shuffle to aggregate words into segments, one shuffle for the
    global segment-df count, a left join of segments against the
    (far smaller) duplicated-segment set — AQE broadcasts it when it
    fits — and one shuffle back to per-document reassembly. No
    Python UDFs; the segment build is sequence/slice/array_join
    column expressions inside codegen."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_seg = F.when(
        F.size(ws) > 0, F.ceil(F.size(ws) / F.lit(3)).cast("int")
    ).otherwise(F.lit(0))
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda s: F.array_join(F.slice(ws, s * 3 + 1, 3), " "),
    )
    segs = d.select(
        "doc_id",
        F.posexplode(F.when(n_seg > 0, seg_arr).otherwise(F.array())).alias(
            "seg_idx", "seg"
        ),
    )
    dup = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("__df"))
        .where(F.col("__df") >= 2)
        .select(F.col("seg").alias("__dseg"))
    )
    flagged = segs.join(dup, segs.seg == F.col("__dseg"), "left").select(
        "doc_id",
        "seg_idx",
        "seg",
        F.col("__dseg").isNotNull().alias("is_dup"),
    )
    kept = F.when(
        ~F.col("is_dup"), F.struct(F.col("seg_idx"), F.col("seg"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["seg"]
            ),
            " ",
        ).alias("kept_text"),
    )


@query(
    "x_unigram_logprob",
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '') AS words
               FROM documents),
    tk AS (SELECT doc_id,
                  unnest([struct_pack(pos := i, word := words[i])
                          FOR i IN range(1, len(words)+1)]) AS t
           FROM w),
    tok AS (SELECT doc_id, t.pos AS pos, t.word AS word FROM tk),
    vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    lp AS (SELECT t.doc_id, t.pos, ln(CAST(v.cnt AS DOUBLE) / tot.total) AS lp
           FROM tok t JOIN vocab v USING (word) CROSS JOIN tot),
    doc AS (SELECT doc_id, COUNT(*) AS n_tokens,
                   list_reduce(list(lp ORDER BY pos), (a,b) -> a+b) AS sum_lp
            FROM lp GROUP BY doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           sum_lp / n_tokens AS avg_lp,
           sum_lp / n_tokens >= -3.41 AS kept
    FROM doc
    """,
    tags=("llm", "quality"),
)
def x_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter (Wenzek et al. 2019) with a
    corpus-trained unigram LM in place of KenLM (no external model in
    the sandbox; the pipeline shape — train on corpus, score per doc,
    threshold the tail — is the real one). Bit-exact across engines
    because the log-prob fold is position-ordered on both sides."""
    from sql_to_dbsp_compiler_spark.llm.text import unigram_logprob

    d = load_table(spark, sf_dir, "documents")
    return unigram_logprob(d)


@query(
    "x_dsir_resample",
    oracle="""
    WITH w AS (SELECT doc_id, lang,
                      list_filter(string_split(text, ' '), x -> x <> '') AS words
               FROM documents),
    tk AS (SELECT doc_id, lang,
                  unnest([struct_pack(pos := i, word := words[i])
                          FOR i IN range(1, len(words)+1)]) AS t
           FROM w),
    tok AS (SELECT doc_id, lang = 'en' AS is_target, t.pos AS pos,
                   CAST(('0x' || substring(md5(t.word), 1, 15)) AS BIGINT) % 64
                       AS bucket
            FROM tk),
    dist AS (SELECT bucket, COUNT(*) AS cnt_raw,
                    COUNT(*) FILTER (WHERE is_target) AS cnt_tgt
             FROM tok GROUP BY bucket),
    tot AS (SELECT SUM(cnt_raw) AS tot_raw, SUM(cnt_tgt) AS tot_tgt FROM dist),
    lam AS (SELECT bucket,
                   ln((cnt_tgt + 1.0) / (tot_tgt + 64.0))
                 - ln((cnt_raw + 1.0) / (tot_raw + 64.0)) AS lam
            FROM dist CROSS JOIN tot),
    doc AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   list_reduce(list(l.lam ORDER BY t.pos), (a,b) -> a+b)
                       AS logweight
            FROM tok t JOIN lam l USING (bucket) GROUP BY t.doc_id),
    keyed AS (SELECT doc_id, n_tokens, logweight,
                     -- rounded to 9 dp on both engines: JVM vs libm
                     -- log disagree in the last ulp (llm/dsir.py)
                     round(logweight - ln(-ln(
                         (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                                  1, 15)) AS BIGINT)
                          % 1000000000 + 0.5) / 1e9)), 9) AS gumbel_key
              FROM doc)
    SELECT doc_id, n_tokens, logweight, gumbel_key
    FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT 100
    """,
    tags=("llm", "curation", "sampling"),
)
def x_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed-unigram importance
    weights toward the lang='en' slice as the target distribution, then
    a deterministic Gumbel top-k draw of 100 documents ∝ softmax of the
    log-weights. Ordered-fold scoring and md5-derived Gumbel noise make
    the whole draw bit-reproducible in DuckDB (llm/dsir.py)."""
    from sql_to_dbsp_compiler_spark.llm.dsir import dsir_resample

    d = load_table(spark, sf_dir, "documents")
    return dsir_resample(d, F.col("lang") == "en", k=100)


@query(
    "x_contamination_ngram",
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '') AS ws
               FROM documents),
    sh AS (SELECT doc_id, doc_id % 97 = 0 AS is_eval,
                  unnest(list_distinct([array_to_string(ws[i:i+2], ' ')
                          FOR i IN range(1, len(ws) - 2 + 1)])) AS s
           FROM w WHERE len(ws) >= 3),
    dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
    kept AS (SELECT sh.doc_id, sh.is_eval, sh.s
             FROM sh JOIN dfreq USING (s) WHERE dfreq.df <= 20),
    ev AS (SELECT doc_id AS eval_doc_id, s FROM kept WHERE is_eval),
    tr AS (SELECT doc_id AS train_doc_id, s FROM kept WHERE NOT is_eval),
    ev_tot AS (SELECT eval_doc_id, COUNT(*) AS eval_ngrams
               FROM ev GROUP BY eval_doc_id),
    ov AS (SELECT train_doc_id, eval_doc_id, COUNT(*) AS shared_ngrams
           FROM tr JOIN ev USING (s) GROUP BY 1, 2)
    SELECT ov.train_doc_id, ov.eval_doc_id,
           CAST(ov.shared_ngrams AS BIGINT) AS shared_ngrams,
           CAST(t.eval_ngrams AS BIGINT) AS eval_ngrams,
           round(CAST(ov.shared_ngrams AS DOUBLE) / t.eval_ngrams, 6)
               AS overlap_frac,
           ov.shared_ngrams >= 2 AS contaminated
    FROM ov JOIN ev_tot t USING (eval_doc_id)
    """,
    tags=("llm", "training", "dedup"),
)
def x_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination: word 3-gram overlap between
    the training corpus and a held-out slice (doc_id % 97 == 0 plays
    the benchmark), with the hot-shingle df<=20 guard on both sides —
    the n-gram complement of train_contamination's exact canary scan
    (llm/dedup.ngram_contamination)."""
    from sql_to_dbsp_compiler_spark.llm.dedup import ngram_contamination

    d = load_table(spark, sf_dir, "documents")
    return ngram_contamination(
        d, F.col("doc_id") % 97 == 0, n=3, max_df=20, contaminated_at=2
    )


# Per-language epoch factors for upsampling: fractional repeats are
# the standard recipe knob (e.g. "2.7 epochs of wiki"). Deterministic:
# the fractional copy is granted iff md5(doc_id) mod 100 falls under
# the fractional part.
_EPOCHS = {"en": 1.0, "de": 2.5, "es": 2.5, "fr": 2.5, "zh": 3.25}


@query(
    "x_epoch_repeat",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang,
               CASE lang
                   {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _EPOCHS.items())}
                   ELSE 1.0
               END AS factor,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    ),
    n AS (
        SELECT doc_id, lang, factor,
               CAST(floor(factor) AS BIGINT)
               + CASE WHEN bucket < CAST(round((factor - floor(factor)) * 100, 0)
                                        AS BIGINT)
                      THEN 1 ELSE 0 END AS n_copies
        FROM base
    )
    SELECT doc_id, lang, factor, n_copies,
           CAST(unnest(range(n_copies)) AS BIGINT) AS epoch
    FROM n WHERE n_copies > 0
    """,
    tags=("llm", "training", "sampling"),
)
def x_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch domain upsampling (the data-recipe knob: "3.25
    epochs of zh, 1 of en"): every doc gets floor(factor) copies plus
    one more iff its md5 bucket falls under the fractional part — so
    exactly the requested fraction of each domain repeats, the SAME
    docs every run, stable under repartitioning. Emits one row per
    (doc, epoch) — the downstream shuffle/pack stage sees repeats as
    ordinary rows. Pure column expressions + explode: zero shuffles,
    output volume = sum of factors × corpus (the intended blow-up,
    linear). Complement of train_domain_mix (quota TRUNCATION) and
    train_sample_stratified (DOWNsampling)."""
    d = load_table(spark, sf_dir, "documents")
    factor = F.lit(1.0)
    for k, v in _EPOCHS.items():
        factor = F.when(F.col("lang") == k, F.lit(v)).otherwise(factor)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    frac_pct = F.round((factor - F.floor(factor)) * 100, 0).cast("bigint")
    n_copies = F.floor(factor).cast("bigint") + F.when(
        bucket < frac_pct, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        d.select(
            "doc_id",
            "lang",
            factor.alias("factor"),
            n_copies.alias("n_copies"),
        )
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            "factor",
            "n_copies",
            F.explode(F.sequence(F.lit(0).cast("bigint"),
                                 F.col("n_copies") - 1)).alias("epoch"),
        )
    )


@query(
    "x_split_train_eval",
    oracle="""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)),
                                       1, 15)) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=("llm", "training", "sampling"),
)
def x_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split: the salted md5
    bucket of the doc id alone decides membership, so the split is
    mutually exclusive and exhaustive BY CONSTRUCTION, stable across
    reruns/engines/repartitioning, and new documents join a split
    without reshuffling old ones — the properties an eval protocol
    needs that rand()-splits lack. The salt ('split|') decouples this
    hash from every other md5-bucket decision in the pipeline (the
    same doc must not be correlated between sampling and splitting).
    Pure column expressions, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % 100
    )
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < 90, "train")
        .when(F.col("bucket") < 95, "val")
        .otherwise("test")
        .alias("split"),
    ).select("doc_id", "lang", "bucket", "split")


@query(
    "x_mixture_skew_kl",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS total FROM documents),
    q AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
    p AS (SELECT source, lang, COUNT(*) AS n_sl FROM documents
          GROUP BY source, lang),
    st AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
    terms AS (
        SELECT p.source, p.lang,
               CAST(p.n_sl AS DOUBLE) / st.n_src AS pp,
               CAST(q.n_lang AS DOUBLE) / n.total AS qq
        FROM p JOIN st USING (source) JOIN q USING (lang) CROSS JOIN n
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           round(list_reduce(
               list(pp * ln(pp / qq) ORDER BY lang), (a, b) -> a + b), 9)
               AS kl_vs_corpus
    FROM terms GROUP BY source
    """,
    tags=("llm", "training", "mixing", "diagnostics"),
)
def x_mixture_skew_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-balance diagnostics: KL(P(lang|source) ‖ P(lang)) per
    source — how far each source's language mix deviates from the
    corpus mix, the number a data-recipe dashboard watches when a
    crawl snapshot drifts. The KL sum folds its per-language terms in
    lang order (both engines), and rounds to 9 dp (ln last-ulp); the
    distributions come from two grouped counts plus one tiny broadcast
    join — nothing scales with more than the (source × lang) grid.
    Absent (source, lang) cells contribute 0 identically on both
    sides (0·ln 0 terms never materialize — the join only produces
    observed cells)."""
    d = load_table(spark, sf_dir, "documents")
    from sql_to_dbsp_compiler_spark.sources.tables import rowcount

    total = rowcount(d)
    q = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    p = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_sl"))
    st = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    terms = (
        p.join(F.broadcast(st), "source")
        .join(F.broadcast(q), "lang")
        .select(
            "source",
            "lang",
            (F.col("n_sl").cast("double") / F.col("n_src")).alias("pp"),
            (F.col("n_lang").cast("double") / F.lit(total)).alias("qq"),
        )
    )
    term = (F.col("pp") * F.log(F.col("pp") / F.col("qq"))).alias("t")
    folded = terms.select("source", "lang", term).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("lang", "t"))),
                    lambda s: s["t"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ).alias("kl_vs_corpus"),
    )
    return folded


@query(
    "x_char_entropy",
    oracle="""
    WITH tg AS (
        SELECT doc_id, substring(text, i, 3) AS g
        FROM documents, unnest(generate_series(1, length(text) - 2)) AS u(i)
        WHERE length(text) >= 3
    ),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g),
    tot AS (SELECT doc_id, SUM(c) AS t FROM cnt GROUP BY doc_id),
    terms AS (
        SELECT cnt.doc_id, cnt.g,
               -(CAST(cnt.c AS DOUBLE) / tot.t)
                   * ln(CAST(cnt.c AS DOUBLE) / tot.t) AS h
        FROM cnt JOIN tot USING (doc_id)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_trigrams,
           round(list_reduce(list(h ORDER BY g), (a, b) -> a + b), 9)
               AS trigram_entropy,
           round(list_reduce(list(h ORDER BY g), (a, b) -> a + b), 9)
               < 3.0 AS low_entropy
    FROM terms GROUP BY doc_id
    """,
    tags=("llm", "quality", "text"),
)
def x_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram Shannon entropy per document — the classic
    gibberish/boilerplate detector (natural text sits ~4-8 nats at
    trigram level; repeated spam and key-mash collapse it). Entropy
    terms fold in trigram order on both engines (9 dp for ln's ulp).
    Shape: one Generate (sliding char window via sequence), one
    (doc, gram) count shuffle, one per-doc fold — all linear in
    corpus characters."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    tg = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    cnt = tg.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("t"))
    pp = F.col("c").cast("double") / F.col("t")
    terms = cnt.join(tot, "doc_id").select(
        "doc_id", "g", (-pp * F.log(pp)).alias("h")
    )
    ent = F.round(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("g", "h"))),
                lambda s: s["h"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_trigrams"),
        ent.alias("trigram_entropy"),
        (ent < 3.0).alias("low_entropy"),
    )


@query(
    "y_bigram_logprob",
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '') AS ws
               FROM documents),
    tk AS (SELECT doc_id,
                  unnest([struct_pack(pos := i, word := ws[i])
                          FOR i IN range(1, len(ws)+1)]) AS t
           FROM w),
    tok AS (SELECT doc_id, t.pos AS pos, t.word AS word FROM tk),
    bg0 AS (SELECT doc_id,
                   unnest([struct_pack(pos := i, w1 := ws[i], w2 := ws[i+1])
                           FOR i IN range(1, len(ws))]) AS t
            FROM w),
    bg AS (SELECT doc_id, t.pos AS pos, t.w1 AS w1, t.w2 AS w2 FROM bg0),
    uni AS (SELECT word, COUNT(*) AS c1 FROM tok GROUP BY word),
    vsz AS (SELECT COUNT(*) AS v FROM uni),
    doc_bg AS (SELECT doc_id, w1, w2, COUNT(*) AS k FROM bg GROUP BY doc_id, w1, w2),
    big AS (SELECT w1, w2, SUM(k) AS c12 FROM doc_bg GROUP BY w1, w2),
    klp AS (SELECT g.doc_id, g.w1, g.w2, g.k,
                   g.k * ln((b.c12 + 1.0) / (u.c1 + CAST(v.v AS DOUBLE))) AS klp
            FROM doc_bg g JOIN big b ON g.w1 = b.w1 AND g.w2 = b.w2
                          JOIN uni u ON g.w1 = u.word CROSS JOIN vsz v),
    doc AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS nb,
                   list_reduce(list(klp ORDER BY w1, w2), (a, b) -> a + b) AS s
            FROM klp GROUP BY doc_id)
    SELECT doc_id, nb AS n_bigrams,
           round(s / nb, 9) AS avg_lp, round(s / nb, 9) >= -6.5 AS kept
    FROM doc
    """,
    tags=("llm", "quality", "lm"),
)
def y_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality filter (llm/text.py:bigram_logprob) — the
    sequence-aware CCNet sibling of x_unigram_logprob: local word
    ORDER scores low on shuffled/templated text even when the
    vocabulary fits."""
    from sql_to_dbsp_compiler_spark.llm.text import bigram_logprob

    return bigram_logprob(load_table(spark, sf_dir, "documents"))


@query(
    "y_url_canonicalize",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'HTTPS://' || upper(source) || '.Example.com/' || lang ||
               '/page' || CAST(doc_id % 40 AS VARCHAR) ||
               CASE CAST(doc_id % 4 AS INTEGER)
                 WHEN 0 THEN '?utm_source=x&id=' || CAST(doc_id % 7 AS VARCHAR)
                 WHEN 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=y'
                 WHEN 2 THEN '?utm_only=1'
                 ELSE ''
               END ||
               CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END ||
               CASE WHEN doc_id % 4 = 3 AND doc_id % 2 = 0 THEN '/' ELSE '' END
                   AS url
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     lower(regexp_replace(url, '#.*', '')),
                     'utm_[a-z]+=[a-z0-9]*&', '', 'g'),
                   '[?&]utm_[a-z]+=[a-z0-9]*$', ''),
                 '/$', '') AS canonical_url
        FROM u
    )
    SELECT canonical_url, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
    FROM c GROUP BY canonical_url
    """,
    tags=("llm", "dedup", "web"),
)
def y_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — the first pass of every web-corpus
    pipeline (CommonCrawl dedups on normalized URL before any content
    hash): lowercase, strip fragments, strip utm_* tracking params
    (mid-string then trailing, so separators stay well-formed), strip
    the trailing slash, then group. The synthetic URL is derived
    deterministically from doc metadata (same trick as media_table) so
    both engines build identical inputs. All map-side string work; ONE
    shuffle on the canonical key carrying (url, id), never text."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.com/"),
        F.col("lang"), F.lit("/page"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("?utm_source=x&id="),
                        (F.col("doc_id") % 7).cast("string")))
         .when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit("?id="), (F.col("doc_id") % 7).cast("string"),
                        F.lit("&utm_campaign=y")))
         .when(F.col("doc_id") % 4 == 2, F.lit("?utm_only=1"))
         .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
        F.when((F.col("doc_id") % 4 == 3) & (F.col("doc_id") % 2 == 0),
               F.lit("/")).otherwise(F.lit("")),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.regexp_replace(url, "#.*", "")),
                "utm_[a-z]+=[a-z0-9]*&", ""),
            r"[?&]utm_[a-z]+=[a-z0-9]*$", ""),
        "/$", "")
    return (
        d.select(F.col("doc_id"), canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


@query(
    "y_quantile_normalize",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY n_chars, doc_id) AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        FROM documents
    )
    SELECT doc_id, lang, n_chars, r,
           round(CAST(r AS DOUBLE) / (n + 1), 9) AS qnorm
    FROM ranked
    """,
    tags=("llm", "statistics", "features"),
)
def y_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile (rank) normalization — the scale-free
    feature transform for heterogeneous corpora: a doc's length is
    mapped to its quantile WITHIN its language, r/(n+1) ∈ (0,1), so
    thresholds transfer across groups whose raw distributions differ
    (the standard preprocessing trick quality classifiers use instead
    of z-scores, robust to heavy tails). Deterministic under ties via
    the doc_id tiebreak. Plan: ONE lang-partitioned window shuffle
    computes both the rank and the group size; no global sort, no
    second scan. At 100 TB each language partition sorts
    independently — skewed languages split by AQE."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("r"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        "r",
        F.round(F.col("r").cast("double") / (F.col("n") + 1), 9).alias("qnorm"),
    )


@query(
    "y_perplexity_buckets",
    oracle="""
    WITH w AS (SELECT doc_id, lang,
                      list_filter(string_split(text, ' '), x -> x <> '') AS words
               FROM documents),
    tk AS (SELECT doc_id, lang,
                  unnest([struct_pack(pos := i, word := words[i])
                          FOR i IN range(1, len(words)+1)]) AS t
           FROM w),
    tok AS (SELECT doc_id, lang, t.pos AS pos, t.word AS word FROM tk),
    vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    lp AS (SELECT t.doc_id, t.lang, t.pos,
                  ln(CAST(v.cnt AS DOUBLE) / tot.total) AS lp
           FROM tok t JOIN vocab v USING (word) CROSS JOIN tot),
    doc AS (SELECT doc_id, lang, COUNT(*) AS n_tokens,
                   list_reduce(list(lp ORDER BY pos), (a,b) -> a+b) AS s
            FROM lp GROUP BY doc_id, lang)
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(s / n_tokens, 9) AS avg_lp,
           CASE CAST(NTILE(3) OVER (PARTITION BY lang
                     ORDER BY s / n_tokens DESC, doc_id) AS INTEGER)
             WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM doc
    """,
    tags=("llm", "quality", "lm"),
)
def y_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's actual third stage (Wenzek et al. 2019 §4.3): split
    each LANGUAGE's documents into head/middle/tail terciles by LM
    score — downstream pipelines keep head+middle or reweight by
    bucket rather than hard-thresholding. Per-language NTILE, so the
    ordering window partitions by lang (no single global sort at
    100 TB; a skewed language splits under AQE like any window). The
    sort key s/n_tokens is the UNROUNDED position-ordered fold —
    bit-identical across engines (same reason x_unigram_logprob is
    oracle-exact), so the tercile boundaries agree exactly; doc_id
    breaks ties deterministically."""
    from pyspark.sql import Window

    from sql_to_dbsp_compiler_spark.llm.text import words

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.posexplode(words(F.col("text"))).alias("pos", "word")
    ).localCheckpoint(eager=False)
    vocab = tok.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    lp = (
        tok.join(vocab, "word")
        .crossJoin(F.broadcast(tot))
        .withColumn("lp", F.log(F.col("cnt").cast("double") / F.col("total")))
    )
    doc = lp.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("pos", "lp"))).alias("__arr"),
    )
    s = F.aggregate(
        F.transform(F.col("__arr"), lambda x: x["lp"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = doc.select(
        "doc_id", "lang", "n_tokens", (s / F.col("n_tokens")).alias("__alp")
    )
    w = Window.partitionBy("lang").orderBy(F.col("__alp").desc(), F.col("doc_id"))
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(F.col("__alp"), 9).alias("avg_lp"),
        F.when(F.ntile(3).over(w) == 1, F.lit("head"))
        .when(F.ntile(3).over(w) == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


@query(
    "y_length_band_filter",
    oracle="""
    WITH r AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ),
    kept AS (
        SELECT lang, n_chars, n FROM r
        WHERE rnk >= CAST(FLOOR((n * 5 + 99) / 100.0) AS BIGINT)
          AND rnk <= CAST(FLOOR(n * 95 / 100.0) AS BIGINT)
    )
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n_total,
           COUNT(*) AS n_kept,
           round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 9)
               AS mean_chars_kept
    FROM kept GROUP BY lang
    """,
    tags=("llm", "curation", "filter"),
)
def y_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-band curation filter: drop each language's
    shortest 5% and longest 5% by rank — the standard tail trim
    before quality scoring (extreme-length docs are boilerplate
    stubs or concatenation accidents). Percentile CUTS ARE RANKS,
    not interpolated quantiles: rank bounds are exact integers
    (ceil(n*0.05) / floor(n*0.95) in integer arithmetic), so the
    kept set is identical in any engine — interpolated quantile
    functions differ across engines in type coercion and tie
    handling, ranks never do. One window shuffle per language
    partition, then a hash aggregate."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    r = d.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = r.where(
        (F.col("rnk") >= F.floor((F.col("n") * 5 + 99) / 100.0).cast("bigint"))
        & (F.col("rnk") <= F.floor(F.col("n") * 95 / 100.0).cast("bigint"))
    )
    return kept.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)), 9
        ).alias("mean_chars_kept"),
    )


@query(
    "y_temperature_mix",
    oracle="""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_docs) AS total FROM counts),
    base AS (
        SELECT lang, n_docs,
               round(CAST(n_docs AS DOUBLE) / total, 9) AS p,
               CAST(round(pow(CAST(n_docs AS DOUBLE) / total, 0.3), 9)
                    AS DECIMAL(20,9)) AS w
        FROM counts, tot
    ),
    norm AS (SELECT SUM(w) AS wsum FROM base)
    SELECT lang, n_docs, p,
           round(CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE), 9) AS q,
           round(round(CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE), 9) / p, 9)
               AS repeat_factor
    FROM base, norm
    """,
    tags=("llm", "curation", "mixture"),
)
def y_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual sampling weights (r7; the
    multilingual-LM standard — Conneau & Lample NeurIPS'19 XLM §3.1,
    mT5's alpha-sampling): q_l proportional to p_l^alpha with
    alpha=0.3 upweights low-resource languages without flattening the
    mixture; repeat_factor = q/p is each language's epoch
    over/under-sampling. Determinism design: counts are exact BIGINTs;
    p is a correctly-rounded IEEE division; pow() is the one
    libm-divergence risk, so p^alpha rounds to 9 dp and WIDENS TO
    DECIMAL(20,9) before the normalizing sum — the sum is exact
    decimal arithmetic, so normalization is partition-order-stable at
    any parallelism (the established round-then-exact-fold pattern,
    cf. x_unigram_logprob). One tiny groupBy + two broadcast scalar
    joins."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("total"))
    base = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 9).alias("p"),
        F.round(
            F.pow(F.col("n_docs").cast("double") / F.col("total"), F.lit(0.3)), 9
        )
        .cast("decimal(20,9)")
        .alias("w"),
    )
    norm = base.agg(F.sum("w").alias("wsum"))
    q = F.round(F.col("w").cast("double") / F.col("wsum").cast("double"), 9)
    return base.crossJoin(F.broadcast(norm)).select(
        "lang",
        "n_docs",
        "p",
        q.alias("q"),
        F.round(q / F.col("p"), 9).alias("repeat_factor"),
    )


@query(
    "y_hash_bucket_balance",
    oracle="""
    WITH b AS (
        SELECT CAST(('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)),
                                       1, 15)) AS BIGINT) % 16 AS bucket
        FROM documents
    ),
    counts AS (
        SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket
    ),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS k FROM counts)
    SELECT CAST(bucket AS INTEGER) AS bucket, n,
           round(CAST(n AS DOUBLE) / total, 9) AS share,
           round(CAST((n - CAST(total AS DOUBLE) / 16)
                      * (n - CAST(total AS DOUBLE) / 16) AS DOUBLE)
                 / (CAST(total AS DOUBLE) / 16), 9) AS chi2_term
    FROM counts, tot
    """,
    tags=("llm", "curation", "layout"),
)
def y_hash_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket balance audit (r7): per-bucket counts, shares, and
    chi-square terms for the SAME salted-md5 bucketing the split and
    sharding operators use (`x_split_train_eval`'s hash family, mod 16
    here). A skewed hash layout silently unbalances shards, samplers,
    and salted joins long before anything errors — this is the
    one-aggregate health check a pipeline runs after changing a salt
    or key domain (Σ chi2_term ≫ k-1 flags non-uniformity). Exact
    integer counts; expected-count arithmetic in doubles rounded to 9
    (identical expression both engines). One map-side-combined
    aggregate over a pure projection — scan-bound at any corpus
    size."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 16
    )
    counts = d.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("k")
    )
    e = F.col("total").cast("double") / F.lit(16)
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("int").alias("bucket"),
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 9).alias("share"),
        F.round((F.col("n") - e) * (F.col("n") - e) / e, 9).alias("chi2_term"),
    )


@query(
    "y_source_drift_psi",
    oracle="""
    WITH b AS (
        -- FLOOR explicitly: DuckDB CAST(double AS BIGINT) rounds,
        -- Spark truncates
        SELECT source,
               LEAST(CAST(FLOOR(n_chars / 200.0) AS BIGINT), 9) AS bucket
        FROM documents
    ),
    sb AS (SELECT source, bucket, COUNT(*) AS n FROM b GROUP BY source, bucket),
    grid AS (
        SELECT s.source, g.bucket, COALESCE(sb.n, 0) AS n
        FROM (SELECT DISTINCT source FROM b) s
        CROSS JOIN range(10) g(bucket)
        LEFT JOIN sb ON sb.source = s.source AND sb.bucket = g.bucket
    ),
    st AS (SELECT source, SUM(n) AS n_src FROM grid GROUP BY source),
    cb AS (SELECT bucket, SUM(n) AS n_all FROM grid GROUP BY bucket),
    tot AS (SELECT SUM(n) AS n_corpus FROM grid)
    SELECT g.source, CAST(g.bucket AS INTEGER) AS bucket,
           g.n AS n_docs,
           round((g.n + 1.0) / (st.n_src + 10.0), 9) AS p,
           round((cb.n_all + 1.0) / (tot.n_corpus + 10.0), 9) AS q,
           round((round((g.n + 1.0) / (st.n_src + 10.0), 9)
                  - round((cb.n_all + 1.0) / (tot.n_corpus + 10.0), 9))
                 * round(ln(round((g.n + 1.0) / (st.n_src + 10.0), 9)
                            / round((cb.n_all + 1.0) / (tot.n_corpus + 10.0), 9)),
                         9), 9) AS psi_term
    FROM grid g
    JOIN st ON st.source = g.source
    JOIN cb ON cb.bucket = g.bucket
    CROSS JOIN tot
    """,
    tags=("llm", "curation", "drift"),
)
def y_source_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source (r7): each source's
    document-length distribution (10 fixed 200-char bands, top band
    open) against the corpus-wide distribution, Laplace-smoothed —
    Σ psi_term per source > 0.25 is the standard drifted-feed alarm.
    This is the ingestion-monitoring primitive a 100 TB pipeline runs
    per crawl snapshot: a feed whose length profile shifts (truncated
    fetches, boilerplate change, encoding bug) flags here before it
    poisons the mixture. Determinism: all counts are exact BIGINTs
    over a dense source×bucket grid (empty cells kept — drift IS
    mass vanishing from a band); smoothed shares are IEEE divisions
    rounded to 9; the one libm call (ln of a ratio of rounded shares)
    rounds to 9 in both engines before the final product. Two tiny
    grouped aggregates + broadcast joins — scan-bound."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.least(
            F.floor(F.col("n_chars") / 200.0).cast("bigint"),
            F.lit(9).cast("bigint"),
        ).alias("bucket"),
    )
    sb = b.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        b.select("source")
        .distinct()
        .crossJoin(F.broadcast(spark.range(10).withColumnRenamed("id", "bucket")))
        .join(sb, ["source", "bucket"], "left")
        .select("source", "bucket", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    st = grid.groupBy("source").agg(F.sum("n").alias("n_src"))
    cb = grid.groupBy("bucket").agg(F.sum("n").alias("n_all"))
    tot = grid.agg(F.sum("n").alias("n_corpus"))
    p = F.round((F.col("n") + 1.0) / (F.col("n_src") + 10.0), 9)
    q = F.round((F.col("n_all") + 1.0) / (F.col("n_corpus") + 10.0), 9)
    return (
        grid.join(st, "source")
        .join(F.broadcast(cb), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("n").alias("n_docs"),
            p.alias("p"),
            q.alias("q"),
            F.round((p - q) * F.round(F.log(p / q), 9), 9).alias("psi_term"),
        )
    )
