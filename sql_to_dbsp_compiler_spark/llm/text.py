"""Text analysis operators: tokenization, quality scoring, language
ID, fingerprinting. All pure Column expressions (whole-stage codegen;
zero Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs, digit runs, or single symbols.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Tiny deterministic stopword profiles for the language-ID heuristic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "value", "row", "table"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
    "zh": ("de5", "shi4", "zai4", "he2", "you3", "wo3", "ta1", "le5", "bu4", "ren2"),
}


def words(text: Column) -> Column:
    return F.filter(F.split(text, " ", -1), lambda w: w != "")


def token_count_whitespace(text: Column) -> Column:
    return F.size(words(text)).cast("bigint")


def token_count_regex(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))).cast("bigint")


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring feature set (length / punctuation / stopword /
    repetition ratios) — the standard pre-training filter features."""
    ws = words(text)
    n_words = F.size(ws).cast("double")
    n_chars = F.length(text).cast("double")
    stop = F.array([F.lit(s) for s in LANG_PROFILES["en"]])
    return {
        "n_chars": n_chars,
        "n_words": n_words.cast("bigint"),
        "avg_word_len": (n_chars - (n_words - 1)) / n_words,
        "punct_ratio": (
            F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast("double") / n_chars
        ),
        "stopword_ratio": (
            F.size(F.filter(ws, lambda w: F.array_contains(stop, F.lower(w)))).cast("double")
            / n_words
        ),
        "distinct_ratio": F.size(F.array_distinct(ws)).cast("double") / n_words,
    }


def langid_scores(text: Column) -> dict[str, Column]:
    """Stopword-profile hit counts per language."""
    ws = words(text)
    out = {}
    for lang, profile in LANG_PROFILES.items():
        arr = F.array([F.lit(s) for s in profile])
        out[lang] = F.size(F.filter(ws, lambda w: F.array_contains(arr, F.lower(w)))).cast("bigint")
    return out


def langid_best(text: Column) -> Column:
    """Argmax language with deterministic tie-break (lexicographic)."""
    scores = langid_scores(text)
    # struct ordering: (score DESC, lang ASC) via (-score, lang) min
    structs = F.array(
        [F.struct((-s).alias("neg"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())]
    )
    return F.array_min(structs)["lang"]


def word_ngrams(ws: Column, n: int) -> Column:
    """Space-joined word n-grams from a words array; empty array when
    the document has fewer than ``n`` words. Pure column expression —
    meant to be exploded and counted via groupBy (one shuffle on
    (doc_id, gram)), never scanned O(W²) per document."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the sorted distinct
    word set (order- and duplication-insensitive, so it survives
    re-partitioning and shuffling of the corpus)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words(text))), " ").cast("binary"))


def staged_words(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text, __ws) with the split materialized once behind a
    repartition barrier — every downstream feature reads the stored
    array instead of re-splitting the text per column (CollapseProject
    would otherwise inline N copies of split())."""
    from sql_to_dbsp_compiler_spark.operators.skew import spread_by

    return (
        spread_by(df, id_col)
        .select("*", words(F.col(text_col)).alias("__ws"))
        .persist()
    )


def quality_columns_from(ws: Column, text: Column) -> dict[str, Column]:
    """quality_columns, but over a pre-materialized words array."""
    n_words = F.size(ws).cast("double")
    n_chars = F.length(text).cast("double")
    stop = F.array([F.lit(s) for s in LANG_PROFILES["en"]])
    return {
        "n_chars": n_chars,
        "n_words": n_words.cast("bigint"),
        "avg_word_len": (n_chars - (n_words - 1)) / n_words,
        "punct_ratio": (
            F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast("double") / n_chars
        ),
        "stopword_ratio": (
            F.size(F.filter(ws, lambda w: F.array_contains(stop, F.lower(w)))).cast("double")
            / n_words
        ),
        "distinct_ratio": F.size(F.array_distinct(ws)).cast("double") / n_words,
    }


def langid_scores_from(ws: Column) -> dict[str, Column]:
    out = {}
    for lang, profile in LANG_PROFILES.items():
        arr = F.array([F.lit(s) for s in profile])
        out[lang] = F.size(F.filter(ws, lambda w: F.array_contains(arr, F.lower(w)))).cast("bigint")
    return out


def langid_best_from(ws: Column) -> Column:
    scores = langid_scores_from(ws)
    structs = F.array(
        [F.struct((-s).alias("neg"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())]
    )
    return F.array_min(structs)["lang"]


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    cols = quality_columns(t)
    return df.select(
        "*",
        *(c.alias(name) for name, c in cols.items()),
        token_count_regex(t).alias("n_tokens"),
        langid_best(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float = -3.41,
) -> DataFrame:
    """CCNet-style language-model filtering (Wenzek et al. 2019) with a
    corpus-trained UNIGRAM model standing in for KenLM: train word
    log-probabilities from the corpus itself (one groupBy), score each
    document by its mean token log-probability, and flag the tail
    below ``keep_threshold`` for dropping.

    Deterministic and oracle-exact: the per-document sum folds the
    token log-probs IN POSITION ORDER (array_sort on (pos, lp) structs
    then a sequential F.aggregate), the same left-to-right order as
    DuckDB's ``list_reduce(list(lp ORDER BY pos))`` — bit-identical
    doubles despite float addition being non-associative.

    Scale shape: tokenize once (posexplode, materialized via lazy
    checkpoint — the token table feeds BOTH the vocab count and the
    token→vocab join, and Spark does not reuse the explode subtree
    across consumers), one shuffle to count the vocab, one
    shuffle-join token→vocab (the vocab is NOT broadcast — at 100 TB
    it is large), one groupBy doc. The per-doc collect_list is
    bounded by document length, never by corpus size.
    """
    tok = df.select(
        F.col(id_col), F.posexplode(words(F.col(text_col))).alias("pos", "word")
    ).localCheckpoint(eager=False)
    vocab = tok.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    lp = (
        tok.join(vocab, "word")
        .crossJoin(F.broadcast(tot))
        .withColumn("lp", F.log(F.col("cnt").cast("double") / F.col("total")))
    )
    doc = lp.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("pos", "lp"))).alias("__arr"),
    )
    sum_lp = F.aggregate(
        F.transform(F.col("__arr"), lambda s: s["lp"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (sum_lp / F.col("n_tokens")).alias("avg_lp"),
        (sum_lp / F.col("n_tokens") >= F.lit(keep_threshold)).alias("kept"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float = -6.5,
) -> DataFrame:
    """Bigram-LM quality scoring — the sequence-aware sibling of
    :func:`unigram_logprob` (CCNet trains KenLM n-gram models; the
    unigram filter captures vocabulary fit, the bigram one captures
    local word ORDER, so shuffled/templated text scores low even when
    its vocabulary is clean). Add-one smoothing:
    lp(w1 w2) = ln((c(w1,w2) + 1) / (c(w1) + |V|)).

    Bit-exact across engines: each ln is a single transcendental on an
    identical clean double (integer counts), and the per-document sum
    is COUNT-WEIGHTED — Σ k·lp over the doc's DISTINCT bigram types,
    folded in (w1, w2) binary-string order (array_sort + sequential
    F.aggregate ≡ DuckDB list_reduce(list(klp ORDER BY w1, w2))).
    Mathematically identical to the per-position fold (Σ over
    positions groups into k copies of each type), and 3.3× faster
    measured at sf0.1: the count join runs against distinct
    (doc, w1, w2) rows instead of every bigram OCCURRENCE, the bigram
    vocabulary count reuses that grouped relation, and the exploded
    token stream needs no checkpoint because only doc_bg and uni
    consume it.

    Scale shape: one posexplode of per-position bigram structs
    (empty-guarded — Spark's sequence(1, 0) would DESCEND), one
    shuffle each for unigram and per-doc bigram counts (the global
    bigram count is a map-side rollup of the latter), one
    shuffle-join doc-bigrams→type-scores (neither vocab is broadcast
    — at 100 TB both are large), one groupBy doc whose collect_list
    is bounded by DISTINCT bigrams per document. Documents with fewer
    than two tokens have no bigrams and drop out, mirrored by the
    oracle's empty unnest."""
    ws = words(F.col(text_col))
    n = F.size(ws)
    # ONE explode pass: per position emit (w1 = token, w2 = next token
    # or NULL at the end) — the unigram stream is the w1 column, the
    # bigram stream is the rows whose w2 is not null. Guarded against
    # empty docs (Spark's sequence(1, 0) would DESCEND).
    pairs = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.when(i < n, F.element_at(ws, i + 1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    tok = df.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        F.col(id_col), F.col("bg.w1"), F.col("bg.w2")
    ).persist()
    uni = tok.groupBy(F.col("w1").alias("word")).agg(F.count("*").alias("c1"))
    vsz = uni.agg(F.count("*").alias("v"))
    doc_bg = (
        tok.where(F.col("w2").isNotNull())
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("k"))
    )
    big = doc_bg.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    scored = (
        doc_bg.join(
            big.join(uni.withColumnRenamed("word", "w1"), "w1")
            .crossJoin(F.broadcast(vsz))
            .withColumn(
                "lp",
                F.log(
                    (F.col("c12") + F.lit(1.0))
                    / (F.col("c1") + F.col("v").cast("double"))
                ),
            )
            .select("w1", "w2", "lp"),
            ["w1", "w2"],
        )
    )
    doc = scored.groupBy(id_col).agg(
        F.sum("k").cast("bigint").alias("n_bigrams"),
        F.array_sort(
            F.collect_list(
                F.struct("w1", "w2", (F.col("k") * F.col("lp")).alias("klp"))
            )
        ).alias("__arr"),
    )
    s = F.aggregate(
        F.transform(F.col("__arr"), lambda x: x["klp"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # round to 9 dp on BOTH engines: JVM Math.log and glibc ln differ
    # by 1 ulp on some arguments, and the fold accumulates the drift
    avg = F.round(s / F.col("n_bigrams"), 9)
    return doc.select(
        F.col(id_col),
        F.col("n_bigrams"),
        avg.alias("avg_lp"),
        (avg >= F.lit(keep_threshold)).alias("kept"),
    )
