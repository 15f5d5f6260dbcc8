"""BPE vocabulary learning: exact parity with a pure-Python replica,
algorithm invariants, and plan hygiene. x_bpe_pair_counts (iteration
zero) is oracle-gated in test_oracle_parity; these tests carry the
iterative part the SQL oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.llm.bpe import learn_bpe, learn_bpe_py, pair_counts
from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_learn_bpe_matches_python_replica(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    got = learn_bpe(spark, docs, num_merges=8)
    want = learn_bpe_py(texts, num_merges=8)
    assert got == want


def test_learn_bpe_on_toy_corpus(spark):
    # the classic BPE example: 'ab' dominates, then builds longer runs
    rows = [("abab abab", ), ("abc abab", ), ("abab", )]
    docs = spark.createDataFrame(rows, "text string")
    got = learn_bpe(spark, docs, num_merges=3)
    want = learn_bpe_py([r[0] for r in rows], num_merges=3)
    assert got == want
    assert got[0][1:3] == ("a", "b")  # first merge is the dominant pair
    # merged tokens feed later merges (vocabulary actually rewrites)
    assert any(len(left) > 1 or len(right) > 1 for _, left, right, _ in got[1:])


def test_learn_bpe_counts_monotone_and_valid(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(spark, docs, num_merges=6)
    assert len(merges) == 6
    counts = [n for _, _, _, n in merges]
    # each merge can only reduce or keep the best remaining pair count
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert all(n > 0 for n in counts)
    # deterministic across runs (seedless but tiebreak-total-ordered)
    again = learn_bpe(spark, docs, num_merges=6)
    assert merges == again


def test_bpe_pair_counts_plan(spark, sf_correct_dir):
    """Iteration zero stays JVM-side: no Python eval in the pair-count
    pass (the pandas UDF only appears in the iterative rewrite)."""
    df = REGISTRY["x_bpe_pair_counts"].fn(spark, sf_correct_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_pair_counts_weighted_by_word_frequency(spark):
    vocab = spark.createDataFrame(
        [(["a", "b"], 3), (["a", "b", "c"], 2), (["x"], 5)],
        "syms array<string>, n long",
    )
    rows = {
        (r.left, r.right): r.n for r in pair_counts(vocab).collect()
    }
    assert rows == {("a", "b"): 5, ("b", "c"): 2}


def test_bpe_encode_matches_array_walk(spark):
    """The (sym)-wrapped replace() chain used by x_bpe_encode must
    equal the classic BPE array walk (apply merges in rank order,
    each left-to-right non-overlapping) — including the adjacent-
    match case where naive space-delimited replace() diverges
    (e.g. 'abab' with merge (a,b) must become [ab][ab], and 'lll'
    with (l,l) must become [ll][l])."""
    from pyspark.sql import functions as F

    merges = [("a", "b"), ("l", "l"), ("ab", "ab")]

    def walk(word):
        syms = list(word)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = ["abab", "lll", "llll", "ababab", "hello", "ba", "abba", "a"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    enc = F.regexp_replace(F.col("word"), "(.)", "($1)")
    for left, right in merges:
        enc = F.replace(enc, F.lit(f"({left})({right})"), F.lit(f"({left}{right})"))
    rows = {r["word"]: r["e"] for r in df.withColumn("e", enc).collect()}
    for w in words:
        expected = "".join(f"({s})" for s in walk(w))
        assert rows[w] == expected, f"{w}: {rows[w]} != {expected}"
