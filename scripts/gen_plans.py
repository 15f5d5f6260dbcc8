"""Regenerate PLANS.md from the CURRENT tree (VERDICT r6 item 5).

The load-bearing plan properties are asserted by
tests/test_plan_quality.py on every run — this document is the
human-readable companion, and it previously went stale (the r6 q5
narration contradicted the pinned SortMergeJoin plan). Regenerating
it from the live tree with a recorded tree hash makes staleness
detectable: if `git rev-parse HEAD` disagrees with the header and
plans changed, re-run this script.

Usage: python scripts/gen_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"  # the SF test_plan_quality asserts at

# (section title, registry query name or None, narration)
SECTIONS: list[tuple[str, str | None, str]] = [
    (
        "tpch_q6",
        "tpch_q6",
        "All four predicates in PushedFilters; ReadSchema is the"
        " 4-column projection; single partial+final aggregate, no join.",
    ),
    (
        "tpch_q5",
        "tpch_q5",
        "Six-table join with the region predicate pushed through the"
        " join graph: the ASIA nation set is a broadcast semi-join"
        " pruning customer BEFORE any fact join, and dimension joins"
        " stay Catalyst-chosen broadcasts. The customer⋈orders and"
        " orders⋈lineitem FACT-FACT joins are pinned SortMergeJoin"
        " (r6 fact-broadcast audit: column pruning pushes fact size"
        " estimates under the broadcast threshold at sf1 and Catalyst"
        " would single-threadedly hash-build a whole pruned fact —"
        " measured 4.00→1.06 s at sf1 after the pin). A fact table is"
        " never the broadcast build side; tests/test_plan_quality.py"
        " asserts SortMergeJoin is present and facts are never"
        " BroadcastExchange inputs.",
    ),
    (
        "topk_per_group",
        "topk_per_group",
        "WindowGroupLimit below the shuffle: each task keeps <=3 rows"
        " per group before any exchange.",
    ),
    (
        "dedup_minhash_pairs",
        "dedup_minhash_pairs",
        "MinHash signatures as explode → codegen'd (h1,h2) → ONE"
        " HashAggregate of 16 partial mins (r10 — the HOF transform/"
        " array_min folds were interpreted per element); join-free"
        " banded bucket pairing with the bucket exchange pinned to"
        " defaultParallelism (AQE's byte-based coalescing can't see"
        " the quadratic in-bucket pair work).",
    ),
    (
        "ann_bruteforce_topk",
        "ann_bruteforce_topk",
        "Query panel broadcast against the corpus scan; per-query"
        " top-k via WindowGroupLimit — embarrassingly parallel, no"
        " corpus shuffle.",
    ),
    (
        "asof_join",
        "asof_join",
        "Union-sort-carry: one shuffle on the join key, one sort,"
        " last(ignorenulls) carries the most recent left row — no"
        " range self-join.",
    ),
    (
        "program_multiview_chain",
        "program_multiview_chain",
        "SQL program frontend: chained views fuse into ONE Catalyst"
        " plan; the shared input scans with pushdown per consumer.",
    ),
    (
        "grouping_sets_agg",
        "grouping_sets_agg",
        "One Expand pass feeding a single partial+final aggregate —"
        " not one aggregate per grouping set.",
    ),
    (
        "x_semdedup",
        "x_semdedup",
        "Cluster-scoped pairs behind a centroid_id equi-join; nlist"
        " scales with the corpus so in-cluster pair work stays"
        " bounded. Assignment (r10): in-row greatest() argmax over"
        " ≤64 collected centroids — no crossJoin, no SortAggregate;"
        " above 64 the broadcast crossJoin + max_by aggregate"
        " remains (identical tie semantics, pinned by test).",
    ),
    (
        "x_unigram_logprob",
        "x_unigram_logprob",
        "Corpus-trained unigram log-probs joined back broadcast;"
        " per-doc fold is a position-ordered JVM-side aggregate.",
    ),
    (
        "x_token_budget_mix",
        "x_token_budget_mix",
        "Per-source md5-ordered running-sum cut: one window shuffle"
        " per source partition, TakeOrderedAndProject where a slice is"
        " needed — no global sort.",
    ),
    (
        "y_heavy_hitters",
        "y_heavy_hitters",
        "Misra–Gries summaries per partition (bounded-memory"
        " mapInPandas), candidates-only shuffle, broadcast semi-join"
        " recount — the full key domain never shuffles.",
    ),
    (
        "y_simjoin_prefix",
        "y_simjoin_prefix",
        "Prefix-filtered Jaccard join: rarest-shingle prefix"
        " equi-join + length filter + exact verify. Zero false"
        " negatives; hot shingles cannot generate candidates because"
        " prefixes order by ascending document frequency.",
    ),
    (
        "y_window_distinct_count",
        "y_window_distinct_count",
        "Windowed COUNT(DISTINCT): bounded 5-row frame via"
        " size(array_distinct(collect_list)) — ≤5-element arrays; the"
        " RUNNING frame is the linear-state spelling (first-occurrence"
        " flag summed by a running SUM, r7 respell of the quadratic"
        " collect_list-over-unbounded form). No join, no Python, no"
        " unbounded per-row array.",
    ),
    (
        "y_dedup_containment_lsh",
        "y_dedup_containment_lsh",
        "Containment verify composed onto MinHash-LSH candidates (r7):"
        " banded signature equi-join proposes candid pairs; the exact"
        " shingle-intersection verify joins ONLY those pairs — verify"
        " cost scales with the candidate set, not all shingle-sharing"
        " pairs.",
    ),
    (
        "tpch_q21_waiting_suppliers",
        "tpch_q21_waiting_suppliers",
        "r7 single-scan rewrite of the EXISTS/NOT-EXISTS double"
        " correlation: ONE lineitem scan feeds a per-order"
        " collect_set window (state bounded by suppliers-per-order),"
        " the distinct-late-supplier-count==1 encoding replaces both"
        " correlated subqueries, and the window REUSES the join's"
        " orderkey partitioning — no Exchange between join and"
        " Window, ≤3 Exchanges total, one pinned SortMergeJoin"
        " (test_plan_quality.py:35). 10× anchor 1.3×.",
    ),
    (
        "y_source_drift_psi",
        "y_source_drift_psi",
        "Per-source PSI drift (r7): dense source×band grid built by"
        " a broadcast cross join of two tiny aggregates; exact"
        " integer counts; round-then-ln keeps the fold"
        " parallelism-stable; one map-side-combined aggregate per"
        " input pass, scan-bound at scale. Explicit FLOOR pins the"
        " double→int cast divergence found between DuckDB and Spark.",
    ),
    (
        "y_dedup_delta_apply",
        "y_dedup_delta_apply",
        "Incremental corpus-delta dedup (r8): only the delta is"
        " shingled/hashed/banded; the standing corpus contributes a"
        " persisted 3-column bucket table equi-joined on the band"
        " key (at scale: bucketed by (band_id, band_hash), so"
        " co-located and file-pruned). Combined hot-bucket cap"
        " reproduces the full cascade's from bucket sizes counted"
        " over delta-touched buckets ONLY (r10: broadcast semi-probe"
        " before the aggregate — the state is never shuffled);"
        " verify joins candidates only. Fixed-delta anchor: 2.1× at"
        " 100× corpus.",
    ),
    (
        "y_ann_delta_ingest",
        "y_ann_delta_ingest",
        "Incremental ANN ingest (r8): delta assignment is an IN-ROW"
        " cosine-argmax over the collected centroids (r10 — no join,"
        " no aggregate, no exchange; never touches the standing"
        " corpus); the merged index searches through the identical"
        " probe/bucket-join/rerank plan as a fresh one"
        " (ivf_search_assigned). Ingest anchor flat per delta vector"
        " at 100× index size.",
    ),
    (
        "embedding_lsh_neardup",
        "embedding_lsh_neardup",
        "SRP-LSH cascade, fully ORACLED since r8 via persisted"
        " hyperplanes: numpy Arrow-batched signatures, 16×4-bit"
        " banding, in-bucket 256-bit Hamming prefilter (popcount"
        " inside the codegen'd bucket row — random collisions die"
        " before any pair is shuffled; bucket exchange pinned to"
        " defaultParallelism so AQE can't serialize the quadratic"
        " pair stage — r10), exact cosine verify on survivors."
        " Candidate-bound, never all-pairs.",
    ),
    (
        "y_dedup_delta_retract",
        "y_dedup_delta_retract",
        "Signed-delta retraction (r9): candidates enumerate only from"
        " TOUCHED buckets (retracted/added band keys), live old-side"
        " and new-side; membership resolves against each pair's full"
        " witness set; verification is candidate-bound on both text"
        " versions. |delta|-sized inputs and both verified-pair"
        " frames are lineage-cut (ExistingRDD nodes) so the signed"
        " diff evaluates each verify once and the corpus text is"
        " scanned ≤5 times, pruned (was 8 with double evaluation"
        " before the cuts). Standing state read as the lean 3-column"
        " bucket table, probed via planning-time broadcasts of the"
        " delta-bound key sets (r10 — the state and the corpus text"
        " are never shuffled), with both states' bucket sizes"
        " counted over touched ∪ witness bucket keys only."
        " Fixed-delta anchor: 2.5× at 100× corpus.",
    ),
    (
        "y_ann_delta_commit",
        "y_ann_delta_commit",
        "ANN store commit (r9): the returned frame is the LIVE view —"
        " partitioned vectors scan anti-joined against the broadcast"
        " tombstone table; the append path (not in this read plan)"
        " writes new files into only the delta's centroid_id"
        " partitions (file-locality test). Partition pruning reaches"
        " the scan through the broadcast anti-join"
        " (test_similarity.py PartitionFilters pin). Commit anchor:"
        " FLAT at 100× index size.",
    ),
    (
        "y_dedup_span_excise",
        "y_dedup_span_excise",
        "Span excision (r9): the y_duplicate_spans pipeline (one"
        " positional-shingle explode, one shingle→min-doc aggregate,"
        " one per-doc window) plus a per-doc islands collect and ONE"
        " higher-order-function stitch projection — filter over the"
        " words array with an exists() per token, all inside"
        " codegen; no per-token shuffle, no UDF. Linear decade:"
        " 10.3× wall for 10× data (sf1→sf10).",
    ),
]

STATIC = """\
## Recognized view chains (compiler/program.py)

`IncrementalProgram(optimize=True).plan()` reports the chosen circuit
per view. Recognized shapes compile to |delta|-cost operators
(plans/incremental.py); everything else falls back to naive
recompute, never silently wrong. The recognizer is guarded by a real
parser cross-check (compiler/ast_guard.py): a regex misparse can only
LOSE an optimization, never change results.

## Incremental operators (plans/incremental.py)

Per-step cost is proportional to the delta (plus touched groups/keys
for recompute-class operators). Each operator is property-tested
optimized==naive under random insert/delete streams
(tests/test_incremental_ops.py).

## prefix_sum_by_hash (two-phase scale path)

operators/prefix_sum.py: per-bucket local sorts + broadcast exclusive
offsets — row-identical to the windowed running sum, without the
single-reducer global sort. Used by the shard manifest and
token-budget mixing at scale.
"""


def _tree(plan: str) -> str:
    # keep the numbered tree, drop the per-node detail section
    m = re.search(r"\n\n\(1\) ", plan)
    return plan[: m.start()] if m else plan


def main() -> int:
    from sql_to_dbsp_compiler_spark.queries import REGISTRY
    from sql_to_dbsp_compiler_spark.session import get_spark

    spark = get_spark("gen_plans", master="local[8]")
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()

    out = [
        "# PLANS — physical-plan evidence for the scale claims (generated)",
        "",
        f"Generated by `python scripts/gen_plans.py` at tree `{head[:12]}`",
        f"on SF data `{SF}`. Source of truth is tests/test_plan_quality.py,",
        "which asserts the load-bearing plan properties on every run; if",
        "this header's tree hash is stale, re-run the script.",
        "",
    ]
    for title, qname, narration in SECTIONS:
        out.append(f"## {title}")
        out.append("")
        out.append(narration)
        out.append("")
        if qname is not None:
            df = REGISTRY[qname].fn(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            out.append("```")
            out.append(_tree(plan).rstrip())
            out.append("```")
            out.append("")
    out.append(STATIC)
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path} at tree {head[:12]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
