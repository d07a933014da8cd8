"""Dump formatted physical plans for the load-bearing queries into
docs/PLANS.md, with the plan properties each one is expected to exhibit
(pushdown, pruning, broadcast, codegen, no redundant shuffles). Re-run
after any operator change: `python tools/explain_plans.py`.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

EXPECTATIONS = {
    "word_count": (
        "Scan reads ONLY the text column (ReadSchema pruning); partial hash "
        "aggregate before the exchange (map-side combine); whole-stage codegen "
        "covers scan->explode->partial agg."
    ),
    "pricing_summary": (
        "Filter pushed into the parquet scan (PushedFilters on l_shipdate); "
        "ReadSchema limited to the 6 referenced columns; single shuffle for "
        "the final aggregate."
    ),
    "top_customers": (
        "nation joined via BroadcastHashJoin (explicit hint); orders "
        "pre-aggregated before joining customer (partial agg under the "
        "exchange); top-k via TakeOrderedAndProject (per-partition heaps), "
        "with the rank Window running over only the 10 surviving rows."
    ),
    "dict_triples": (
        "ONE parquet scan and ONE MapInPandas stage feeding a lead() Window "
        "keyed by doc_id -- adjacency of non-overlapping spans needs no "
        "self-join (a self-join would recompute the python span-extraction "
        "stage per side); the rule map is constant-folded into the CASE "
        "projection."
    ),
    "dedup_minhash": (
        "Shingle explode -> partial min-aggregates for the 12 minhashes in "
        "one hash aggregate pass; band candidates join on (band, bh) equality; "
        "AQE coalesces the small post-filter partitions."
    ),
    "sim_topk": (
        "Query side broadcast (BroadcastNestedLoopJoin/BroadcastHashJoin over "
        "8 rows); corpus scanned once; all arithmetic JVM-side (zip_with/"
        "aggregate), no python stage; single window for the top-k."
    ),
    "ann_lsh_topk": (
        "Hyperplane components are array LITERALS in the projection (no "
        "per-row md5); corpus bucketed in one pass; probe side broadcast; "
        "join on the int bucket key only."
    ),
    "ann_ivf_topk": (
        "Corpus-to-centroid assignment is ONE vectorized mapInPandas stage "
        "(int64 matmul per Arrow batch -- round 5 replaced per-centroid "
        "interpreted Catalyst lambdas, which cost 282-774s at 1M vectors); "
        "probe rows broadcast; join on the int cluster key; one window for "
        "top-k. With assign_ivf's prebuilt index the python stage leaves "
        "the per-query path entirely."
    ),
    "transformer_decode": (
        "Emission synthesis is pure JVM expression work (sequence/transform "
        "over md5 ints, constant-foldable parameters); ONE MapInPandas stage "
        "for the batched Viterbi; no shuffle anywhere (decode is per-row)."
    ),
    "eval_report": (
        "Token scan feeds TWO branch aggregates (per-gold / per-pred) over "
        "the same exploded frame; the summary rows derive from a 1-row "
        "pivot of the localCheckpointed counts -- no re-scan of the corpus "
        "per summary row."
    ),
    "image_channel_stats": (
        "Distributed synthesis (spark.range + md5 exprs, no source scan) "
        "feeds ONE python stage (mapInPandas PPM parse) -- no shuffle "
        "anywhere; decode is embarrassingly parallel over range splits."
    ),
    "jaccard_ngram": (
        "Shingle explode -> document-frequency aggregate -> rare-shingle "
        "semi filter BEFORE the pair self-join (the stop-shingle cap bounds "
        "join fan-out); exact confirm joins the pre-aggregated shingle sets "
        "by doc id (no per-pair re-shingling)."
    ),
    "cluster_context_counts": (
        "Scan reads ONLY the text column; union of L/R pair projections is "
        "narrow (no shuffle before the single hash aggregate); the context "
        "filter compiles to an InSet predicate BEFORE the exchange so only "
        "pairs with retained contexts shuffle; partial aggregation map-side."
    ),
    "kg_pipeline_crf": (
        "One python (ArrowEvalPython/mapInPandas) stage for the fused "
        "decode+extract; the adjacency window is a single per-(conv,turn) "
        "sort; edge aggregation is one shuffle; the committed model rides a "
        "broadcast, not a join."
    ),
    "gazetteer": (
        "Both tagging branches scan ONLY the text column (ReadSchema "
        "pruning); the dictionary tag inventories constant-fold into CASE/"
        "InSet projections; the non-O filter applies BEFORE the exchange so "
        "only entity tokens shuffle; one combiner-reduced hash aggregate "
        "(partial collect_set/count map-side)."
    ),
    "dedup_groups": (
        "Minhash pair plan reused unchanged (hash-based numeric signature "
        "aggregate, band-equality join); component closure on the tiny "
        "confirmed-pair graph; group sizes from one aggregate over the "
        "doc->group assignment; singleton docs coalesce to themselves "
        "(left join, no second scan of the corpus)."
    ),
    "pack_sequences": (
        "ONE window partitioned by shard (hashpartitioning, never "
        "SinglePartition -- a global sort would serialize the corpus); "
        "token counts from the scan projection; all expression work, no "
        "python stage."
    ),
    "stratified_sample": (
        "WindowGroupLimit partial pass BEFORE the stratum exchange: only "
        "<= quota rows per stratum per input partition shuffle; "
        "deterministic md5 order; one shuffle total."
    ),
    "contamination": (
        "Benchmark n-gram side is tiny by construction and BROADCASTS; "
        "training side streams through the semi-join equality on the "
        "n-gram string; one aggregate for per-doc hit counts; no "
        "cartesian anywhere."
    ),
    "repetition_stats": (
        "Pure per-row expression work over one scan (n-gram transform + "
        "array_distinct inside the projection); ZERO shuffles, zero "
        "python stages."
    ),
    "kg_incremental": (
        "Final-edges plan over the MERGED bucketed stage table: the scan "
        "shows the bucket partition column (Hive layout) and the upstream "
        "localCheckpoint cut (the two delta ingests already committed via "
        "dynamic partition overwrite; delta reads inside the ingests are "
        "partition-pruned -- PartitionFilters: bucket IN (...), verified "
        "separately). Tail is identical to kg_pipeline: window-lead "
        "adjacency templating + edge hash aggregate."
    ),
}


def main():
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import QUERIES
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    spark = get_spark(app_name="explain", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "PLANS.md",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as out:
        out.write(
            "# Physical plans of the load-bearing queries\n\n"
            "Generated by `python tools/explain_plans.py` at sf0.01. Each "
            "section states the plan properties the query is designed to "
            "exhibit, followed by `explain('formatted')` output for review.\n"
        )
        for name, expect in EXPECTATIONS.items():
            df = QUERIES[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out.write(f"\n## {name}\n\n**Design intent:** {expect}\n\n")
            out.write("```\n" + buf.getvalue().strip() + "\n```\n")
            print(f"wrote plan for {name}")
    spark.stop()
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
