"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "decode_tokens_per_sec": ...}

The headline is the flagship KG pipeline (train + Viterbi decode +
mentions + triples + linking + components + edges); supporting queries
cover dedup, similarity search, eval, and the relational operators.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/bench_scaling.py and BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

BENCH_QUERIES = [
    "kg_pipeline",
    "hmm_decode_dict",
    "dedup_minhash",
    "sim_topk",
    "dict_mentions",
    "dict_triples",
    "eval_prf",
    "word_count",
    "pricing_summary",
    "sessionize",
]


def main() -> None:
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import QUERIES
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # decode token volume for the throughput figure
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_decode_tokens = (
        docs.where(F.col("doc_id") % 5 == 0)
        .select(F.sum(F.size(F.split("text", " "))).alias("n"))
        .first()["n"]
    )

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    decode_tps = (
        round(n_decode_tokens / timings["hmm_decode_dict"]) if timings.get("hmm_decode_dict") else None
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "decode_tokens_per_sec": decode_tps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
