"""Dump `.explain("formatted")` for every bench query into
plans/r07/<query>_<tag>.txt (tag = before|after). The round-7 judge
checks plan-diff claims in OPTIMIZATION_r07.md against these files.

Usage: python tools/dump_plans_r07.py before|after [query ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "kg_pipeline", "kg_pipeline_crf", "kg_incremental", "cluster_context_counts",
    "hmm_decode_dict", "crf_decode_fixed", "transformer_decode",
    "dedup_minhash", "dedup_groups", "dict_mentions", "dict_triples",
    "sim_topk", "word_count", "eval_prf", "pack_sequences",
    "stratified_sample", "pricing_summary", "sessionize",
]


def main():
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import QUERIES
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans_r07_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"# {name} @ {SF} ({tag})\n")
            f.write(buf.getvalue())
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
