"""Round-7 forensic soak: drive IncrementalKGPipeline.run_append directly
(no streaming layer) over growing-key batches and record the PER-STAGE
metrics the foreachBatch sink discards, so the state-size-dependent drift
can be attributed to a stage instead of a curve.

Usage: python tools/soak_profile_r07.py [turns_per_batch] [n_batches]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/soak_profile_r07"


def main() -> None:
    from pyspark.sql import functions as F

    from hmm_crf_ner_fromscratch_spark.operators.hmm import train_hmm
    from hmm_crf_ner_fromscratch_spark.plans.incremental import IncrementalKGPipeline
    from hmm_crf_ner_fromscratch_spark.session import get_spark
    from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
    from hmm_crf_ner_fromscratch_spark.sources.transcripts import synth_transcripts

    turns_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    spark = get_spark(app_name="soak-profile-r07")
    spark.sparkContext.setLogLevel("ERROR")
    model = train_hmm(read_conll(spark, "/root/reference/English/train.txt", doc_id="en"))
    pipe = IncrementalKGPipeline(spark, os.path.join(BASE, "kg"), model, n_buckets=64)

    for k in range(n_batches):
        tx = synth_transcripts(spark, turns_per_batch, seed=1000 + k).withColumn(
            "conv_id", F.concat(F.lit(f"b{k:03d}_"), F.col("conv_id"))
        ).persist()
        tx.count()
        t0 = time.time()
        res = pipe.run_append(tx)
        wall = round(time.time() - t0, 2)
        tx.unpersist()
        stage_secs = {s: m["sec"] for s, m in res.metrics.items()}
        accounted = round(sum(stage_secs.values()), 2)
        print(json.dumps({
            "batch": k, "wall_sec": wall, "accounted": accounted,
            "unaccounted": round(wall - accounted, 2), "stages": stage_secs,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
