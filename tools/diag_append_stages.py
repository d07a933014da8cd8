"""Diagnostic: per-stage run_append timings across a chain of appends.

Prints one JSON line per batch with IncrementalResult.metrics (per-stage
seconds + rows), to locate any stage whose cost grows with batch index
(a stage that scans accumulated state instead of the delta).

Usage: python tools/diag_append_stages.py [turns_per_batch] [n_batches] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from hmm_crf_ner_fromscratch_spark.operators.hmm import train_hmm
    from hmm_crf_ner_fromscratch_spark.plans.incremental import (
        IncrementalKGPipeline,
    )
    from hmm_crf_ner_fromscratch_spark.session import get_spark
    from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
    from hmm_crf_ner_fromscratch_spark.sources.transcripts import (
        synth_transcripts,
    )

    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    base = "/tmp/diag_append"
    shutil.rmtree(base, ignore_errors=True)
    spark = get_spark(app_name="diag-append", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    model = train_hmm(
        read_conll(spark, "/root/reference/English/train.txt", doc_id="en")
    )
    pipe = IncrementalKGPipeline(spark, base, model, n_buckets=64)

    for k in range(n_batches):
        tx = synth_transcripts(spark, turns, seed=1000 + k).withColumn(
            "conv_id", F.concat(F.lit(f"b{k:03d}_"), F.col("conv_id"))
        ).localCheckpoint(eager=True)
        t0 = time.time()
        res = pipe.run_append(tx)
        total = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "batch": k,
                    "total_sec": total,
                    "stages": {
                        s: m.get("sec") for s, m in res.metrics.items()
                    },
                    "load": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
