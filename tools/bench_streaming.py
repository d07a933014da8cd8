"""Steady-state streaming ingest benchmark (round-3 item #8).

`stream_kg_ingest` is correctness-gated (two availableNow batches ==
one-shot batch result, tests/test_streaming.py); this tool evidences the
SUSTAINED-load claim: per-micro-batch latency stays ~flat as total
ingested state grows, i.e. run_append does delta-only decode and
bucket-scoped commits, NOT a full-input rescan per micro-batch (if it
rescanned, batch latency would grow linearly across batches).

Protocol: a continuous (non-availableNow) file-source stream with
maxFilesPerTrigger=1; batches of ``turns_per_batch`` fresh-conversation
turns are dropped into the source dir one at a time; after each batch
is seen processed (StreamingQuery progress advance) we record its
trigger-execution time, input rows, and the on-disk size of the KG
state directory. One JSON line per batch + a summary line.

Usage: python tools/bench_streaming.py [turns_per_batch] [n_batches] [cores]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/bench_streaming"


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


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
    from hmm_crf_ner_fromscratch_spark.streaming.decode_stream import (
        read_transcript_stream,
        stream_kg_ingest,
    )

    # --constant-keys: every batch reuses the SAME conv_ids (content still
    # varies per batch via the seed, so per-batch decode work is unchanged)
    # -> state keys stay flat across the soak. The delta vs the default
    # growing-keys soak isolates the state-size-dependent trigger cost
    # from the fixed per-batch cost (round-5 verdict ask #6).
    constant_keys = "--constant-keys" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    turns_per_batch = int(args[0]) if len(args) > 0 else 50_000
    n_batches = int(args[1]) if len(args) > 1 else 10
    cores = int(args[2]) if len(args) > 2 else 32

    shutil.rmtree(BASE, ignore_errors=True)
    in_dir = os.path.join(BASE, "in")
    os.makedirs(in_dir)

    spark = get_spark(app_name="bench-streaming", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    model = train_hmm(
        read_conll(spark, "/root/reference/English/train.txt", doc_id="en")
    )
    pipe = IncrementalKGPipeline(
        spark, os.path.join(BASE, "kg"), model, n_buckets=64
    )

    # pre-materialize all batch files (generation cost must not pollute
    # ingest timings); fresh conversations per batch
    staged = []
    for k in range(n_batches):
        prefix = "c_" if constant_keys else f"b{k:03d}_"
        tx = synth_transcripts(spark, turns_per_batch, seed=1000 + k).withColumn(
            "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
        )
        stage_dir = os.path.join(BASE, f"stage_{k}")
        tx.coalesce(1).write.parquet(stage_dir)
        part = glob.glob(os.path.join(stage_dir, "part-*.parquet"))[0]
        staged.append(part)

    stream = read_transcript_stream(spark, in_dir, max_files_per_trigger=1)
    query = stream_kg_ingest(
        stream,
        pipe,
        os.path.join(BASE, "ckpt"),
        trigger_available_now=False,
    )

    seen = 0
    results = []
    try:
        for k, part in enumerate(staged):
            shutil.copy(part, os.path.join(in_dir, f"batch_{k:03d}.parquet"))
            deadline = time.time() + 1800  # survive a transiently loaded host; abort only a truly wedged batch
            progress = None
            while time.time() < deadline:
                for p in query.recentProgress[seen:]:
                    if p["numInputRows"] > 0:
                        progress = p
                        break
                seen = len(query.recentProgress)
                if progress:
                    break
                time.sleep(0.5)
            if progress is None:
                exc = query.exception()
                if exc is not None:
                    raise RuntimeError(
                        f"streaming query died on batch {k}: {exc}"
                    )
                raise RuntimeError(f"batch {k} never processed")
            trig_sec = progress["durationMs"]["triggerExecution"] / 1000
            rec = {
                "batch": k,
                "input_rows_metric": progress["numInputRows"],
                "turns": turns_per_batch,
                "trigger_sec": round(trig_sec, 2),
                "turns_per_sec": round(turns_per_batch / trig_sec),
                "state_bytes": _du(os.path.join(BASE, "kg")),
                "load": round(os.getloadavg()[0], 2),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    finally:
        query.stop()

    secs = [r["trigger_sec"] for r in results]
    half = len(secs) // 2
    print(
        json.dumps(
            {
                "summary": True,
                "turns_per_batch": turns_per_batch,
                "n_batches": len(secs),
                "constant_keys": constant_keys,
                "first_half_mean_sec": round(sum(secs[:half]) / max(half, 1), 2),
                "second_half_mean_sec": round(
                    sum(secs[half:]) / max(len(secs) - half, 1), 2
                ),
                "final_state_mb": round(results[-1]["state_bytes"] / 1e6, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
