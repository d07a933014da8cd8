"""Deliberate-skew benchmark for K1 salting (round-4 item #4).

``salted_turns`` is bit-match-tested (decode-through-salted-path equals
unsalted decode) but its *performance* claim -- a pathologically long
conversation must not pin one task -- was never stress-measured. This
tool builds the pathological corpus on purpose: HALF the turns live in
ONE conversation (``giant_conv``), the other half spread over 512
ordinary conversations. Both the salted and the unsalted path then run
the identical fused decode+extract job over the identical parquet input:

* ``unsalted``: ``repartition(n_parts, "conv_id")`` -- the layout every
  per-conversation operator would naively ask for; the giant
  conversation hashes into a single partition, so one task owns ~50% of
  all tokens and the stage waits on that straggler.
* ``salted``:   ``salted_turns(df, bucket, n_parts)`` -- composite key
  ``(conv_id, turn_idx // bucket)`` splits the giant conversation over
  ``ceil(len/bucket)`` tasks; max partition size is corpus/n_parts-ish
  regardless of conversation shape.

Reported per mode: decode wall time, rows in the largest partition, and
partition-size p50/max (via spark_partition_id counts -- cheap, and it
IS the imbalance the wall time pays for). One JSON line to stdout for
BENCH/skew.jsonl; run on an otherwise-idle box.

Usage: python tools/bench_skew.py [n_turns] [bucket] [n_parts]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR_TMPL = "/tmp/bench_skew_input_{n_turns}"


def main() -> None:
    # read BEFORE any Spark work: an end-of-run reading reports this
    # bench's own executor load, not box idleness
    load_start = round(os.getloadavg()[0], 2)
    from pyspark.sql import functions as F

    from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract
    from hmm_crf_ner_fromscratch_spark.operators.hmm import train_hmm
    from hmm_crf_ner_fromscratch_spark.session import get_spark
    from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
    from hmm_crf_ner_fromscratch_spark.sources.transcripts import (
        salted_turns,
        synth_transcripts,
        tokenize_turns,
    )

    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n_parts = int(sys.argv[3]) if len(sys.argv) > 3 else None

    spark = get_spark(app_name="bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism * 2

    # Materialize the corpus once so both modes read the identical bytes
    # and generation cost stays out of the timed region.
    half = n_turns // 2
    giant = synth_transcripts(spark, half, n_convs=1, seed=7).withColumn(
        "conv_id", F.lit("giant_conv")
    )
    rest = synth_transcripts(spark, n_turns - half, n_convs=512, seed=11)
    # Cache keyed by n_turns and gated on _SUCCESS: the round-4 artifact
    # was silently measured on a stale ~20k-turn corpus because a fixed
    # path was reused whenever non-empty (ADVICE round 4).
    data_dir = DATA_DIR_TMPL.format(n_turns=n_turns)
    if not os.path.exists(os.path.join(data_dir, "_SUCCESS")):
        shutil.rmtree(data_dir, ignore_errors=True)
        giant.unionByName(rest).write.mode("overwrite").parquet(data_dir)
    turns = tokenize_turns(spark.read.parquet(data_dir)).select(
        "conv_id", "turn_idx", "tokens"
    )
    total_tokens = turns.select(F.sum(F.size("tokens"))).first()[0]
    n_rows = turns.count()
    if n_rows != n_turns:
        raise SystemExit(
            f"corpus at {data_dir} has {n_rows} turns, expected {n_turns} -- "
            "stale cache? delete the dir and rerun"
        )

    model = train_hmm(
        read_conll(spark, "/root/reference/English/train.txt", doc_id="t")
    )

    out: dict = {
        "n_turns": n_turns,
        "total_tokens": int(total_tokens),
        "bucket": bucket,
        "n_parts": n_parts,
        "cores": spark.sparkContext.defaultParallelism,
    }
    for mode in ("unsalted", "salted"):
        if mode == "unsalted":
            part = turns.repartition(n_parts, "conv_id")
        else:
            part = salted_turns(turns, bucket=bucket, partitions=n_parts)
        part = part.persist()
        sizes = (
            part.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("rows"))
            .orderBy("rows")
            .collect()
        )
        rows = [r.rows for r in sizes]
        t0 = time.time()
        decode_and_extract(part, model, key_cols=("conv_id", "turn_idx")).count()
        wall = round(time.time() - t0, 3)
        part.unpersist()
        out[mode] = {
            "decode_sec": wall,
            "tokens_per_sec": round(total_tokens / wall),
            "max_part_rows": max(rows),
            "p50_part_rows": rows[len(rows) // 2],
            "nonempty_parts": len(rows),
        }
    out["speedup"] = round(
        out["unsalted"]["decode_sec"] / out["salted"]["decode_sec"], 2
    )
    out["load_start"] = load_start
    out["load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
