#!/bin/bash
# Round-6 measurement session: reproduces every BENCH artifact the round
# committed, on an idle box, in the order they were produced. All stderr
# goes to /tmp (round-4 lesson); every artifact records load/steal/env
# so it is self-adjudicating.
set -u
cd "$(dirname "$0")/.."

for _ in $(seq 1 1440); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  if python -c "import sys; sys.exit(0 if float('$LOAD') > 2.0 else 1)"; then
    sleep 10
  else
    break
  fi
done

set -x
# CRF fused-decode scaling after the vectorized kernel (appends to the
# history in BENCH/scaling_crf.jsonl; 32-core leg is the headline)
python tools/bench_scaling.py 200000 --crf \
  >> BENCH/scaling_crf.jsonl 2> /tmp/scale_crf_r6.err

# streaming soak pair: growing keys (default) vs constant keys -- the
# delta isolates the state-size-dependent trigger cost
python tools/bench_streaming.py 50000 32 32 \
  > BENCH/streaming_soak_32_r6.jsonl 2> /tmp/soak_r6_grow.err
python tools/bench_streaming.py 50000 32 32 --constant-keys \
  > BENCH/streaming_soak_32_r6_constkeys.jsonl 2> /tmp/soak_r6_const.err

# the idle bench twin (full round-6 query list incl. dedup_groups,
# pack_sequences, stratified_sample)
python bench.py > BENCH/bench_r6_idle.json 2> /tmp/bench_r6_idle.err

# quality runs (long; ~33 min English + ~8 min Chinese with the batched
# gradient kernel). Logs land in BENCH/ via cp below.
CLUSTER_MIN_COUNT=2 CLUSTER_DEPTH=8 CLUSTER_GRANULARITIES=4,6,8 \
CLUSTER_BIGRAMS=0 GAZ_MIN_COUNT=2 SHAPE_TRIGRAM=1 \
  python tools/train_crf_full.py 42 1.0 /tmp/crf_r6_trigram 2.0 gaz 15 \
  > /tmp/crf_r6_trigram.out 2> /tmp/crf_r6_trigram.err
cp /tmp/crf_r6_trigram/log.jsonl BENCH/crf_trigram_r6.log.jsonl

CLUSTER_MIN_COUNT=2 CLUSTER_DEPTH=8 CLUSTER_GRANULARITIES=4,6,8 \
CLUSTER_BIGRAMS=0 GAZ_MIN_COUNT=2 \
  python tools/train_crf_full.py 18 1.0 /tmp/crf_r6_zh_gaz 2.0 gaz 8 Chinese \
  > /tmp/crf_r6_zh.out 2> /tmp/crf_r6_zh.err
cp /tmp/crf_r6_zh_gaz/log.jsonl BENCH/crf_zh_gazmask_r6.log.jsonl
