#!/bin/bash
# Round-5 measurement session: the remaining verdict items on an idle
# box, outputs under BENCH/. Waits (up to ~4h) for the running CRF
# quality training to drain before starting so no artifact is
# load-polluted. All stderr goes to /tmp (round-4 lesson).
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
LOAD=$(cut -d' ' -f1 /proc/loadavg)
if python -c "import sys; sys.exit(0 if float('$LOAD') > 2.0 else 1)"; then
  echo "box never went idle (load $LOAD) -- aborting" >&2
  exit 1
fi

set -x
# verdict item 6: the full 32-batch streaming soak on an idle box
python tools/bench_streaming.py 50000 32 32 \
  > BENCH/streaming_soak_32_r5.jsonl 2> /tmp/bench_streaming32_r5.err
# verdict item 7: CRF fused-decode scaling at 2/8/32 cores (200k turns
# keeps the 2-core leg ~10 min at ~1.2k tok/s/core); spark-submit
# --py-files launcher = the north-rule deployment path (same as the
# HMM scaling artifact)
python tools/bench_scaling.py 200000 --crf \
  > BENCH/scaling_crf.jsonl 2> /tmp/bench_scaling_crf.err
# round-5 bench artifact on the same idle window
python bench.py > /tmp/bench_r5_final.json 2> /tmp/bench_r5_final.err
tail -1 /tmp/bench_r5_final.json
