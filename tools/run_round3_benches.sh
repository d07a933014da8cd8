#!/bin/bash
# Round-3 measurement session: run every new evidence bench on an idle
# box, capturing outputs under BENCH/. Refuses to start above load 2.
set -u
cd "$(dirname "$0")/.."
LOAD=$(cut -d' ' -f1 /proc/loadavg)
if python -c "import sys; sys.exit(0 if float('$LOAD') > 2.0 else 1)"; then
  echo "load $LOAD too high -- wait for idle box" >&2
  exit 1
fi
set -x
python tools/bench_ann.py /root/testdata/sf0.1 16 \
  > BENCH/ann_sweep.jsonl 2> BENCH/ann_sweep.md
python tools/bench_streaming.py 50000 10 32 \
  > BENCH/streaming_steady.jsonl 2> /tmp/bench_streaming.err
python tools/bench_crossover.py 1000000,4000000,8000000 100000 32 \
  > BENCH/crossover.jsonl 2> /tmp/bench_crossover.err
python bench.py > /tmp/bench_r3_local.json 2> /tmp/bench_r3_local.err
tail -1 /tmp/bench_r3_local.json
