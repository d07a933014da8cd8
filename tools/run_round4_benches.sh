#!/bin/bash
# Round-4 measurement session: the verdict's evidence items on an idle
# box, outputs under BENCH/. Waits (up to ~3h) for any running CRF
# training job to drain before starting so no artifact is load-polluted.
set -u
cd "$(dirname "$0")/.."

for _ in $(seq 1 1080); do
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
# item 4: deliberate-skew salting stress (2M turns, half in one conv)
python tools/bench_skew.py 2000000 4096 64 \
  > BENCH/skew.jsonl 2> /tmp/bench_skew.err
# item 5: planes_for_corpus at 1M vectors (clustered synthetic corpus)
# stderr to /tmp like every other step -- redirecting it into a .md
# committed 34KB of Spark progress bars in round 4 (ADVICE)
python tools/bench_ann.py synth:1000000 16 \
  > BENCH/ann_sweep_1m.jsonl 2> /tmp/bench_ann_1m.err
# item 8: 32-batch streaming soak (state growth vs ingested volume)
python tools/bench_streaming.py 50000 32 32 \
  > BENCH/streaming_soak_32.jsonl 2> /tmp/bench_streaming32.err
# round artifact preview: full bench with the new crf_decode_fused row
python bench.py > /tmp/bench_r4_local.json 2> /tmp/bench_r4_local.err
tail -1 /tmp/bench_r4_local.json
