#!/bin/bash
# N fresh full-suite bench runs at sf0.1, one JSON line each, for
# tools/bench_merge.py. Usage: tools/bench_runs.sh N OUTDIR
# Runs are SEQUENTIAL on an otherwise-idle box — concurrent load is the
# r14/r15 drift lesson; load_avg is recorded per run inside the JSON.
set -u
N=${1:-12}
OUT=${2:-/tmp/bench_r16}
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | tail -1 > "$OUT/run_$i.json"
  echo "run $i: $(python3 -c "import json,sys;d=json.load(open('$OUT/run_$i.json'));print(round(d['value'],1),'s, load',d.get('load_avg'))" 2>/dev/null || echo FAILED)"
done
