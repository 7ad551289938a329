#!/bin/bash
# Wait for the co-tenant storm to pass (1-min load average below threshold),
# then run the frozen bench.py at sf1.0 and sf0.1 for the round record.
set -u
OUT_DIR=/root/repo
THRESH=${THRESH:-4.0}
for i in $(seq 1 40); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  OK=$(python -c "print(1 if float('$LOAD') < $THRESH else 0)")
  if [ "$OK" = "1" ]; then
    echo "quiet at $(date): load $LOAD (attempt $i)"
    break
  fi
  echo "stormy at $(date): load $LOAD; sleeping 120s (attempt $i)"
  sleep 120
done
cd /root/repo
run_bench() {  # $1 = sf dir, $2 = output file; only overwrite on a valid JSON line
  local tmp
  tmp=$(mktemp)
  if SPARK_GRAFT_SF_DIR="$1" python bench.py 2>/tmp/bench_stderr.log | tail -1 > "$tmp" \
     && python -c "import json,sys; json.load(open(sys.argv[1]))" "$tmp"; then
    mv "$tmp" "$2"; cat "$2"
  else
    echo "bench FAILED for $1 — keeping previous $2 (stderr in /tmp/bench_stderr.log)"
    rm -f "$tmp"; return 1
  fi
}
echo "=== bench sf1.0 ==="
BENCH_REPEATS=3 BENCH_QUERY_REPEATS=2 run_bench /root/testdata/sf1.0 "$OUT_DIR/BENCH_after_r06_sf1.json"
echo "=== bench sf0.1 ==="
run_bench /root/testdata/sf0.1 "$OUT_DIR/BENCH_after_r06_sf01.json"
echo "done at $(date), load $(cut -d' ' -f1 /proc/loadavg)"
