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
echo "=== bench sf1.0 ==="
BENCH_REPEATS=3 BENCH_QUERY_REPEATS=2 SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 \
  python bench.py 2>/dev/null | tail -1 | tee "$OUT_DIR/BENCH_after_r06_sf1.json"
echo "=== bench sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  python bench.py 2>/dev/null | tail -1 | tee "$OUT_DIR/BENCH_after_r06_sf01.json"
echo "done at $(date), load $(cut -d' ' -f1 /proc/loadavg)"
