#!/bin/bash
# Steal-gated bench launcher: probe /proc/stat steal for 60s; launch
# bench.py only when the rate is under 0.15 cpu-sec/s AND no other
# Spark/bench work holds /tmp/claude_busy. Retries up to N times.
# (Recipe from round 9: calm windows are the only way BENCH_CALM.json
# refreshes; storms only update the informational BENCH_DETAIL.)
set -u
TRIES=${1:-12}
for i in $(seq 1 "$TRIES"); do
  if [ -e /tmp/claude_busy ]; then echo "[$i] busy-lock present; wait 120s"; sleep 120; continue; fi
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 60
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  rate=$(python3 -c "print(($s1-$s0)/100/60)")
  ok=$(python3 -c "print(1 if $rate < 0.15 else 0)")
  echo "[$i] steal rate $rate cpu-sec/s"
  if [ "$ok" = "1" ]; then
    if [ -e /tmp/claude_busy ]; then continue; fi
    touch /tmp/claude_busy
    echo "[$i] calm - launching bench"
    python bench.py > /tmp/bench_calm_attempt.out 2>/tmp/bench_calm_attempt.err
    rc=$?
    rm -f /tmp/claude_busy
    steal=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.json')).get('host_steal_sec'))")
    echo "[$i] bench rc=$rc run steal=${steal}s"
    calm=$(python3 -c "import json,os;d=json.load(open('BENCH_CALM.json')) if os.path.exists('BENCH_CALM.json') else {};print(d.get('host_steal_sec','none'))")
    echo "[$i] BENCH_CALM steal=$calm"
    if python3 -c "import json,sys;import bench;d=json.load(open('BENCH_CALM.json'));sys.exit(0 if d.get('sources_sha')==bench.bench_sources_sha() else 1)" 2>/dev/null; then
      echo "CALM ARTIFACT FRESH - done"; exit 0
    fi
  else
    sleep 180
  fi
done
echo "no calm window found in $TRIES tries"
exit 1
