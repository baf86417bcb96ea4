#!/bin/bash
# Pinned-protocol A/B: {r3 code 5736f9c, r5 code} x {tile 128, 256}
# identical env, 3 internal reps per invocation, interleaved order.
set -u
run() {  # label dir tile cycle
  local label=$1 dir=$2 tile=$3 cyc=$4
  echo "=== $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) $label tile=$tile cycle=$cyc"
  (cd "$dir" && SPARK_GRAFT_TILE=$tile SPARK_GRAFT_TELEMETRY=0 SPARK_GRAFT_REPS=3 \
     python bench.py 2>/dev/null | tail -1 > /tmp/ab/${label}_t${tile}_c${cyc}.json)
  echo "    done $(date +%T)"
}
for cyc in 1 2; do
  run r3 /root/repo/.ab_r3 128 $cyc
  run r5 /root/repo     128 $cyc
  run r3 /root/repo/.ab_r3 256 $cyc
  run r5 /root/repo     256 $cyc
done
echo ALL_DONE
