#!/bin/bash
# Covariate-clean bench anchor protocol (round 14, proven in-session).
#
# Polls the cumulative steal-tick counter (/proc/stat aggregate cpu
# line, field 8) in 2-minute windows and launches
# `runMain graft.Bench <sfDir> --repeat 2` only when the window's
# delta is under QUIET_TICKS — i.e. the hypervisor is not currently
# running other tenants against this VM. After each attempt it accepts
# only if BOTH fresh BENCH_HISTORY.jsonl lines carry a steal delta
# <= CLEAN_TICKS (the adjudication bar: tools/bench_history.py flags
# rows above 400 as non-comparable; an anchor should be far cleaner).
# Steal can resume MID-run — that is why acceptance re-reads the run's
# own recorded covariates instead of trusting the launch window. The
# 2026-08-13 anchor session needed exactly that: attempt 1's repeats
# read 66.4s @ d780 then 53.2s @ d30 in one JVM, and attempt 2 landed
# clean (53.6s @ d38, 52.4s @ d55).
#
# Usage: tools/anchor_bench.sh [sfDir]   (default /root/testdata/sf0.1)
# Keep the machine otherwise idle: your own load does not create steal,
# but it does land in the loadavg covariate and in the timings.
set -u
cd "$(dirname "$0")/.." || exit 1
SF_DIR="${1:-/root/testdata/sf0.1}"
QUIET_TICKS=30   # per 2-minute sample window (~0.25 stolen core-sec/min)
CLEAN_TICKS=100  # per recorded run (the VERDICT bar for an anchor)
MAX_ATTEMPTS=4

attempts=0
while [ "$attempts" -lt "$MAX_ATTEMPTS" ]; do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 120
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  echo "$(date -u +%FT%TZ) 2min steal delta: $d"
  if [ "$d" -lt "$QUIET_TICKS" ]; then
    attempts=$((attempts + 1))
    echo "$(date -u +%FT%TZ) quiet window; bench attempt $attempts"
    SPARK_GRAFT_SF_DIR="$SF_DIR" \
      sbt -batch "runMain graft.Bench $SF_DIR --repeat 2" \
      > "/tmp/anchor_bench_attempt$attempts.log" 2>&1
    ok=$(python3 - "$CLEAN_TICKS" <<'EOF'
import json, sys
bar = int(sys.argv[1])
lines = [json.loads(l) for l in open("BENCH_HISTORY.jsonl") if l.strip()]
def delta(d):
    try:
        return d["load_end"]["steal_ticks"] - d["load_start"]["steal_ticks"]
    except Exception:
        return 10**9
ds = [delta(d) for d in lines[-2:]]
print("OK" if len(ds) == 2 and all(x <= bar for x in ds) else "DIRTY", ds)
EOF
)
    echo "$(date -u +%FT%TZ) attempt $attempts result: $ok"
    case "$ok" in OK*) echo DONE; exit 0;; esac
  fi
done
echo "GAVE UP after $attempts bench attempts"
exit 2
