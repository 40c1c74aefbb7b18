#!/bin/bash
# Covariate-clean bench anchor protocol (round 14, proven in-session;
# acceptance hardened round 15).
#
# Polls the cumulative steal-tick counter (/proc/stat aggregate cpu
# line, field 8) in 2-minute windows and launches
# `runMain graft.Bench <sfDir> --repeat 2` only when the window's
# delta is under QUIET_TICKS — i.e. the hypervisor is not currently
# running other tenants against this VM. After each attempt it accepts
# only if the attempt's OWN two fresh BENCH_HISTORY.jsonl lines carry
# a steal delta <= CLEAN_TICKS (the adjudication bar:
# tools/bench_history.py flags rows above 400 as non-comparable; an
# anchor should be far cleaner). Steal can resume MID-run — that is
# why acceptance re-reads the run's own recorded covariates instead of
# trusting the launch window. The 2026-08-13 anchor session needed
# exactly that: attempt 1's repeats read 66.4s @ d780 then 53.2s @ d30
# in one JVM, and attempt 2 landed clean (53.6s @ d38, 52.4s @ d55).
#
# Acceptance provenance (round 15): Bench's history append is
# best-effort (exceptions swallowed) and sbt can fail outright, so
# blindly adjudicating the file's last two lines could bless STALE
# clean lines from a previous run as a fresh anchor. The check now
# requires (a) the bench process exited 0, (b) EXACTLY two history
# lines appended by this attempt (line count snapshotted before
# launch), and (c) those lines' recorded git sha to match HEAD.
# Run `tools/anchor_bench.sh --selftest` to exercise all of it with
# stub bench commands (no sbt, no sleeps).
#
# Two-tier acceptance (round 16). The strict rule above ("one attempt
# whose own two repeats are both <= CLEAN_TICKS") is the primary path,
# but round 15 showed it can starve on a host that is never quite that
# quiet: 4 attempts over 27 windows, best pair d147/d71, and the anchor
# stood only via a hand-written README argument over ten comparable
# runs. That argument is now encoded as the COHORT fallback: accept
# when >= ANCHOR_COHORT_N (default 5) history lines appended DURING
# THIS SESSION at the current HEAD sha are self-adjudicated comparable
# (noncomparable: false, i.e. steal delta <= 400 by the
# tools/bench_history.py calibration) AND land inside the documented
# anchor band [ANCHOR_BAND_LO, ANCHOR_BAND_HI] (default 49-55 s, the
# README's ~50-54 s band with reading margin; override when the band is
# re-anchored). The session scoping (line count snapshotted at launch)
# keeps stale lines out, the sha check keeps foreign code out, and the
# output names which rule fired — "DONE (strict ...)" vs
# "DONE (cohort ...)" — so the provenance of every anchor is explicit.
#
# Cohort arithmetic on a cold-boot host (observed 2026-08-14): a fresh
# VM's jvm_run-1 lines can read 59-61 s at CLEAN steal — out of band —
# while the warm jvm_run-2 returns to band. At the defaults
# (ANCHOR_MAX_ATTEMPTS=4, two lines per attempt, only warm lines
# qualifying) the cohort can top out at 4 < ANCHOR_COHORT_N=5 and
# mathematically never fire. If strict acceptance is also starving,
# raise ANCHOR_MAX_ATTEMPTS (and ANCHOR_MAX_WINDOWS) so warm lines can
# accumulate; do NOT widen the band to admit cold lines — a cold-repeat
# headline is not anchor evidence (README, round-16 note).
#
# Usage: tools/anchor_bench.sh [sfDir]   (default /root/testdata/sf0.1)
# Keep the machine otherwise idle: your own load does not create steal,
# but it does land in the loadavg covariate and in the timings.
set -u
SELF="$(cd "$(dirname "$0")" && pwd)/$(basename "$0")"
cd "$(dirname "$0")/.." || exit 1
SF_DIR="${1:-/root/testdata/sf0.1}"
# per sample window (~0.25 stolen core-sec/min at 120s); overridable so
# the selftest can force the never-quiet path without faking /proc/stat
QUIET_TICKS="${ANCHOR_QUIET_TICKS:-30}"
CLEAN_TICKS=100  # per recorded run (the VERDICT bar for an anchor)
# Cohort fallback knobs (see header). Band defaults track the README's
# documented ~50-54 s anchor band with ~1 s reading margin on each side.
COHORT_N="${ANCHOR_COHORT_N:-5}"
BAND_LO="${ANCHOR_BAND_LO:-49}"
BAND_HI="${ANCHOR_BAND_HI:-55}"
# Env-overridable so the selftest can run the real loop fast with stub
# commands; production runs use the defaults.
MAX_ATTEMPTS="${ANCHOR_MAX_ATTEMPTS:-4}"
MAX_WINDOWS="${ANCHOR_MAX_WINDOWS:-30}"  # bound total polls (~1h at 120s):
                                         # a persistently noisy host must
                                         # terminate at exit 2, not poll forever
WINDOW_SECS="${ANCHOR_WINDOW_SECS:-120}"
HIST="${ANCHOR_HISTORY_FILE:-BENCH_HISTORY.jsonl}"

hist_lines() { if [ -f "$HIST" ]; then wc -l < "$HIST"; else echo 0; fi; }

head_sha() { git rev-parse HEAD 2>/dev/null || echo unknown; }

run_bench() {
  if [ -n "${ANCHOR_BENCH_CMD:-}" ]; then
    bash -c "$ANCHOR_BENCH_CMD"
  else
    SPARK_GRAFT_SF_DIR="$SF_DIR" \
      sbt -batch "runMain graft.Bench $SF_DIR --repeat 2"
  fi
}

# accept <lines-before-attempt>: OK only when exactly 2 new lines were
# appended by this attempt, their sha matches HEAD, and both carry a
# clean steal delta. Prints OK/STALE/DIRTY plus the evidence, and on OK
# also where the values sit relative to the documented band: a strict
# acceptance is deliberately band-blind (it anchors wherever the host
# is), but an OUT-OF-BAND strict anchor means the host is diffusely
# degraded (2026-08-14: repeats at d76/d33 read 56.4/57.1s against the
# 49-55 band, --compare DIFFUSE median 1.13x) — flag it so nobody
# mistakes a degraded-host anchor for a re-anchored band.
accept() {
  python3 - "$CLEAN_TICKS" "$1" "$(head_sha)" "$HIST" "$BAND_LO" "$BAND_HI" <<'EOF'
import json, sys
bar, n0, sha, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
band_lo, band_hi = float(sys.argv[5]), float(sys.argv[6])
try:
    raw = open(path).read().splitlines()
except FileNotFoundError:
    raw = []
new = [json.loads(l) for l in raw[n0:] if l.strip()]
if len(new) != 2:
    print("STALE expected exactly 2 new history lines, got", len(new)); sys.exit()
# "unknown" on either side (no .git, detached oddity) skips the sha
# check rather than failing it — the line-count check already proved
# the lines are fresh; sha is the belt on those braces.
bad = [d.get("sha", "?") for d in new
       if sha != "unknown" and d.get("sha") not in (sha, "unknown")]
if bad:
    print("STALE sha mismatch vs HEAD", sha[:8] + ":", [s[:8] for s in bad]); sys.exit()
def delta(d):
    if isinstance(d.get("steal_delta"), int):   # round-15+ self-adjudicating line
        return d["steal_delta"]
    try:
        return d["load_end"]["steal_ticks"] - d["load_start"]["steal_ticks"]
    except Exception:
        return 10**9
ds = [delta(d) for d in new]
if not all(x <= bar for x in ds):
    print("DIRTY", ds); sys.exit()
vals = [d.get("value") for d in new]
if all(isinstance(v, (int, float)) for v in vals):
    tag = ("IN-BAND" if all(band_lo <= v <= band_hi for v in vals)
           else "OUT-OF-BAND")
    print("OK", ds, "values", [round(v, 1) for v in vals],
          f"{tag} [{band_lo}, {band_hi}]")
else:
    print("OK", ds, "values unknown (no `value` field)")
EOF
}

# cohort <session-start-line-count>: the fallback acceptance. Counts
# lines appended since script launch whose sha matches HEAD, that are
# self-adjudicated comparable, and whose total lands inside the band.
# Prints "COHORT ..." when >= COHORT_N qualify, else "NOCOHORT ...".
cohort() {
  python3 - "$COHORT_N" "$BAND_LO" "$BAND_HI" "$1" "$(head_sha)" "$HIST" <<'EOF'
import json, sys
need = int(sys.argv[1]); lo, hi = float(sys.argv[2]), float(sys.argv[3])
n0, sha, path = int(sys.argv[4]), sys.argv[5], sys.argv[6]
try:
    raw = open(path).read().splitlines()
except FileNotFoundError:
    raw = []
rows = [json.loads(l) for l in raw[n0:] if l.strip()]
def comparable(d):
    if "noncomparable" in d:            # round-15+ self-adjudicating line
        return d["noncomparable"] is False
    try:                                 # pre-round-15 shape: same 400-tick
        return d["load_end"]["steal_ticks"] - d["load_start"]["steal_ticks"] <= 400
    except Exception:
        return False
ok = [d for d in rows
      if (sha == "unknown" or d.get("sha") in (sha, "unknown"))
      and comparable(d)
      and isinstance(d.get("value"), (int, float)) and lo <= d["value"] <= hi]
vals = [round(d["value"], 1) for d in ok]
tag = "COHORT" if len(ok) >= need else "NOCOHORT"
print(f"{tag} {len(ok)}/{need} comparable in-band session lines {vals} (band [{lo}, {hi}], sha {sha[:8]})")
EOF
}

main() {
  attempts=0
  windows=0
  n_session=$(hist_lines)
  while [ "$attempts" -lt "$MAX_ATTEMPTS" ] && [ "$windows" -lt "$MAX_WINDOWS" ]; do
    windows=$((windows + 1))
    s0=$(awk '/^cpu /{print $9}' /proc/stat)
    sleep "$WINDOW_SECS"
    s1=$(awk '/^cpu /{print $9}' /proc/stat)
    d=$((s1 - s0))
    echo "$(date -u +%FT%TZ) ${WINDOW_SECS}s steal delta: $d (window $windows/$MAX_WINDOWS)"
    if [ "$d" -lt "$QUIET_TICKS" ]; then
      attempts=$((attempts + 1))
      n0=$(hist_lines)
      echo "$(date -u +%FT%TZ) quiet window; bench attempt $attempts ($n0 history lines)"
      run_bench > "/tmp/anchor_bench_attempt$attempts.log" 2>&1
      rc=$?
      if [ "$rc" -ne 0 ]; then
        echo "$(date -u +%FT%TZ) attempt $attempts: bench exited $rc — not adjudicated (log kept)"
        continue
      fi
      ok=$(accept "$n0")
      echo "$(date -u +%FT%TZ) attempt $attempts result: $ok"
      case "$ok" in OK*)
        echo "DONE (strict: one attempt, both repeats <= $CLEAN_TICKS ticks)"
        case "$ok" in *OUT-OF-BAND*)
          echo "CAUTION: strict anchor values are OUTSIDE the documented band — diffuse host degradation suspected; run tools/bench_history.py --compare --band <last-good-sha> <this-ts> before treating these values as a re-anchored band";;
        esac
        exit 0;;
      esac
      co=$(cohort "$n_session")
      echo "$(date -u +%FT%TZ) cohort check: $co"
      case "$co" in COHORT*)
        echo "DONE (cohort: >=$COHORT_N comparable in-band lines this session)"; exit 0;;
      esac
    fi
  done
  echo "GAVE UP after $attempts bench attempts / $windows windows"
  exit 2
}

# --selftest: run the REAL loop against a temp history file with stub
# bench commands. Each scenario asserts both the exit code and the
# verdict line, so the stale-acceptance hole this protects against
# (sbt failure / no append / partial append / foreign sha blessed as
# an anchor) stays closed.
if [ "${1:-}" = "--selftest" ]; then
  t=$(mktemp -d)
  trap 'rm -rf "$t"' EXIT
  H="$t/hist.jsonl"
  sha=$(head_sha)
  fail=0
  check() { # <desc> <want_rc> <got_rc> <outfile> <want_grep> <ban_grep>
    if [ "$3" -ne "$2" ] || ! grep -q "$5" "$4" || grep -q "$6" "$4"; then
      echo "FAIL: $1 (rc=$3 want=$2)"; sed 's/^/    /' "$4"; fail=1
    else
      echo "ok: $1"
    fi
  }
  run_case() { # <outfile> <bench_cmd>
    ANCHOR_HISTORY_FILE="$H" ANCHOR_WINDOW_SECS=0 ANCHOR_MAX_ATTEMPTS=2 \
      ANCHOR_MAX_WINDOWS=4 ANCHOR_BENCH_CMD="$2" "$SELF" > "$1" 2>&1
    echo $?
  }
  # seed: two CLEAN lines from a "previous run" — the bait the old
  # acceptance would have swallowed in every failure scenario below
  printf '{"sha":"%s","steal_delta":0}\n{"sha":"%s","steal_delta":0}\n' \
    "$sha" "$sha" > "$H"

  rc=$(run_case "$t/o1" "exit 1")
  check "failed bench is never adjudicated" 2 "$rc" "$t/o1" "bench exited 1" "DONE"

  rc=$(run_case "$t/o2" "true")
  check "no-append run is STALE, not the seeded clean lines" 2 "$rc" "$t/o2" \
    "STALE expected exactly 2 new history lines, got 0" "DONE"

  rc=$(run_case "$t/o3" "echo '{\"sha\":\"$sha\",\"steal_delta\":1}' >> '$H'")
  check "partial (1-line) append is STALE" 2 "$rc" "$t/o3" \
    "STALE expected exactly 2 new history lines, got 1" "DONE"

  rc=$(run_case "$t/o4" "printf '{\"sha\":\"%s\",\"steal_delta\":2}\n' deadbeef deadbeef >> '$H'")
  check "foreign-sha lines are STALE" 2 "$rc" "$t/o4" "STALE sha mismatch" "DONE"

  rc=$(run_case "$t/o5" "printf '{\"sha\":\"%s\",\"steal_delta\":500}\n' '$sha' '$sha' >> '$H'")
  check "fresh but dirty lines are DIRTY, retried, then given up" 2 "$rc" "$t/o5" \
    "DIRTY \[500, 500\]" "DONE"

  rc=$(run_case "$t/o6" "printf '{\"sha\":\"%s\",\"steal_delta\":3}\n' '$sha' '$sha' >> '$H'")
  check "fresh clean same-sha lines are accepted" 0 "$rc" "$t/o6" "DONE" "STALE"

  # pre-round-15 line shape (covariate endpoints, no steal_delta field)
  rc=$(run_case "$t/o7" "printf '{\"sha\":\"%s\",\"load_start\":{\"steal_ticks\":10},\"load_end\":{\"steal_ticks\":20}}\n' '$sha' '$sha' >> '$H'")
  check "covariate-endpoint lines still adjudicate" 0 "$rc" "$t/o7" "OK \[10, 10\]" "STALE"

  # band position rides on strict acceptance: in-band values accept
  # quietly, out-of-band values accept WITH the degraded-host caution
  # (the 2026-08-14 case: strict anchor at 56.4/57.1s vs band 49-55)
  rc=$(run_case "$t/o8a" "printf '{\"sha\":\"%s\",\"steal_delta\":3,\"value\":52.0}\n' '$sha' '$sha' >> '$H'")
  check "strict in-band acceptance carries no caution" 0 "$rc" "$t/o8a" \
    "IN-BAND" "CAUTION"

  rc=$(run_case "$t/o8b" "printf '{\"sha\":\"%s\",\"steal_delta\":3,\"value\":60.0}\n' '$sha' '$sha' >> '$H'")
  check "strict out-of-band acceptance prints the caution" 0 "$rc" "$t/o8b" \
    "CAUTION: strict anchor values are OUTSIDE" "IN-BAND"

  # cohort fallback: lines too dirty for the strict rule (delta 200 >
  # CLEAN_TICKS) but self-adjudicated comparable and in-band accumulate
  # across attempts to an acceptance that names the cohort rule
  rc=$(ANCHOR_COHORT_N=4 run_case "$t/o9" "printf '{\"sha\":\"%s\",\"steal_delta\":200,\"noncomparable\":false,\"value\":52.0}\n' '$sha' '$sha' >> '$H'")
  check "cohort: comparable in-band lines accumulate to acceptance" 0 "$rc" "$t/o9" \
    "DONE (cohort" "DONE (strict"

  rc=$(ANCHOR_COHORT_N=4 run_case "$t/o10" "printf '{\"sha\":\"%s\",\"steal_delta\":200,\"noncomparable\":false,\"value\":70.0}\n' '$sha' '$sha' >> '$H'")
  check "cohort: out-of-band totals never qualify" 2 "$rc" "$t/o10" \
    "NOCOHORT 0/4" "DONE"

  rc=$(ANCHOR_COHORT_N=4 run_case "$t/o11" "printf '{\"sha\":\"%s\",\"steal_delta\":500,\"noncomparable\":true,\"value\":52.0}\n' '$sha' '$sha' >> '$H'")
  check "cohort: noncomparable lines never qualify even in-band" 2 "$rc" "$t/o11" \
    "NOCOHORT 0/4" "DONE"

  # five fully-qualifying lines seeded BEFORE launch must not count:
  # the cohort is session-scoped by construction
  for _ in 1 2 3 4 5; do
    printf '{"sha":"%s","steal_delta":10,"noncomparable":false,"value":52.0}\n' "$sha" >> "$H"
  done
  rc=$(ANCHOR_COHORT_N=4 run_case "$t/o12" "true")
  check "cohort ignores pre-session lines" 2 "$rc" "$t/o12" "NOCOHORT 0/4" "DONE"

  # a host that is NEVER quiet must terminate at the window bound, not
  # poll forever (QUIET_TICKS=0 makes every window fail the gate)
  ANCHOR_QUIET_TICKS=0 ANCHOR_HISTORY_FILE="$H" ANCHOR_WINDOW_SECS=0 \
    ANCHOR_MAX_ATTEMPTS=2 ANCHOR_MAX_WINDOWS=3 ANCHOR_BENCH_CMD="true" \
    "$SELF" > "$t/o8" 2>&1
  check "never-quiet host stops at MAX_WINDOWS" 2 "$?" "$t/o8" \
    "GAVE UP after 0 bench attempts / 3 windows" "DONE"

  [ "$fail" -eq 0 ] && echo "selftest OK" || { echo "selftest FAILED"; exit 1; }
  exit 0
fi

main
