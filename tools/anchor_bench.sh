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
# Band provenance (round 17). The anchor band lives in
# tools/ANCHOR_BAND.json (lo/hi + date + sha + the evidence values),
# read at launch; ANCHOR_BAND_LO/HI env still override for one-off
# experiments. `tools/anchor_bench.sh --reanchor [N]` re-anchors it on
# the record: it takes the N (default 5) most recent comparable
# numeric-value history lines at HEAD in one (cpus, sf) family, writes
# [floor(min)-1, ceil(max)+1] (the same reading margin the original
# 49-55 band put around ~50-54) plus full evidence into the band file,
# and appends a provenance line to README — so on a persistently
# slower host the cohort fallback stops silently starving on a stale
# band, and every band's origin is auditable.
#
# Exit codes: 0 = anchored (strict warm-in-band, or cohort);
# 3 = strict-accepted but the warm repeat is OUTSIDE the band (a valid
# anchor of a diffusely degraded host — automation must not record it
# as a normal anchor); 2 = gave up / refused.
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
# Cohort fallback knobs (see header). Band resolution: env override >
# tools/ANCHOR_BAND.json (written by --reanchor, carries provenance) >
# builtin 49/55 fallback (the original round-13..16 ~50-54 s record).
COHORT_N="${ANCHOR_COHORT_N:-5}"
# script-relative, not cwd-relative: the cd above normally lands at the
# repo root, but the band must resolve even if this file is invoked in a
# context where that cd is skipped/removed — a silently ignored
# re-anchored band falls back to the builtin 49/55 with no error
BAND_FILE="${ANCHOR_BAND_FILE:-$(dirname "$SELF")/ANCHOR_BAND.json}"
band_from_file() { # <key> <fallback>
  python3 - "$BAND_FILE" "$1" "$2" <<'EOF'
import json, sys
try:
    v = json.load(open(sys.argv[1]))[sys.argv[2]]
    print(v if isinstance(v, (int, float)) and not isinstance(v, bool)
          else sys.argv[3])
except Exception:
    print(sys.argv[3])
EOF
}
BAND_LO="${ANCHOR_BAND_LO:-$(band_from_file lo 49)}"
BAND_HI="${ANCHOR_BAND_HI:-$(band_from_file hi 55)}"
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
# bool is an int subclass: a pathological "value": true must take the
# values-unknown path, not be band-checked as 1.0
def num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)
if all(num(v) for v in vals):
    # Per-value tags, verdict on the WARM repeat (last line / jvm_run 2)
    # only: cold jvm_run-1 reads 59-61 s at clean steal on a healthy
    # host (benign JIT/page-cache warm-up — README round-16 note), so
    # requiring ALL values in band would stamp a valid cold-out/warm-in
    # anchor with the degraded-host caution.
    tagged = " ".join(
        "{}({})".format(round(v, 1), "in" if band_lo <= v <= band_hi
                        else "out") for v in vals)
    tag = ("IN-BAND" if band_lo <= vals[-1] <= band_hi else "OUT-OF-BAND")
    print("OK", ds, "values", tagged,
          f"warm {tag} [{band_lo}, {band_hi}]")
else:
    print("OK", ds, "values unknown (no numeric `value` field)")
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
def num(v):  # bool is an int subclass — never band-check True as 1.0
    return isinstance(v, (int, float)) and not isinstance(v, bool)
ok = [d for d in rows
      if (sha == "unknown" or d.get("sha") in (sha, "unknown"))
      and comparable(d)
      and num(d.get("value")) and lo <= d["value"] <= hi]
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
          echo "CAUTION: strict anchor's WARM repeat is OUTSIDE the documented band — diffuse host degradation suspected; since round 20 the line itself carries the classification (band_verdict: diffuse = environmental/re-base, concentrated = suspect the plans), and tools/bench_history.py renders it — confirm there (or via --compare --band <band-sha> <this-ts> for an ad-hoc cohort), and if the host has genuinely re-based, tools/anchor_bench.sh --reanchor"
          # distinct success code: accepted, but automation keying off
          # the exit status must be able to tell a degraded-host anchor
          # from a normal one (3 = anchored-out-of-band)
          exit 3;;
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

# --reanchor [N]: re-base the documented band on the record. Takes the
# N (default 5) most recent comparable numeric-value history lines at
# HEAD belonging to ONE (cpus, sf) family — the family of the most
# recent qualifying line — writes [floor(min)-1, ceil(max)+1] plus the
# full evidence (date, sha, values, cpus, sf) into $BAND_FILE, and
# appends a provenance line to README so the band's origin chain stays
# auditable. Refuses (exit 2) when the family holds fewer than N
# qualifying lines: a band must rest on repeated in-family evidence,
# never on a mixed-configuration grab bag.
if [ "${1:-}" = "--reanchor" ]; then
  python3 - "${2:-5}" "$(head_sha)" "$HIST" "$BAND_FILE" \
      "${ANCHOR_README_FILE:-README.md}" <<'EOF'
import datetime, json, math, sys
need, sha, hist, band_file, readme = (int(sys.argv[1]), sys.argv[2],
                                      sys.argv[3], sys.argv[4], sys.argv[5])
try:
    rows = [json.loads(l) for l in open(hist) if l.strip()]
except FileNotFoundError:
    sys.exit(f"REFUSED: no history at {hist}")
def num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)
def cpus(d):
    try:
        return int(d.get("cpus"))
    except (TypeError, ValueError):
        return None
def comparable(d):  # same rule as the cohort acceptance
    if isinstance(d.get("noncomparable"), bool):
        return not d["noncomparable"]
    try:
        return d["load_end"]["steal_ticks"] - d["load_start"]["steal_ticks"] <= 400
    except Exception:
        return False
ok = [d for d in rows
      if (sha == "unknown" or d.get("sha") == sha)
      and comparable(d) and num(d.get("value"))]
if not ok:
    sys.exit(f"REFUSED: no comparable numeric-value lines at HEAD {sha[:8]}")
fam = (cpus(ok[-1]), ok[-1].get("sf_num"))
if fam[0] is None or not num(fam[1]):
    sys.exit("REFUSED: the most recent qualifying line carries no "
             f"(cpus, sf_num) to define a family: {fam}")
fam_ok = [d for d in ok if (cpus(d), d.get("sf_num")) == fam]
if len(fam_ok) < need:
    sys.exit(f"REFUSED: only {len(fam_ok)} comparable lines in the "
             f"({fam[0]} cpus, sf {fam[1]}) family at HEAD {sha[:8]} "
             f"(need {need})")
vals = [d["value"] for d in fam_ok[-need:]]
# same reading margin the original 49-55 band put around ~50-54
lo, hi = math.floor(min(vals)) - 1, math.ceil(max(vals)) + 1
today = datetime.date.today().isoformat()
band = {"lo": lo, "hi": hi, "anchored": today, "sha": sha, "n": need,
        "cpus": fam[0], "sf_num": fam[1],
        "values": [round(v, 1) for v in vals],
        "source": f"tools/anchor_bench.sh --reanchor {need}"}
with open(band_file, "w") as f:
    json.dump(band, f, indent=1)
    f.write("\n")
line = (f"- {today}: band re-anchored to [{lo}, {hi}] s from the last "
        f"{need} comparable runs at {sha[:8]} ({fam[0]} cpus, sf "
        f"{fam[1]}): {band['values']} (`tools/anchor_bench.sh "
        f"--reanchor {need}`)")
try:
    text = open(readme).read()
except FileNotFoundError:
    text = ""
head = "## Anchor band provenance"
if head not in text:
    text = text.rstrip("\n") + f"\n\n{head}\n\n" if text else f"{head}\n\n"
else:
    text = text.rstrip("\n") + "\n"
with open(readme, "w") as f:
    f.write(text + line + "\n")
print(f"RE-ANCHORED [{lo}, {hi}] from {band['values']} @ {sha[:8]} "
      f"({fam[0]} cpus, sf {fam[1]}) -> {band_file}; provenance "
      f"appended to {readme}")
EOF
  exit $?
fi

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
    # band pinned to the classic 49-55 so the cases below stay
    # deterministic after any real --reanchor rewrites the band file
    ANCHOR_BAND_LO=49 ANCHOR_BAND_HI=55 \
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

  # band position rides on strict acceptance, adjudicated on the WARM
  # repeat: in-band accepts quietly at 0; a warm repeat outside the
  # band accepts WITH the degraded-host caution at the distinct exit 3
  # (the 2026-08-14 case: strict anchor at 56.4/57.1s vs band 49-55)
  rc=$(run_case "$t/o8a" "printf '{\"sha\":\"%s\",\"steal_delta\":3,\"value\":52.0}\n' '$sha' '$sha' >> '$H'")
  check "strict in-band acceptance carries no caution" 0 "$rc" "$t/o8a" \
    "IN-BAND" "CAUTION"

  rc=$(run_case "$t/o8b" "printf '{\"sha\":\"%s\",\"steal_delta\":3,\"value\":60.0}\n' '$sha' '$sha' >> '$H'")
  check "strict warm-out-of-band acceptance cautions and exits 3" 3 "$rc" "$t/o8b" \
    "CAUTION: strict anchor's WARM repeat is OUTSIDE" "warm IN-BAND"

  # cold jvm_run-1 elevation (59-61s at clean steal on a healthy host)
  # with the warm repeat back in band is a VALID normal anchor — the
  # per-value tags show the cold outlier, but no caution, exit 0
  rc=$(run_case "$t/o8c" "printf '{\"sha\":\"%s\",\"steal_delta\":3,\"value\":59.4}\n{\"sha\":\"%s\",\"steal_delta\":3,\"value\":53.5}\n' '$sha' '$sha' >> '$H'")
  check "cold-out/warm-in pair is a normal in-band anchor" 0 "$rc" "$t/o8c" \
    "59.4(out) 53.5(in) warm IN-BAND" "CAUTION"

  # JSON booleans are int subclasses in python — a pathological
  # "value": true must take the values-unknown path, not band-check as 1.0
  rc=$(run_case "$t/o8d" "printf '{\"sha\":\"%s\",\"steal_delta\":3,\"value\":true}\n' '$sha' '$sha' >> '$H'")
  check "boolean value takes the values-unknown path" 0 "$rc" "$t/o8d" \
    "values unknown" "BAND"

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

  # --reanchor: re-base the band from the last N in-family comparable
  # lines at HEAD, write the band file + README provenance, and from
  # then on acceptance follows the NEW band (no env override needed)
  H2="$t/hist2.jsonl"
  for v in 59.8 60.2 61.0 60.5 59.9; do
    printf '{"sha":"%s","steal_delta":10,"noncomparable":false,"value":%s,"cpus":32,"sf_num":0.1}\n' "$sha" "$v" >> "$H2"
  done
  ANCHOR_HISTORY_FILE="$H2" ANCHOR_BAND_FILE="$t/band.json" \
    ANCHOR_README_FILE="$t/readme.md" "$SELF" --reanchor 5 > "$t/o13" 2>&1
  rc13=$?
  if [ "$rc13" -ne 0 ] || ! grep -q "RE-ANCHORED \[58, 62\]" "$t/o13" \
      || ! grep -q "band re-anchored to \[58, 62\]" "$t/readme.md" \
      || ! grep -q '"lo": 58' "$t/band.json"; then
    echo "FAIL: reanchor writes band+README (rc=$rc13)"; sed 's/^/    /' "$t/o13"; fail=1
  else
    echo "ok: reanchor writes band [58, 62] + README provenance"
  fi

  # accept-under-new-band: a 60.0 pair that was OUT-OF-BAND under 49-55
  # is a quiet exit-0 IN-BAND anchor under the re-anchored 58-62
  rc=$(ANCHOR_BAND_FILE="$t/band.json" ANCHOR_HISTORY_FILE="$H" \
    ANCHOR_WINDOW_SECS=0 ANCHOR_MAX_ATTEMPTS=2 ANCHOR_MAX_WINDOWS=4 \
    ANCHOR_BENCH_CMD="printf '{\"sha\":\"%s\",\"steal_delta\":3,\"value\":60.0}\n' '$sha' '$sha' >> '$H'" \
    "$SELF" > "$t/o14" 2>&1; echo $?)
  check "acceptance follows the re-anchored band file" 0 "$rc" "$t/o14" \
    "warm IN-BAND \[58.0, 62.0\]" "CAUTION"

  # mixed-family protection: when the most recent qualifying line is an
  # 8-cpu/sf0.001 smoke, its family (1 line) governs and --reanchor
  # refuses rather than folding smoke values into a canonical band
  printf '{"sha":"%s","steal_delta":10,"noncomparable":false,"value":31.0,"cpus":8,"sf_num":0.001}\n' "$sha" >> "$H2"
  ANCHOR_HISTORY_FILE="$H2" ANCHOR_BAND_FILE="$t/band2.json" \
    ANCHOR_README_FILE="$t/readme2.md" "$SELF" --reanchor 5 > "$t/o15" 2>&1
  rc15=$?
  if [ "$rc15" -eq 0 ] || ! grep -q "REFUSED: only 1 comparable lines in the (8 cpus, sf 0.001) family" "$t/o15" \
      || [ -f "$t/band2.json" ]; then
    echo "FAIL: reanchor mixed-family refusal (rc=$rc15)"; sed 's/^/    /' "$t/o15"; fail=1
  else
    echo "ok: reanchor refuses a too-small family instead of mixing configs"
  fi

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
