#!/usr/bin/env python3
"""Readable view of BENCH_HISTORY.jsonl for noise-vs-regression triage.

Usage:
  python3 tools/bench_history.py                 # one summary row per run
  python3 tools/bench_history.py d57_containment # that query across runs
  python3 tools/bench_history.py --suspect-replay # replay every line
      # against its own-time bands (the round-18 suspect rule); prints
      # the flagged lines with covariate state — on the PRE-SHIP
      # history, exactly the r15/r17 d57 incidents as the only clean
      # flags (the calibration claim); flags the live rule has fired
      # since shipping print too, each already adjudicated on its own
      # line (q10 rerun-cleared, q42 refuted by the adjacent line)

Summary columns end with the round-13 machine-load covariates: loadavg
at run start/end (1-minute average) and the start->end steal-tick delta
(hypervisor ran other tenants; 100 ticks = 1 stolen core-second). Read
those before believing any elevation — a nonzero steal delta or a
loadavg far above the worker count is the disturbance on record (see
the d57/d58 notes in DedupQueries.scala for the adjudication rule).
Runs predating round 13 show '-' for fields their lines don't carry.

The trailing `!` column marks a run as NON-COMPARABLE — do not use it
as a cross-round anchor or regression evidence. A run is flagged when
either covariate exceeds its threshold:

  * steal delta > SUSPECT_STEAL_DELTA (400 ticks = 4 stolen
    core-seconds). Calibrated on the round-13 record: headlines stayed
    in the ~58s band up to delta 366 and were visibly elevated at
    delta 564 (70.2s) and delta 1531 (74.2s); 400 splits the observed
    gap between the last clean and first disturbed run.
  * 1-minute loadavg at run start or end > the run's `cpus` (worker
    count): the host owed more runnable threads than the bench had
    workers, so timings include queueing that is not the plan's cost.
    Skipped when the line predates the `cpus` field.

Runs missing the covariates entirely (pre-round-13) print '-' in the
covariate columns, but are still eligible for a SECONDARY flag: the
within-run dispersion of each query's own samples. A catastrophic
disturbance leaves order-of-magnitude swings across the SAME query's
interleaved rounds (the round-14 driver capture read q14 at
56.2/0.36/0.21s — ratio 265 — and d53 at 175.7/4.5/2.4s in one run).
A pre-covariate line is flagged when at least
SUSPECT_DISPERSION_COUNT queries with all samples >=
DISPERSION_MIN_SEC disperse beyond SUSPECT_DISPERSION_RATIO.

The ratio bar is calibrated on the full history: benign first-round
JIT/codegen warm-up reaches 5-9x on a couple of queries in every cold
run, and up to 12.9x when steal was provably high, while the one
catastrophic capture shows four queries at 24.6-264.9x — 20 sits
2x above the worst benign reading and below the catastrophic
cluster. Two limits, disclosed rather than papered over: (a) a
DIFFUSE elevation (round 13's uniform 1.37x geomean at steal 1531)
does not disperse within-run and stays undetectable without
covariates — for that mode, absence of evidence still prints as
absence; (b) warm-up and disturbance are not separable near the bar,
so a mild disturbance confined to round 1 reads as warm-up. Lines
that carry covariates never use this fallback — the covariates are
direct evidence and adjudicate alone.

Round-15 bench lines self-adjudicate: they carry `steal_delta` and a
computed `noncomparable` boolean tail-most in the line itself (and the
covariates under the same load_start/load_end keys the round-13/14
history splice used). When those explicit fields are present they are
read directly; older lines fall back to computing both from the
covariates. `--file PATH` points the tool at a different line file —
e.g. `--file BENCH_FULL.json` adjudicates the most recent run's own
artifact without the history.

`--compare TS1 TS2` (unique ts prefixes) answers the question the
covariates alone cannot: when a run's headline is elevated even though
its steal delta is inside the clean bar, is the elevation DIFFUSE
(roughly uniform across unrelated queries) or CONCENTRATED (a few
specific plans)? Steal ticks only count CPU-scheduling contention — a
neighbor tenant saturating shared memory bandwidth or LLC slows every
query without minting a single steal tick. That mode showed up on
2026-08-13: runs at steal delta 44-91 read ~58-60s against the 52.4s
anchor, with 92% of the 74 queries elevated >5% and the top ratios
spread across unrelated families — shared-resource contention, not a
plan change (no benched plan had changed). A genuine code or plan
regression does the opposite: it moves the specific queries whose
plans changed and leaves the rest at ratio ~1. The classification bars
(>=70% of queries elevated >1.05 = diffuse; any query >=1.5x with a
median <=1.05 = concentrated) are calibrated on that session plus the
round-14 record; queries under 50ms in the BASE run are excluded as
timer noise.

Since round 20 a CLEAN line whose headline lands outside the
documented anchor band carries a `band_verdict` object — the same
--compare --band math (per-query ratios vs the cohort minima of the
comparable lines at the band's anchoring sha) run by the bench at
emit time, with class diffuse/concentrated/comparable and the
below-band side mirroring the bars (diffuse-below = faster than the
anchor cohort ever ran = the re-anchor signal). The summary view
renders it; manual --compare remains for ad-hoc cohort choices.

The base side accepts a COHORT, not just one run: `--compare TS1
[TS2 ...] CAND` uses the per-query minimum across all listed base runs,
and `--compare --band SHA CAND` builds the cohort from every comparable
(non-`!`) run whose sha starts with SHA **and whose (cpus, sf_num)
equal the candidate's** — the history holds 8-cpu/sf0.001 smoke lines
next to canonical 32-cpu/sf0.1 lines, and folding a smoke line's
per-query minima into the base would mint absurd ratios against any
candidate; dropped lines are counted out loud. Explicitly listed base
runs are taken as given (the user picked them), with a WARNING per
covariate mismatch.

The summary view leads with the documented anchor band and its
provenance (tools/ANCHOR_BAND.json, maintained by
`tools/anchor_bench.sh --reanchor`), so any value on screen is read
against the band it would be judged by — not a remembered number. Rationale: a single base run
carries its own jitter — one query reading fast by chance in the base
mints a false CONCENTRATED verdict against a perfectly normal
candidate. The cohort floor is the honest "this code has run this
fast" base; a query still elevated against the minimum of N runs is
elevated against everything the band ever showed (the round-15 d57
case fires either way — 6.4s vs 19 in-band runs — which is exactly
the discrimination wanted).
"""
import json
import sys

# Non-comparable thresholds — rationale in the module docstring above.
SUSPECT_STEAL_DELTA = 400
# Dispersion fallback for pre-covariate lines (docstring above):
# max/min across one query's own samples, floored to skip sub-200ms
# queries whose ratios are timer noise, needing two such queries so a
# single JIT deopt can't flag a whole run.
SUSPECT_DISPERSION_RATIO = 20.0
SUSPECT_DISPERSION_COUNT = 2
DISPERSION_MIN_SEC = 0.2
# Suspect-band thresholds (round 18) — keep in sync with Bench.scala's
# SuspectRatio / SuspectFloorSec / SuspectMinHistory (each side's
# selftest pins its own copy; the calibration sweep that set 1.5 lives
# at the Bench constants and is reproducible via --suspect-replay).
SUSPECT_RATIO = 1.5
SUSPECT_FLOOR_SEC = 0.5
SUSPECT_MIN_HISTORY = 5
# --compare classification bars (rationale in the module docstring):
COMPARE_MIN_SEC = 0.05      # base-run floor; faster queries are timer noise
COMPARE_ELEVATED = 1.05     # a query counts as elevated past this ratio
COMPARE_DIFFUSE_FRAC = 0.7  # fraction elevated => DIFFUSE (environmental)
COMPARE_CONCENTRATED = 1.5  # any query past this with a calm median => CONCENTRATED


def load(path="BENCH_HISTORY.jsonl"):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def cov(d, key):
    c = d.get(key) or {}
    la = c.get("loadavg")
    steal = c.get("steal_ticks")
    return (la[0] if la else None), steal


def fmt(v, spec="{:.2f}"):
    return spec.format(v) if v is not None else "-"


def steal_delta(d):
    # round-15+ lines carry the delta explicitly (tail-most, so even a
    # truncated capture keeps it); older lines get it computed from the
    # covariate endpoints
    sd = d.get("steal_delta")
    if isinstance(sd, int):
        return sd
    _, s0 = cov(d, "load_start")
    _, s1 = cov(d, "load_end")
    return s1 - s0 if s0 is not None and s1 is not None else None


def cpu_count(d):
    # round-13 lines carried cpus as a JSON string ("32"); later lines
    # carry a number — accept both, None when absent/garbage
    try:
        return int(d.get("cpus"))
    except (TypeError, ValueError):
        return None


def has_covariates(d):
    """True when the line carries any direct load evidence."""
    if isinstance(d.get("steal_delta"), int):
        return True
    return any(v is not None for key in ("load_start", "load_end")
               for v in cov(d, key))


def dispersed(d):
    """Secondary evidence for pre-covariate lines: enough queries whose
    own interleaved samples swing past the dispersion ratio."""
    wild = 0
    for s in (d.get("samples") or {}).values():
        if len(s) >= 2 and min(s) >= DISPERSION_MIN_SEC \
                and max(s) / min(s) > SUSPECT_DISPERSION_RATIO:
            wild += 1
    return wild >= SUSPECT_DISPERSION_COUNT


def non_comparable(d):
    """'!' when a covariate says this run is not a usable anchor.

    A round-15+ line's own `noncomparable` verdict (computed in-run by
    Bench.nonComparable against the same thresholds) is authoritative
    when present and boolean; `null` (no covariate was readable) and
    older lines fall through to computing from the covariates. Lines
    with no covariates at all fall back to within-run dispersion."""
    nc = d.get("noncomparable")
    if isinstance(nc, bool):
        return "!" if nc else ""
    if not has_covariates(d):
        return "!" if dispersed(d) else ""
    sd = steal_delta(d)
    if sd is not None and sd > SUSPECT_STEAL_DELTA:
        return "!"
    cpus = cpu_count(d)
    if cpus is not None:
        for key in ("load_start", "load_end"):
            l1m, _ = cov(d, key)
            if l1m is not None and l1m > cpus:
                return "!"
    return ""


def band_info(path=None):
    """The documented anchor band + provenance (tools/ANCHOR_BAND.json,
    maintained by anchor_bench.sh --reanchor). None when absent or
    garbled — the tool still works, it just can't show the band."""
    import os
    p = path if path is not None else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ANCHOR_BAND.json")
    try:
        with open(p) as f:
            b = json.load(f)
        ok = all(isinstance(b.get(k), (int, float))
                 and not isinstance(b.get(k), bool) for k in ("lo", "hi"))
        return b if ok else None
    except Exception:
        return None


def band_header():
    b = band_info()
    if b:
        print("anchor band [{}, {}] s — anchored {} at {} ({} cpus, sf {}); "
              "provenance: tools/ANCHOR_BAND.json".format(
                  b["lo"], b["hi"], b.get("anchored", "?"),
                  str(b.get("sha", "?"))[:8], b.get("cpus", "?"),
                  b.get("sf_num", "?")))
        print("markers: ! = non-comparable (covariates); ~ = line's "
              "(cpus, sf) differ from the band's — NEVER read its value "
              "against the band (round 20: an sf0.001 smoke line was "
              "misread as a below-band canonical run)")
    return b


def off_band_cohort(d, band):
    """'~' when the line's (cpus, sf) is not the band's cohort — its
    value must never be read against the band, whatever it looks like
    (the round-20 misread: a ~49 s sf0.001 smoke line taken for a
    below-band canonical run)."""
    if not band:
        return ""
    want = (band.get("cpus"), band.get("sf_num"))
    if not all(isinstance(v, (int, float)) and not isinstance(v, bool)
               for v in want):
        return ""
    return "~" if covariates(d) != (int(want[0]), want[1]) else ""


def summary(runs):
    band = band_header()
    hdr = ("ts", "sha", "run", "cpus", "sf", "mode", "value_s", "fail",
           "load1m_s", "load1m_e", "steal_d", "!~")
    print(("{:<20} {:<8} {:>3} {:>4} {:>6} {:<9} {:>8} {:>4} "
           "{:>8} {:>8} {:>7} {:<2}").format(*hdr))
    for d in runs:
        l0, _ = cov(d, "load_start")
        l1, _ = cov(d, "load_end")
        print(("{:<20} {:<8} {:>3} {:>4} {:>6} {:<9} {:>8} {:>4} "
               "{:>8} {:>8} {:>7} {:<2}").format(
            d.get("ts", "-")[:19],
            d.get("sha", "-")[:8],
            str(d.get("jvm_run", "-")),
            str(d.get("cpus", "-")),
            fmt(d.get("sf_num"), "{:g}"),
            d.get("mode", "-"),
            fmt(d.get("value"), "{:.1f}"),
            len(d.get("failed", [])),
            fmt(l0), fmt(l1), fmt(steal_delta(d), "{:d}"),
            non_comparable(d) + off_band_cohort(d, band)))
        # round-18 per-query self-adjudication: surface the line's own
        # suspect verdict (band-breaching queries + their clean-covariate
        # re-run samples) so triage reads it without opening the JSON
        for q in d.get("suspect") or []:
            det = (d.get("suspect_detail") or {}).get(q, {})
            rr = det.get("rerun")
            # rerun is null in three distinct cases Bench produces —
            # name the right one, or triage gets misdirected: dirty run
            # (rerun never attempted), unknown covariates (same gate),
            # clean run whose rerun attempt itself threw
            nc = d.get("noncomparable")
            verdict = ("rerun {:.2f}s".format(rr)
                       if isinstance(rr, (int, float))
                       and not isinstance(rr, bool)
                       else "no rerun (dirty run)" if nc is True
                       else "no rerun (covariates unknown)" if nc is None
                       else "no rerun (clean run, rerun attempt failed)")
            print("    suspect {}: min {} vs band median {} (n={}) — {}".format(
                q, fmt(det.get("min"), "{:.2f}"),
                fmt(det.get("band_median"), "{:.2f}"), det.get("n", "-"),
                verdict))
        # round-18 prior-lead adjudication: an open suspect from the
        # previous comparable line (rerun repeated the breach or never
        # ran), adjudicated by THIS line — refuted = back in band
        # (transient), confirmed = breached again (bisect), retired =
        # the query left the registry (can never be re-measured), null =
        # this line couldn't judge it (query failed here). fresh_jvm says
        # whether the verdict came from a different process (regression-
        # grade) or a same-JVM repeat (can clear a JIT/GC transient).
        src = d.get("prior_suspect_src") or {}
        for q, det in sorted((d.get("prior_suspect") or {}).items()):
            verdict = det.get("verdict") or "unadjudicated (not run here)"
            # round-19: `origin` names the line where the lead's evidence
            # was MEASURED (survives carry-forward hops verbatim) — the
            # bisect target; src names the adjacent line this run
            # adjudicated. Pre-origin vintage entries have no origin and
            # the emitter deliberately never backfills one (for a deep
            # carry chain the src is a later CARRIER, not the measuring
            # line) — render the src fallback as the guess it is, never
            # under the measured-here label.
            origin = det.get("origin")
            measured = ("measured {} @{}".format(
                origin.get("ts", "-")[:19], str(origin.get("sha", "-"))[:8])
                if isinstance(origin, dict) else
                "measured ~{} @{} (origin unknown, src fallback)".format(
                    src.get("ts", "-")[:19], str(src.get("sha", "-"))[:8]))
            print("    prior lead {} ({}, via {} @{}): "
                  "min {} rerun {} -> this run {} — {}{}".format(
                q, measured,
                src.get("ts", "-")[:19], str(src.get("sha", "-"))[:8],
                fmt(det.get("prior_min"), "{:.2f}"),
                fmt(det.get("prior_rerun"), "{:.2f}"),
                fmt(det.get("min"), "{:.2f}"), verdict,
                " (fresh jvm)" if src.get("fresh_jvm") is True
                else " (same jvm)" if src.get("fresh_jvm") is False else ""))
        # round-19 (gate widened round 20): a line whose own headline is
        # not reference-grade — dirty/unknown covariates, a failed
        # query, or an open suspect — names its own trusted reference:
        # the most recent reference-grade (comparable AND
        # failed/suspect-free) line's headline, often an older line than
        # the last merely-comparable one. Triage never walks the file.
        lc = d.get("last_clean")
        if isinstance(lc, dict):
            run = lc.get("jvm_run")
            print("    last clean: {} @ {} ({}){}{}".format(
                fmt(lc.get("value"), "{:.2f}"),
                str(lc.get("sha", "-"))[:8], lc.get("ts", "-")[:19],
                # warm repeats are disclosed: not the same reference
                # point as a cold fresh run
                " [warm jvm_run {}]".format(run)
                if isinstance(run, int) and run > 1 else "",
                # round-20: the reference's own band position — false
                # means the best available baseline is itself out of
                # band (every clean line of a degraded stretch); the
                # emitter prefers in-band references when they exist
                " [OUT-OF-BAND reference]"
                if lc.get("in_band") is False else ""))
        # round-20: a CLEAN line whose headline lands outside the anchor
        # band classifies itself (the --compare math run at emit time
        # against the per-query history bands): diffuse = every query
        # moved together (environmental; below the band, the re-anchor
        # signal), concentrated = a few specific plans moved (suspect
        # them), comparable = per-query evidence doesn't back the
        # headline excursion
        bv = d.get("band_verdict")
        if isinstance(bv, dict):
            print("    band verdict: {} band [{}, {}] — {} "
                  "(median {}x, frac_up {}, frac_down {}, n={})".format(
                bv.get("side", "?"), bv.get("band_lo", "?"),
                bv.get("band_hi", "?"), str(bv.get("class", "?")).upper(),
                fmt(bv.get("median_ratio")), fmt(bv.get("frac_up")),
                fmt(bv.get("frac_down")), bv.get("n", "?")))


def one_query(runs, q):
    print("{:<20} {:<8} {:>6} {:>8} {:>9} {:>7} {:<1}  {}".format(
        "ts", "sha", "sf", "min_s", "unord_s", "steal_d", "!", "samples"))
    for d in runs:
        samples = (d.get("samples") or {}).get(q)
        if samples is None and q not in (d.get("queries") or {}):
            continue
        unord = (d.get("unordered") or {}).get(q)
        qmin = (d.get("queries") or {}).get(q)
        print("{:<20} {:<8} {:>6} {:>8} {:>9} {:>7} {:<1}  {}".format(
            d.get("ts", "-")[:19],
            d.get("sha", "-")[:8],
            fmt(d.get("sf_num"), "{:g}"),
            fmt(qmin),
            fmt(unord),
            fmt(steal_delta(d), "{:d}"),
            non_comparable(d),
            "[" + ", ".join("{:.2f}".format(s) for s in samples) + "]"
            if samples else "-"))


def pick(runs, ts_prefix):
    hits = [d for d in runs if d.get("ts", "").startswith(ts_prefix)]
    if len(hits) != 1:
        sys.exit("ts prefix {!r} matches {} runs (need exactly 1)"
                 .format(ts_prefix, len(hits)))
    return hits[0]


def query_mins(d):
    """Per-query best-of-samples — min is the standard noise-resistant
    statistic here (same convention as Bench's own `queries` field)."""
    out = {q: min(s) for q, s in (d.get("samples") or {}).items() if s}
    for q, v in (d.get("queries") or {}).items():   # pre-samples lines
        out.setdefault(q, v)
    return out


def suspect_hits(best, hist):
    """The flagged queries for one run's per-query mins against a band
    map — the same rule graft.Bench applies in-run: min > SUSPECT_RATIO
    x the band median AND excess > SUSPECT_FLOOR_SEC, with at least
    SUSPECT_MIN_HISTORY comparable history mins behind the band."""
    import statistics
    hits = []
    for q, v in sorted(best.items()):
        mins = hist.get(q)
        if mins and len(mins) >= SUSPECT_MIN_HISTORY:
            med = statistics.median(mins)
            if v > SUSPECT_RATIO * med and v - med > SUSPECT_FLOOR_SEC:
                hits.append((q, v, med, len(mins)))
    return hits


def suspect_replay(runs, cpus=32, sf=0.1):
    """Replay every line in one (cpus, sf, ordered-headline) cohort
    against the bands available at its own timestamp — the reproducible
    form of the calibration sweep that set SUSPECT_RATIO (graft.Bench
    applies the same rule in-run since round 18). Bands are fed by
    comparable (noncomparable:false) lines only, exactly as Bench's
    lineQueryMins filters; every cohort line is judged, so a dirty
    line's flags print too (self-explained by its covariates, shown).
    On the pre-ship history (lines before the rule landed) this prints
    exactly the r15 6.4s and r17 12.46s d57 incidents as the only clean
    flagged lines — the calibration claim. Lines appended after the rule
    shipped can add clean flags (those ARE the rule firing live: q10 on
    2026-08-14, q42 on 2026-08-15 — each adjudicated weather/refuted on
    its own line or the adjacent one, see README), so the replay's
    clean-flag set grows with the firing log, not against it."""
    hist = {}
    judged = flagged = 0
    for d in runs:
        try:
            line_cpus = int(d.get("cpus"))
        except (TypeError, ValueError):
            continue
        if (line_cpus != cpus or d.get("sf_num") != sf
                or d.get("mode") not in ("both", "ordered")):
            continue
        best = query_mins(d)
        if not best:
            continue
        judged += 1
        hits = suspect_hits(best, hist)
        if hits:
            flagged += 1
            clean = d.get("noncomparable") is False
            print("{} sha={} steal_d={} [{}]".format(
                d.get("ts", "-")[:19], str(d.get("sha", "-"))[:8],
                fmt(steal_delta(d), "{:d}"),
                "CLEAN — the incident class the in-run check catches"
                if clean else "dirty/unknown — already self-explained"))
            for q, v, med, n in hits:
                print("    {}: {:.2f}s vs band median {:.2f} "
                      "(n={}, {:.2f}x)".format(q, v, med, n, v / med))
        if d.get("noncomparable") is False:
            for q, v in best.items():
                hist.setdefault(q, []).append(v)
    print("{} of {} ({} cpus, sf {:g}) cohort lines would flag".format(
        flagged, judged, cpus, sf))


def classify(ratios):
    """DIFFUSE / CONCENTRATED / comparable, from per-query ratios."""
    if not ratios:
        return "no common queries"
    med = sorted(ratios)[len(ratios) // 2]
    frac = sum(1 for r in ratios if r > COMPARE_ELEVATED) / len(ratios)
    if frac >= COMPARE_DIFFUSE_FRAC and med > COMPARE_ELEVATED:
        return ("DIFFUSE elevation ({:.0%} of queries > {:g}x, median "
                "{:.2f}x) — environmental (shared-resource contention is "
                "steal-invisible), not a plan change"
                .format(frac, COMPARE_ELEVATED, med))
    if med <= COMPARE_ELEVATED and max(ratios) >= COMPARE_CONCENTRATED:
        return ("CONCENTRATED elevation (median {:.2f}x but max {:.2f}x) "
                "— suspect the listed plans".format(med, max(ratios)))
    return "comparable (median {:.2f}x)".format(med)


def cohort_mins(runs):
    """Per-query min across a base cohort (union of queries; min over
    the runs that carry each)."""
    out = {}
    for d in runs:
        for q, v in query_mins(d).items():
            if q not in out or v < out[q]:
                out[q] = v
    return out


def covariates(d):
    """(cpus, sf_num) — the configuration identity a ratio is only
    meaningful within."""
    return (cpu_count(d), d.get("sf_num"))


def band_runs(runs, sha_prefix, like=None):
    """All comparable (non-'!') runs at a sha — the --band base cohort.
    With `like`, hard-filtered to runs whose (cpus, sf_num) equal that
    candidate's: the history holds 8-cpu/sf0.001 smoke lines beside
    canonical 32-cpu/sf0.1 lines, and one smoke line's minima folded
    into the base would poison every ratio. Dropped lines are counted
    out loud — silent truncation reads as 'covered everything'."""
    hits = [d for d in runs
            if d.get("sha", "").startswith(sha_prefix)
            and non_comparable(d) == ""]
    if like is not None:
        want = covariates(like)
        dropped = sum(1 for d in hits if covariates(d) != want)
        if dropped:
            print("band cohort: dropped {} run(s) whose (cpus, sf) != {} "
                  "(smoke/other-config lines never fold into the base)"
                  .format(dropped, want))
        hits = [d for d in hits if covariates(d) == want]
    if not hits:
        sys.exit("--band {!r}: no comparable runs at that sha{}"
                 .format(sha_prefix,
                         "" if like is None else
                         " with (cpus, sf) == {}".format(covariates(like))))
    return hits


def compare(runs, base_specs, ts_b, band=None, top=10):
    b = pick(runs, ts_b)
    bases = band_runs(runs, band, like=b) if band is not None \
        else [pick(runs, t) for t in base_specs]
    if band is None:
        for d in bases:
            if covariates(d) != covariates(b):
                print("WARNING: base {} has (cpus, sf) {} vs candidate's {} "
                      "— these ratios are cross-configuration".format(
                          d.get("ts", "-")[:19], covariates(d),
                          covariates(b)))
    for d in bases:
        print("base: {} sha={} value={} steal_d={} {}".format(
            d.get("ts", "-")[:19], d.get("sha", "-")[:8],
            fmt(d.get("value"), "{:.1f}"), fmt(steal_delta(d), "{:d}"),
            non_comparable(d)))
    if len(bases) > 1:
        print("base cohort: {} runs, per-query min".format(len(bases)))
    print("cand: {} sha={} value={} steal_d={} {}".format(
        b.get("ts", "-")[:19], b.get("sha", "-")[:8],
        fmt(b.get("value"), "{:.1f}"), fmt(steal_delta(b), "{:d}"),
        non_comparable(b)))
    ma, mb = cohort_mins(bases), query_mins(b)
    rows = sorted(((mb[q] / ma[q], q, ma[q], mb[q])
                   for q in set(ma) & set(mb)
                   if ma[q] >= COMPARE_MIN_SEC), reverse=True)
    if not rows:
        print("no common queries above the {:.0f}ms floor"
              .format(COMPARE_MIN_SEC * 1000))
        return
    print("{:<32} {:>7} {:>7} {:>6}".format("query", "base_s", "cand_s",
                                            "ratio"))
    for r, q, x, y in rows[:top]:
        print("{:<32} {:>7.2f} {:>7.2f} {:>5.2f}x".format(q, x, y, r))
    ratios = [r for r, _, _, _ in rows]
    print("n={} sum {:.1f}s -> {:.1f}s; {}".format(
        len(rows), sum(x for _, _, x, _ in rows),
        sum(y for _, _, _, y in rows), classify(ratios)))


def selftest():
    """Pin the non-comparable thresholds (python3 tools/bench_history.py
    --selftest). The steal branch is exercised by the real round-13/14
    history; the load branch has never fired on real lines (loadavg
    stayed far under 32), so without this it would be dead code with an
    unverified comparison direction."""
    def line(steal_d=0, l1m_s=1.0, l1m_e=1.0, cpus=32):
        return {"cpus": cpus,
                "load_start": {"loadavg": [l1m_s, 0, 0], "steal_ticks": 1000},
                "load_end": {"loadavg": [l1m_e, 0, 0],
                             "steal_ticks": 1000 + steal_d}}
    assert non_comparable(line()) == ""
    assert non_comparable(line(steal_d=SUSPECT_STEAL_DELTA)) == ""      # > not >=
    assert non_comparable(line(steal_d=SUSPECT_STEAL_DELTA + 1)) == "!"
    assert non_comparable(line(l1m_s=33.0)) == "!"                     # start
    assert non_comparable(line(l1m_e=32.5)) == "!"                     # end
    assert non_comparable(line(l1m_s=32.0)) == ""                      # > not >=
    assert non_comparable(line(l1m_s=99.0, cpus="notanint")) == ""     # no cpus -> skip load test
    assert non_comparable(line(steal_d=9999, cpus="8")) == "!"         # string cpus accepted
    assert non_comparable({"cpus": 32}) == ""                          # pre-covariate line
    # round-15 self-adjudicating lines: the explicit fields are read
    # directly — a boolean verdict wins even when the covariates would
    # say otherwise (the in-run computation saw the same data the line
    # carries; a disagreement means the line was hand-edited), and an
    # explicit steal_delta wins over differencing the endpoints
    assert non_comparable(dict(line(), noncomparable=True)) == "!"
    assert non_comparable(dict(line(steal_d=9999), noncomparable=False)) == ""
    assert non_comparable(dict(line(steal_d=9999), noncomparable=None)) == "!"  # null -> compute
    assert steal_delta(dict(line(steal_d=7), steal_delta=123)) == 123
    assert steal_delta(line(steal_d=7)) == 7
    assert steal_delta(dict(line(steal_d=7), steal_delta=None)) == 7   # null -> compute
    # dispersion fallback: only for lines with NO covariates at all
    calm = [1.0, 1.1, 1.0]
    wild = [10.0, 0.4, 0.4]                    # ratio 25, all above floor
    warm = [9.0, 1.0, 1.0]                     # worst observed benign warm-up shape
    tiny = [0.15, 0.001]                       # wild ratio but sub-floor
    bar = [SUSPECT_DISPERSION_RATIO, 1.0]      # exactly at the bar
    assert dispersed({"samples": {"a": wild, "b": wild}})
    assert not dispersed({"samples": {"a": wild, "b": calm}})          # count 2
    assert not dispersed({"samples": {"a": warm, "b": warm}})          # warm-up clears
    assert not dispersed({"samples": {"a": tiny, "b": tiny}})          # floor
    assert not dispersed({"samples": {"a": bar, "b": bar}})            # > not >=
    assert non_comparable({"samples": {"a": wild, "b": wild}}) == "!"
    assert non_comparable({"samples": {"a": wild, "b": calm}}) == ""
    # direct covariate evidence wins over dispersion in BOTH directions:
    # clean covariates keep a dispersed run comparable, and a boolean
    # verdict keeps its line authoritative regardless of samples
    assert non_comparable(dict(line(), samples={"a": wild, "b": wild})) == ""
    assert non_comparable({"samples": {"a": wild, "b": wild},
                           "noncomparable": False}) == ""
    # --compare classification: the three verdicts and their bars
    diffuse = [1.13] * 9 + [1.02]             # 90% elevated, median 1.13
    conc = [1.0] * 9 + [COMPARE_CONCENTRATED]  # one hot plan, calm median
    calm_r = [1.0, 1.01, 0.99]
    edge = [1.2] * 6 + [1.0] * 4              # 60% elevated < 70% bar
    assert classify(diffuse).startswith("DIFFUSE")
    assert classify(conc).startswith("CONCENTRATED")
    assert classify(calm_r).startswith("comparable")
    assert classify(edge).startswith("comparable")   # frac bar is >=
    assert classify([]) == "no common queries"
    # query_mins: min-of-samples, pre-samples `queries` fallback, and
    # the floor exclusion happens in compare (not here)
    assert query_mins({"samples": {"a": [2.0, 1.0]}}) == {"a": 1.0}
    assert query_mins({"queries": {"a": 3.0}}) == {"a": 3.0}
    assert query_mins({"samples": {"a": [1.0]}, "queries": {"a": 9.9,
                      "b": 2.0}}) == {"a": 1.0, "b": 2.0}
    # base-cohort compare: per-query min across runs (union of queries);
    # --band keeps only comparable lines at the sha and refuses an
    # empty cohort instead of comparing against nothing
    r1 = {"sha": "aaa1", "samples": {"a": [2.0, 1.0], "b": [5.0]}}
    r2 = {"sha": "aaa2", "queries": {"a": 0.5}}
    dirty = dict(r2, noncomparable=True)
    assert cohort_mins([r1, r2]) == {"a": 0.5, "b": 5.0}
    assert band_runs([r1, dirty, r2], "aaa") == [r1, r2]
    try:
        band_runs([dirty], "aaa")
        raise AssertionError("empty band must exit")
    except SystemExit:
        pass
    # --band covariate filter: only lines with the CANDIDATE's
    # (cpus, sf_num) survive into the cohort — an 8-cpu/sf0.001 smoke
    # line and a covariate-less line are dropped, string cpus ("32")
    # still matches numeric 32, and a cohort that empties after the
    # filter refuses instead of comparing against nothing
    cand = {"sha": "bbb0", "cpus": 32, "sf_num": 0.1, "queries": {"a": 1.0}}
    full = {"sha": "aaa1", "cpus": 32, "sf_num": 0.1, "queries": {"a": 2.0}}
    strc = {"sha": "aaa2", "cpus": "32", "sf_num": 0.1, "queries": {"a": 3.0}}
    smoke = {"sha": "aaa3", "cpus": 8, "sf_num": 0.001, "queries": {"a": 0.01}}
    nocov = {"sha": "aaa4", "sf_num": 0.1, "queries": {"a": 0.02}}
    assert band_runs([full, strc, smoke, nocov], "aaa",
                     like=cand) == [full, strc]
    try:
        band_runs([smoke], "aaa", like=cand)
        raise AssertionError("covariate-empty band must exit")
    except SystemExit:
        pass
    # band_info: a missing/garbled band file is None, never a crash
    assert band_info(path="/nonexistent/band.json") is None
    # off-band-cohort marker: a line whose (cpus, sf) differ from the
    # band's prints '~' — the round-20 misread guard (an sf0.001 smoke
    # line read as a below-band canonical run). String cpus still
    # match; a cpus-less line can't be confirmed on-cohort; no/garbled
    # band means no marker (nothing to be off of)
    bnd = {"cpus": 32, "sf_num": 0.1}
    assert off_band_cohort({"cpus": 32, "sf_num": 0.1}, bnd) == ""
    assert off_band_cohort({"cpus": "32", "sf_num": 0.1}, bnd) == ""
    assert off_band_cohort({"cpus": 32, "sf_num": 0.001}, bnd) == "~"
    assert off_band_cohort({"cpus": 8, "sf_num": 0.1}, bnd) == "~"
    assert off_band_cohort({"sf_num": 0.1}, bnd) == "~"
    assert off_band_cohort({"cpus": 32, "sf_num": 0.1}, None) == ""
    assert off_band_cohort({"cpus": 32, "sf_num": 0.1},
                           {"cpus": "x", "sf_num": 0.1}) == ""
    # suspect rule: the r15 shape (6.4 vs ~3.86 band) flags, in-band and
    # floor-guarded values don't, thin history never does — mirrors
    # BenchSuspectSpec's pins so the two copies can't drift silently
    band = {"d57": [3.86] * 5, "tiny": [0.1] * 5, "thin": [1.0] * 2}
    assert [h[0] for h in suspect_hits({"d57": 6.4}, band)] == ["d57"]
    assert suspect_hits({"d57": 4.5}, band) == []      # in band
    assert suspect_hits({"tiny": 0.35}, band) == []    # ratio but no floor
    assert suspect_hits({"thin": 99.0}, band) == []    # thin history
    # printer smoke: a line carrying the round-18 prior-lead block (both
    # verdict shapes, including the all-null unadjudicated lead) must
    # render — summary is the triage surface for the field
    summary([{"ts": "2026-08-15T02:00:00Z", "sha": "c" * 40, "jvm_run": 1,
              "cpus": 32, "sf_num": 0.1, "mode": "both", "value": 60.0,
              "queries": {"q42": 1.96}, "failed": [],
              "suspect": [], "suspect_detail": {},
              "prior_suspect": {
                  "q42": {"prior_min": 3.22, "prior_rerun": 3.58,
                          "origin": {"ts": "2026-08-15T00:00:00Z",
                                     "sha": "a" * 40},
                          "min": 1.96, "verdict": "refuted"},
                  "gone": {"prior_min": 9.0, "prior_rerun": None,
                           "min": None, "verdict": None}},
              "prior_suspect_src": {"ts": "2026-08-15T01:00:00Z",
                                    "sha": "b" * 40, "fresh_jvm": True},
              "steal_delta": 1, "noncomparable": False},
             # round-19 dirty-line shape: last_clean names the trusted
             # reference right on the storm capture
             {"ts": "2026-08-15T03:00:00Z", "sha": "c" * 40, "jvm_run": 1,
              "cpus": 32, "sf_num": 0.1, "mode": "both", "value": 74.16,
              "queries": {"q42": 15.0}, "failed": [],
              "suspect": ["q42"],
              "suspect_detail": {"q42": {"min": 15.0, "band_median": 2.0,
                                         "n": 70, "rerun": None}},
              "prior_suspect": {}, "prior_suspect_src": None,
              "last_clean": {"value": 52.45, "ts": "2026-08-15T02:30:00Z",
                             "sha": "b" * 40, "jvm_run": 2,
                             "in_band": True},
              "steal_delta": 2411, "noncomparable": True},
             # round-20 degraded-stretch shape: the best available
             # reference is itself out of band and says so
             {"ts": "2026-08-15T17:39:00Z", "sha": "d" * 40, "jvm_run": 1,
              "cpus": 32, "sf_num": 0.1, "mode": "both", "value": 61.3,
              "queries": {"q01": 1.0}, "failed": [],
              "suspect": [], "suspect_detail": {},
              "prior_suspect": {}, "prior_suspect_src": None,
              "last_clean": {"value": 58.41, "ts": "2026-08-15T17:14:00Z",
                             "sha": "d" * 40, "jvm_run": 2,
                             "in_band": False},
              "steal_delta": 682, "noncomparable": True},
             # round-20 clean-but-out-of-band shape: the line carries its
             # own --compare verdict (here the r19 49.14 s fast-side case
             # classified diffuse-below — the re-anchor signal)
             {"ts": "2026-08-15T09:03:00Z", "sha": "e" * 40, "jvm_run": 1,
              "cpus": 32, "sf_num": 0.1, "mode": "both", "value": 49.14,
              "queries": {"q01": 0.9}, "failed": [],
              "suspect": [], "suspect_detail": {},
              "prior_suspect": {}, "prior_suspect_src": None,
              "band_verdict": {"side": "below", "band_lo": 51,
                               "band_hi": 56, "n": 52,
                               "median_ratio": 0.9, "frac_up": 0.02,
                               "frac_down": 0.85, "max_ratio": 1.02,
                               "min_ratio": 0.25, "class": "diffuse"},
              "steal_delta": 59, "noncomparable": False}])
    print("selftest OK")


if __name__ == "__main__":
    args = sys.argv[1:]
    # --file PATH: adjudicate another line file (e.g. BENCH_FULL.json —
    # same shape as a history line minus the ts/sha/jvm_run splice)
    path = "BENCH_HISTORY.jsonl"
    if "--file" in args:
        i = args.index("--file")
        if i + 1 >= len(args):
            sys.exit("--file needs a path")
        path = args[i + 1]
        del args[i:i + 2]
    try:
        if args and args[0] == "--selftest":
            selftest()
        elif args and args[0] == "--compare":
            rest = args[1:]
            if rest and rest[0] == "--band":
                if len(rest) != 3:
                    sys.exit("--compare --band SHA_PREFIX CAND_TS")
                compare(load(path), [], rest[2], band=rest[1])
            elif len(rest) >= 2:
                compare(load(path), rest[:-1], rest[-1])
            else:
                sys.exit("--compare needs base ts prefix(es) — or "
                         "--band SHA_PREFIX — plus a candidate ts")
        elif args and args[0] == "--suspect-replay":
            rest = args[1:]
            if rest and len(rest) != 2:
                sys.exit("--suspect-replay [CPUS SF] (default 32 0.1)")
            if rest:
                suspect_replay(load(path), int(rest[0]), float(rest[1]))
            else:
                suspect_replay(load(path))
        elif args:
            one_query(load(path), args[0])
        else:
            summary(load(path))
    except BrokenPipeError:
        # downstream |head closed the pipe mid-print — normal, not an
        # error; swap stdout for devnull so interpreter teardown doesn't
        # print a second traceback trying to flush
        import os
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        sys.exit(0)
