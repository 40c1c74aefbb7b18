#!/usr/bin/env python3
"""Readable view of BENCH_HISTORY.jsonl for noise-vs-regression triage.

Usage:
  python3 tools/bench_history.py                 # one summary row per run
  python3 tools/bench_history.py d57_containment # that query across runs

Summary columns end with the round-13 machine-load covariates: loadavg
at run start/end (1-minute average) and the start->end steal-tick delta
(hypervisor ran other tenants; 100 ticks = 1 stolen core-second). Read
those before believing any elevation — a nonzero steal delta or a
loadavg far above the worker count is the disturbance on record (see
the d57/d58 notes in DedupQueries.scala for the adjudication rule).
Runs predating round 13 show '-' for fields their lines don't carry.
"""
import json
import sys


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


def summary(runs):
    hdr = ("ts", "sha", "run", "cpus", "sf", "mode", "value_s", "fail",
           "load1m_s", "load1m_e", "steal_d")
    print(("{:<20} {:<8} {:>3} {:>4} {:>6} {:<9} {:>8} {:>4} "
           "{:>8} {:>8} {:>7}").format(*hdr))
    for d in runs:
        l0, s0 = cov(d, "load_start")
        l1, s1 = cov(d, "load_end")
        steal_d = s1 - s0 if s0 is not None and s1 is not None else None
        print(("{:<20} {:<8} {:>3} {:>4} {:>6} {:<9} {:>8} {:>4} "
               "{:>8} {:>8} {:>7}").format(
            d.get("ts", "-")[:19],
            d.get("sha", "-")[:8],
            str(d.get("jvm_run", "-")),
            d.get("cpus", "-"),
            fmt(d.get("sf_num"), "{:g}"),
            d.get("mode", "-"),
            fmt(d.get("value"), "{:.1f}"),
            len(d.get("failed", [])),
            fmt(l0), fmt(l1), fmt(steal_d, "{:d}")))


def one_query(runs, q):
    print("{:<20} {:<8} {:>6} {:>8} {:>9} {:>7}  {}".format(
        "ts", "sha", "sf", "min_s", "unord_s", "steal_d", "samples"))
    for d in runs:
        samples = (d.get("samples") or {}).get(q)
        if samples is None and q not in (d.get("queries") or {}):
            continue
        _, s0 = cov(d, "load_start")
        _, s1 = cov(d, "load_end")
        steal_d = s1 - s0 if s0 is not None and s1 is not None else None
        unord = (d.get("unordered") or {}).get(q)
        qmin = (d.get("queries") or {}).get(q)
        print("{:<20} {:<8} {:>6} {:>8} {:>9} {:>7}  {}".format(
            d.get("ts", "-")[:19],
            d.get("sha", "-")[:8],
            fmt(d.get("sf_num"), "{:g}"),
            fmt(qmin),
            fmt(unord),
            fmt(steal_d, "{:d}"),
            "[" + ", ".join("{:.2f}".format(s) for s in samples) + "]"
            if samples else "-"))


if __name__ == "__main__":
    runs = load()
    if len(sys.argv) > 1:
        one_query(runs, sys.argv[1])
    else:
        summary(runs)
