#!/usr/bin/env python3
"""Per-query bench regression gate (dev tool; NOT part of the engine).

Compares a fresh bench JSON against a prior round's, flagging per-query
regressions so the q_boilerplate r6->r7 pattern (one query silently 3x
slower) is caught in-round instead of by the judge.

Usage: python3 tools/benchgate.py <current.json> <prior.json> [allowlist]

A query REGRESSES when current > RATIO x prior AND the absolute growth
exceeds FLOOR seconds (sub-floor deltas are JIT/GC noise at this scale).
Queries only in one file are reported informationally, never flagged.
The allowlist (one query name per line, '#' comments) records adjudicated
exceptions — e.g. an intentional algorithm swap — next to the run that
introduced them.

Two failure modes are gated on top of regressions (both would otherwise
read as "improvements", since a query that throws dies early and records
a short wall time):
  - any entry in the bench JSON's "failed" map (Bench.scala records each
    query whose full-plan materialization threw, with the exception);
  - an IMPLAUSIBLE SPEEDUP: current < prior/SPEED_RATIO with more than
    SPEED_FLOOR seconds of absolute drop. A real optimization of that
    size is adjudicated via the allowlist, next to the commit that
    earned it.

Exit 0 = clean (or all flagged queries allowlisted), 1 = failure,
unexplained regression, or unadjudicated implausible speedup.
"""
import json
import sys

RATIO = 2.0
FLOOR = 0.5  # seconds of absolute growth before a ratio matters
SPEED_RATIO = 4.0  # current faster than prior/4 ...
SPEED_FLOOR = 1.0  # ... with >1 s absolute drop = implausible


def load(path):
    with open(path) as f:
        data = json.load(f)
    # driver BENCH_r{N}.json wraps the bench line under "parsed";
    # local bench_out.json is the bench line itself
    if "queries" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return data.get("queries", {}), data


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    cur, cur_all = load(sys.argv[1])
    pri, pri_all = load(sys.argv[2])
    allow = set()
    if len(sys.argv) > 3:
        with open(sys.argv[3]) as f:
            allow = {
                ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")
            }

    # round 9 changed materialization from df.count() (count-optimized
    # plans: pruned aggregates, eliminated left joins) to full-plan
    # toRdd.count(); totals across that boundary measure different plans
    mc, mp = cur_all.get("mat", "count"), pri_all.get("mat", "count")
    if mc != mp:
        sys.exit(f"benchgate: INCOMPARABLE — materialization '{mc}' vs "
                 f"'{mp}'. Compare runs produced by the same Bench method.")

    added = sorted(set(cur) - set(pri))
    removed = sorted(set(pri) - set(cur))
    failed = cur_all.get("failed") or {}
    flagged, allowed, sped = [], [], []
    for name in sorted(set(cur) & set(pri)):
        c, p = cur[name], pri[name]
        if c > RATIO * p and c - p > FLOOR:
            (allowed if name in allow else flagged).append(
                (name, p, c, c / p if p else float("inf")))
        elif (name not in failed and c * SPEED_RATIO < p
              and p - c > SPEED_FLOOR):
            # failed queries are already gated below; this catches a
            # query that silently stopped doing its work
            (allowed if name in allow else sped).append(
                (name, p, c, p / c if c else float("inf")))

    tc = sum(cur.values())
    tp = sum(pri[q] for q in cur if q in pri)
    print(f"benchgate: {len(cur)} queries, sum {tc:.1f}s "
          f"(prior common-set sum {tp:.1f}s)")
    if added:
        print(f"  new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"  dropped queries ({len(removed)}): {', '.join(removed)}")
    for name, p, c, r in allowed:
        print(f"  ALLOWED  {name}: {p:.2f}s -> {c:.2f}s ({r:.1f}x)")
    for name, p, c, r in flagged:
        print(f"  REGRESSED {name}: {p:.2f}s -> {c:.2f}s ({r:.1f}x)")
    for name, p, c, r in sped:
        print(f"  SPEEDUP?  {name}: {p:.2f}s -> {c:.2f}s ({r:.1f}x faster "
              f"— verify it still computes, then allowlist)")
    for name, err in sorted(failed.items()):
        print(f"  FAILED   {name}: {err}")
    if flagged or sped or failed:
        print(f"benchgate: FAIL ({len(flagged)} regressions, "
              f"{len(sped)} unadjudicated speedups, "
              f"{len(failed)} failed queries)")
        sys.exit(1)
    print("benchgate: OK")


if __name__ == "__main__":
    main()
