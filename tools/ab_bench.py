#!/usr/bin/env python3
"""Interleaved A/B benchmark: current working tree vs a prior git ref.

Cross-session wall-clock on this host drifts by up to ~10% (proven in
round 7 by re-benching round-6 bytes), so BENCH_rN vs BENCH_r{N-1}
comparisons cry wolf. This harness removes the session effect: it
builds the prior ref in a git worktree, then alternates full Bench
executions A,B,A,B,... in one session, pairs the per-query times, and
reports the median paired ratio per query — queries that failed on
either side (-1 sentinel) are excluded and listed.

Usage:
  python3 tools/ab_bench.py [--ref <git-ref>] [--pairs N] [--sf DIR]

Defaults: ref = newest commit whose subject starts with "round "
(the driver's artifact commit for the previous round), pairs = 3,
sf = /root/testdata/sf0.1. Writes AB_BENCH.json in the repo root.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd=REPO, check=True, env=None):
    r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True,
                       env=env)
    if check and r.returncode != 0:
        sys.exit(f"FAILED ({r.returncode}): {' '.join(cmd)}\n{r.stderr[-2000:]}")
    return r


def default_ref():
    r = sh(["git", "log", "--format=%H %s", "-50"])
    for line in r.stdout.splitlines():
        h, _, subject = line.partition(" ")
        if subject.startswith("round "):
            return h
    sys.exit("no 'round N' artifact commit found; pass --ref")


def bench_json(cwd, sf):
    # reps=1: the A/B harness derives its own medians from interleaved
    # pairs, so Bench's internal median-of-3 would triple the wall time
    # for no extra statistical power here
    # SKIP_SWEEP: the 1-rep coverage sweep is a tripwire, not a paired
    # statistic — and the prior ref has no sweep, so pairing is over the
    # grouped sets either way; skipping keeps each execution comparable
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_REPS="1", SPARK_GRAFT_SKIP_SWEEP="1")
    # Bench exits 1 when any query fails; the -1 sentinels in its JSON
    # still identify exactly which — keep going and pair what we can.
    import time
    t0 = time.time()
    r = sh([os.path.join(cwd, "tools", "run.sh"), "graft.Bench"],
           cwd=cwd, check=False, env=env)
    # The full artifact lives in cwd/BENCH_FULL.json (stdout now carries a
    # COMPACT line without the per-group query maps this harness pairs on).
    # mtime guard: only trust a file THIS run wrote, never the committed
    # copy left behind by a crashed execution.
    full = os.path.join(cwd, "BENCH_FULL.json")
    if os.path.exists(full) and os.path.getmtime(full) >= t0:
        try:
            return json.load(open(full))
        except Exception:
            pass
    for line in reversed(r.stdout.splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)
    sys.exit(f"no bench JSON line from {cwd}\n{r.stderr[-2000:]}")


def flat_queries(b):
    out = {}
    for key in ("queries", "queries_r7", "queries_r9", "queries_r10",
                "queries_r11", "queries_r12", "queries_r13"):
        out.update(b.get(key, {}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=None)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--gate", type=float, default=1.25,
                    help="fail (exit 1) when any shared query's paired "
                         "ratio exceeds this")
    args = ap.parse_args()
    ref = args.ref or default_ref()

    wt = "/tmp/ab_bench_prior"
    sh(["git", "worktree", "remove", "--force", wt], check=False)
    sh(["git", "worktree", "add", "--detach", wt, ref])
    print(f"building prior ref {ref[:12]} in {wt} ...", flush=True)
    sh(["sbt", "-batch", "compile"], cwd=wt)

    runs_a, runs_b = [], []
    for i in range(args.pairs):
        print(f"pair {i + 1}/{args.pairs}: current ...", flush=True)
        runs_a.append(flat_queries(bench_json(REPO, args.sf)))
        print(f"pair {i + 1}/{args.pairs}: prior ...", flush=True)
        runs_b.append(flat_queries(bench_json(wt, args.sf)))

    shared = set.intersection(*(set(r) for r in runs_a + runs_b))
    ratios, excluded = {}, sorted(
        set.union(*(set(r) for r in runs_a + runs_b)) - shared)
    for q in sorted(shared):
        a = [r[q] for r in runs_a]
        b = [r[q] for r in runs_b]
        if min(a) < 0 or min(b) < 0:
            excluded.append(q)
            continue
        ratios[q] = round(statistics.median(
            x / y for x, y in zip(a, b)), 3)
    # totals only over the ratio-eligible (shared, both-succeeded) set —
    # otherwise queries that exist on one side only (new operators, or
    # failures on the prior ref) masquerade as a regression
    eligible = sorted(ratios)
    tot_a = [sum(r[q] for q in eligible) for r in runs_a]
    tot_b = [sum(r[q] for q in eligible) for r in runs_b]
    breaches = {q: r for q, r in ratios.items() if r > args.gate}
    out = {
        "gate": args.gate,
        "gate_breaches": breaches,
        "pass": not breaches,
        "ref": ref,
        "pairs": args.pairs,
        "sf": args.sf,
        "n_shared_queries": len(eligible),
        "total_ratio_median": round(statistics.median(
            x / y for x, y in zip(tot_a, tot_b)), 3),
        "per_query_ratio_median": round(statistics.median(
            ratios.values()), 3) if ratios else None,
        "per_query_ratio": ratios,
        "excluded": sorted(set(excluded)),
        "totals_current": [round(t, 2) for t in tot_a],
        "totals_prior": [round(t, 2) for t in tot_b],
    }
    path = os.path.join(REPO, "AB_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    print(f"wrote {path}")
    sh(["git", "worktree", "remove", "--force", wt], check=False)
    if breaches:
        print(f"GATE FAIL: {len(breaches)} quer{'y' if len(breaches) == 1 else 'ies'} "
              f"regressed past {args.gate}x: {breaches}", file=sys.stderr)
        sys.exit(1)
    print(f"GATE PASS: all {len(eligible)} shared ratios <= {args.gate}")


if __name__ == "__main__":
    main()
