#!/usr/bin/env python3
"""Isolated-replay adjudication for AB_BENCH gate breaches.

The full-artifact A/B (`ab_bench.py`) pairs complete Bench executions
and ALWAYS runs current before prior inside a pair, so a host that
warms up within a pair (page cache, JIT, thermal) reads as a uniform
current/prior ratio > 1 across every query — 32 'breaches' at a
per-query MEDIAN of ~1.1 is that signature, not 32 regressions. This
harness re-times ONLY the flagged queries, isolated (one JVM per side
per round), ALTERNATING prior-first, and judges on min-of-reps (the
SCALE.md regression statistic: minima survive contended/warming
windows, medians do not).

Usage:
  python3 tools/ab_replay.py --ref <git-ref> [--rounds 2] [--reps 3] \
      [--sf DIR] q1 q2 ...
  (with no query args, reads gate_breaches from AB_BENCH.json)

Writes AB_REPLAY.json: per query min-of-all-reps on each side and the
min ratio; pass = every ratio <= gate (default 1.25).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd=REPO, check=True, env=None):
    r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True,
                       env=env)
    if check and r.returncode != 0:
        sys.exit(f"FAILED ({r.returncode}): {' '.join(cmd)}\n{r.stderr[-2000:]}")
    return r


def bench_isolated(cwd, sf, reps, names):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_REPS=str(reps))
    r = sh([os.path.join(cwd, "tools", "run.sh"), "graft.Bench"] + names,
           cwd=cwd, check=False, env=env)
    for line in reversed(r.stdout.splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)["spread"]
    sys.exit(f"no bench JSON from {cwd}\n{r.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--gate", type=float, default=1.25)
    ap.add_argument("--out", default="AB_REPLAY.json")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = args.queries or sorted(
        json.load(open(os.path.join(REPO, "AB_BENCH.json")))
        ["gate_breaches"])
    if not names:
        sys.exit("nothing to adjudicate")

    wt = "/tmp/ab_replay_prior"
    sh(["git", "worktree", "remove", "--force", wt], check=False)
    sh(["git", "worktree", "add", "--detach", wt, args.ref])
    print(f"building prior ref {args.ref[:12]} ...", flush=True)
    sh(["sbt", "-batch", "compile"], cwd=wt)

    cur, pri = {}, {}
    for i in range(args.rounds):
        # PRIOR FIRST — the opposite of ab_bench's in-pair order, so an
        # in-pair warming trend now favors CURRENT; a query that still
        # reads slow under both orders is a real regression
        print(f"round {i + 1}/{args.rounds}: prior ...", flush=True)
        for q, ts in bench_isolated(wt, args.sf, args.reps, names).items():
            pri.setdefault(q, []).extend(ts)
        print(f"round {i + 1}/{args.rounds}: current ...", flush=True)
        for q, ts in bench_isolated(REPO, args.sf, args.reps, names).items():
            cur.setdefault(q, []).extend(ts)

    rows = {}
    failed = {}
    # rows one side cannot time must be REPORTED, not silently dropped —
    # else an adjudication can read as "pass" while measuring nothing:
    # no_prior = named after the prior commit (informational), no_current
    # = renamed/deleted on HEAD (the adjudication cannot conclude)
    no_prior = {q: [round(t, 3) for t in cur[q]]
                for q in sorted(set(cur) - set(pri))}
    no_current = {q: [round(t, 3) for t in pri[q]]
                  for q in sorted(set(pri) - set(cur))}
    for q in sorted(set(cur) & set(pri)):
        a = [t for t in cur[q] if t >= 0]
        b = [t for t in pri[q] if t >= 0]
        if not a or not b:
            # an all-failed side is an automatic breach, not a skip — a
            # query that regressed to a crash on current must not be
            # silently dropped from the adjudication
            failed[q] = {"side": "current" if not a else "prior",
                         "reps_current": [round(t, 3) for t in cur[q]],
                         "reps_prior": [round(t, 3) for t in pri[q]]}
            continue
        rows[q] = {"min_current": round(min(a), 3),
                   "min_prior": round(min(b), 3),
                   "min_ratio": round(min(a) / min(b), 3),
                   "reps_current": [round(t, 3) for t in cur[q]],
                   "reps_prior": [round(t, 3) for t in pri[q]]}
    breaches = {q: r["min_ratio"] for q, r in rows.items()
                if r["min_ratio"] > args.gate}
    for q, f in failed.items():
        breaches[q] = "all-reps-failed:" + f["side"]
    out = {"ref": args.ref, "sf": args.sf, "gate": args.gate,
           "order": "prior-first, isolated, alternating",
           "statistic": "min-of-all-reps",
           "rounds": args.rounds, "reps_per_round": args.reps,
           "n_queries": len(rows),
           # measuring zero ratios, or losing a flagged row on the
           # current side, is NOT a pass
           "pass": not breaches and not no_current and bool(rows),
           "gate_breaches": breaches, "failed": failed,
           "no_prior": no_prior, "no_current": no_current,
           "queries": rows}
    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"},
                     indent=1, sort_keys=True))
    print(f"wrote {path}")
    sh(["git", "worktree", "remove", "--force", wt], check=False)
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
