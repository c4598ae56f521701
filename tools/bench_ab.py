#!/usr/bin/env python
"""Same-window A/B of the driver bench between two git revisions
(VERDICT r4 item 3: the round-4 per-query regressions vs round 3 were
ambient-suspect but unproven — pure-JVM queries that no commit touched
regressed 20-56%, the same signature as round 2).

Protocol: check out revision A into a scratch worktree, leave B = the
working tree; run `python bench.py` alternately (A, B, A, B) in fresh
processes inside ONE window; report per-query best-of-2 for each side
and the ratio.  Ambient load hits both sides equally; an
engine-attributable regression shows up as a stable B/A ratio > 1.

Usage: python tools/bench_ab.py <revA> [rounds]   (B is always HEAD/worktree)
Writes BENCH/ab_<revA>_vs_head.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_bench(cwd: str) -> dict:
    env = dict(os.environ, PYTHONPATH=cwd)
    out = subprocess.run([sys.executable, os.path.join(cwd, "bench.py")],
                         env=env, cwd=cwd, capture_output=True, text=True,
                         timeout=1800)
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise RuntimeError(f"no bench output from {cwd}: "
                       f"{out.stdout[-300:]} {out.stderr[-300:]}")


def main():
    rev_a = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    wt = tempfile.mkdtemp(prefix="bench_ab_")
    subprocess.run(["git", "worktree", "add", "--detach", wt, rev_a],
                   cwd=REPO, check=True, capture_output=True)
    try:
        results = {"A": [], "B": []}
        t0 = time.time()
        for r in range(rounds):
            for side, cwd in (("A", wt), ("B", REPO)):
                res = run_bench(cwd)
                results[side].append(res)
                print(f"round {r} side {side}: headline "
                      f"{res['value']} turns/s", flush=True)
        best = {}
        for side in ("A", "B"):
            qs = {}
            for res in results[side]:
                for q, sec in res["queries"].items():
                    qs[q] = min(qs.get(q, 9e9), sec)
            best[side] = {
                "headline_tps": max(r["value"] for r in results[side]),
                "queries": qs,
            }
        ratios = {q: round(best["B"]["queries"][q] / sec, 3)
                  for q, sec in best["A"]["queries"].items()
                  if q in best["B"]["queries"]}
        summary = {
            "rev_A": rev_a,
            "rev_B": "HEAD (working tree)",
            "protocol": (f"{rounds} interleaved rounds (A,B,A,B...) of the "
                         f"full bench in one window, fresh process each, "
                         f"best-of per side; window {round(time.time()-t0)}s"),
            "A": best["A"],
            "B": best["B"],
            "headline_ratio_B_over_A": round(
                best["B"]["headline_tps"] / best["A"]["headline_tps"], 3),
            "query_sec_ratio_B_over_A": ratios,
        }
        path = os.path.join(REPO, "BENCH",
                            f"ab_{rev_a[:10]}_vs_head.json")
        with open(path, "w") as fh:
            json.dump(summary, fh, indent=2)
        print(json.dumps({k: summary[k] for k in
                          ("headline_ratio_B_over_A",)}))
        print(f"wrote {path}")
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
