#!/usr/bin/env python3
"""Compute per-query scaling slopes from a 3-point bench sweep.

Input: a JSONL file of graft.Bench output lines (possibly prefixed
with sbt's "[info] "), one per SF dir, in sweep order
sf0.01 / sf0.1 / 3x-sf0.1. slope = log(t_3x / t_0.1) / log(3).
"""
import json, math, sys

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sweep_r5.jsonl"
runs = []
for line in open(path):
    line = line.strip()
    if not line:
        continue
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    runs.append(json.loads(line))
assert len(runs) == 3, f"want 3 bench lines, got {len(runs)}"


def flat(queries):
    # r8+: Bench's sidecar stores {"sec": t, "spread": s} per query;
    # earlier sweeps stored the bare seconds
    return {k: (v["sec"] if isinstance(v, dict) else v)
            for k, v in queries.items()}


q001, q01, q3x = (flat(r["queries"]) for r in runs)

rows = []
for k in sorted(q3x):
    a, b, c = q001.get(k), q01.get(k), q3x[k]
    # Bench records -1.0 for a query that threw; a missing key means the
    # query set changed between sweep points — both are "no slope"
    ok = b is not None and c is not None and b > 0 and c > 0
    slope = math.log(c / b) / math.log(3) if ok else float("nan")
    rows.append((k, a, b, c, slope))

def fmt(x):
    return f"{x:7.2f}" if x is not None and x >= 0 else f"{'-':>7s}"

rows.sort(key=lambda r: -(r[4] if r[4] == r[4] else -9))
print(f"{'query':30s} {'sf0.01':>7s} {'sf0.1':>7s} {'3x':>7s} {'slope':>6s}")
for k, a, b, c, s in rows:
    print(f"{k:30s} {fmt(a)} {fmt(b)} {fmt(c)} {s:6.2f}")
# match Bench's own convention: failure markers never enter totals
tot = [sum(v for v in q.values() if v >= 0) for q in (q001, q01, q3x)]
print(f"\ntotals: sf0.01={tot[0]:.1f}s sf0.1={tot[1]:.1f}s 3x={tot[2]:.1f}s")
