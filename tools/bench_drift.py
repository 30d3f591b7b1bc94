#!/usr/bin/env python3
"""Dev-only bench drift report: compare two bench_full sidecars.

Usage: python3 tools/bench_drift.py <old.json> <new.json> [ratio_gate]

Prints per-query rows where new/old exceeds the gate (default 2.0)
and new >= 1s, plus totals. Spread columns let a reader separate a
code regression from scheduler noise: a delta smaller than either
run's spread is noise (PLANS.md drift protocol).
"""
import json
import sys


def main() -> int:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    qo, qn = old["queries"], new["queries"]
    print(f"old total {old['total']:.1f}s ({len(qo)} queries)  "
          f"new total {new['total']:.1f}s ({len(qn)} queries)")
    # keys present in only one run are drift too (a silently-skipped
    # key reads as "no regression" when it was never compared), as are
    # error markers (sec < 0)
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"only in OLD ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in NEW ({len(only_new)}): {', '.join(only_new)}")
    for side, qs in (("OLD", qo), ("NEW", qn)):
        errs = {k: v.get("err", "") for k, v in qs.items() if v["sec"] < 0}
        for k, e in sorted(errs.items()):
            print(f"{side} error: {k}" + (f" — {e}" if e else ""))
    rows = []
    for k, v in qn.items():
        if k not in qo or qo[k]["sec"] <= 0 or v["sec"] < 1.0:
            continue
        ratio = v["sec"] / qo[k]["sec"]
        if ratio > gate:
            rows.append((k, qo[k]["sec"], qo[k].get("spread", -1),
                         v["sec"], v.get("spread", -1), ratio))
    rows.sort(key=lambda r: -r[5])
    if not rows:
        print(f"no query drifted past {gate}x (new>=1s)")
        return 0
    print(f"{'query':35s} {'old':>7s} {'o.spr':>7s} {'new':>7s} "
          f"{'n.spr':>7s} {'x':>5s}")
    for k, a, asp, b, bsp, r in rows:
        print(f"{k:35s} {a:7.2f} {asp:7.2f} {b:7.2f} {bsp:7.2f} {r:5.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
