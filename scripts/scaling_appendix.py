#!/usr/bin/env python3
"""Render the COVERAGE.md scale-factor scaling appendix table from N
Bench full artifacts (the BENCH_FULL.json files graft.Bench writes), in
ascending SF order. Usage:
  python3 scripts/scaling_appendix.py sf0.001.json sf0.01.json sf0.1.json [sf1.json]
Prints the fixed-width table (growth factor = last decade, i.e. the
ratio of the last two artifacts), totals, and the list of queries whose
last-decade growth factor exceeds 10x (super-linear in data size).
"""
import json, sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    label = d.get("sf", p).rstrip("/").split("/")[-1].replace("graft_", "")
    return label, d["queries"]


def main(*paths):
    arts = [load(p) for p in paths]
    names = sorted(set().union(*(q for _, q in arts)),
                   key=lambda n: (int("".join(ch for ch in n.split("_")[0][1:] if ch.isdigit())), n))
    w = max(len(n) for n in names) + 2
    hdr = "".join(f"{lbl:>9}" for lbl, _ in arts)
    print(f"{'query':<{w}}{hdr} x(10x data)")
    sup = []
    la, lb = arts[-2][1], arts[-1][1]
    for n in names:
        row = "".join(f"{q.get(n, -1):9.2f}" for _, q in arts)
        t2, t3 = la.get(n, -1), lb.get(n, -1)
        x = t3 / t2 if t2 and t2 > 0 and t3 > 0 else float("nan")
        print(f"{n:<{w}}{row}{x:12.2f}")
        if x == x and x > 10:
            sup.append((n, x))
    for lbl, vals in arts:
        print(f"total {lbl} = {sum(v for v in vals.values() if v > 0):.1f} s")
    if sup:
        print("SUPER-LINEAR (>10x for 10x data):")
        for n, x in sup:
            print(f"  {n}: {x:.2f}x")
    else:
        print("no query exceeds 10x growth for the last 10x data step")


if __name__ == "__main__":
    main(*sys.argv[1:])
