#!/usr/bin/env python3
"""Render the COVERAGE.md scale-factor scaling appendix table from three
Bench full artifacts (the BENCH_FULL.json files graft.Bench writes).
Usage: python3 scripts/scaling_appendix.py sf0.001.json sf0.01.json sf0.1.json
Prints the fixed-width table plus totals and the list of queries whose
last-decade growth factor exceeds 10x (super-linear in data size).
"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)["queries"]

def main(p1, p2, p3):
    a, b, c = load(p1), load(p2), load(p3)
    names = sorted(set(a) | set(b) | set(c),
                   key=lambda n: (int("".join(ch for ch in n.split("_")[0][1:] if ch.isdigit())), n))
    w = max(len(n) for n in names) + 2
    print(f"{'query':<{w}}{'sf0.001':>9}{'sf0.01':>9}{'sf0.1':>9} x(10x data)")
    sup = []
    for n in names:
        t1, t2, t3 = a.get(n, -1), b.get(n, -1), c.get(n, -1)
        x = t3 / t2 if t2 and t2 > 0 and t3 > 0 else float("nan")
        print(f"{n:<{w}}{t1:9.2f}{t2:9.2f}{t3:9.2f}{x:12.2f}")
        if x == x and x > 10:
            sup.append((n, x))
    for nm, vals in (("sf0.001", a), ("sf0.01", b), ("sf0.1", c)):
        print(f"total {nm} = {sum(v for v in vals.values() if v > 0):.1f} s")
    if sup:
        print("SUPER-LINEAR (>10x for 10x data):")
        for n, x in sup:
            print(f"  {n}: {x:.2f}x")
    else:
        print("no query exceeds 10x growth for the last 10x data step")

if __name__ == "__main__":
    main(*sys.argv[1:4])
