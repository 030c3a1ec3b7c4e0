#!/usr/bin/env python3
"""Paired A/B comparison over interleaved bench legs (round 16).

Usage: ab_pair.py bench/r16/ab_TAG NPAIRS
Reads ab_TAG_A_leg{i}.json / ab_TAG_B_leg{i}.json, prints per-query:
A-leg seconds, B-leg seconds, per-pair B/A ratios, median ratio.
Ratio < 1 means B is faster.
"""
import json, statistics, sys

base, n = sys.argv[1], int(sys.argv[2])

def load(v, i):
    try:
        with open(f"{base}_{v}_leg{i}.json") as f:
            d = json.loads(f.readline())
        if d.get("contended"):
            print(f"WARN contended: {v} leg {i}", file=sys.stderr)
        return d.get("queries", {})
    except Exception as e:
        print(f"WARN missing {v} leg {i}: {e}", file=sys.stderr)
        return {}

pairs = [(load("A", i), load("B", i)) for i in range(1, n + 1)]
names = sorted({q for a, b in pairs for q in a})
for q in names:
    ratios, av, bv = [], [], []
    for a, b in pairs:
        if q in a and q in b and a[q] > 0 and b[q] > 0:
            ratios.append(b[q] / a[q])
            av.append(a[q]); bv.append(b[q])
    if not ratios:
        continue
    astr = "/".join(f"{v:.1f}" for v in av)
    bstr = "/".join(f"{v:.1f}" for v in bv)
    rstr = "/".join(f"{r:.2f}" for r in ratios)
    print(f"{q:38s} A {astr:>18s}  B {bstr:>18s}  B/A {rstr:>18s}"
          f"  med {statistics.median(ratios):.2f}")
