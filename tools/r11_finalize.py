#!/usr/bin/env python3
"""Round-11 window summary: slope tables + flags from the three take-2
suite artifacts. Prints the README-ready markdown."""
import json, statistics

def load(p):
    return json.loads([l for l in open(p) if '"metric"' in l][0])

b = "/root/repo/bench/"
s01, s1, s10 = (load(b + f"BENCH_r11_{n}.json") for n in ("sf0.1", "sf1", "sf10"))

def pair(small, big, lo, hi, flag=6.0, floor=0.5):
    qs, qb = small["queries"], big["queries"]
    rows = [(qb[k] / qs[k], qs[k], qb[k], k)
            for k in qb if k in qs and qs[k] > 0 and qb[k] > 0]
    med = statistics.median(r for r, *_ in rows)
    print(f"\n### {lo} -> {hi}: {len(rows)} rows, "
          f"median slope {med:.2f}x, "
          f"totals {sum(x[1] for x in rows):.0f}s -> {sum(x[2] for x in rows):.0f}s")
    print(f"| slope | {lo} s | {hi} s | query |\n|---|---|---|---|")
    for r, a, bb, k in sorted(rows, reverse=True):
        if r > flag and a >= floor:
            print(f"| {r:.1f}x | {a:.2f} | {bb:.2f} | {k} |")

print("failed sf0.1:", s01["failed"], " sf1:", s1["failed"], " sf10:", s10["failed"])
pair(s01, s1, "sf0.1", "sf1")
pair(s1, s10, "sf1", "sf10")
