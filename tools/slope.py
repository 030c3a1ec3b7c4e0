#!/usr/bin/env python3
"""Per-query scale-slope table from two Bench JSON logs.

Usage: python3 tools/slope.py LOG_SMALL LOG_BIG [flag_ratio]

Reads the one `"metric"` JSON line from each log, joins per-query times,
prints every row's ratio big/small sorted descending, and flags rows above
`flag_ratio` (default 6.0 — the round-9 verdict's root-cause threshold for
a 10x data step). Rows under 0.5s at the small SF are noise-dominated and
annotated as such rather than flagged.
"""
import json, sys

def load(path):
    line = [l for l in open(path) if '"metric"' in l][0]
    return json.loads(line[line.index('{'):])

small, big = load(sys.argv[1]), load(sys.argv[2])
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
rows = []
for q, ts in small["queries"].items():
    tb = big["queries"].get(q)
    if tb is None or ts <= 0 or tb <= 0:
        continue
    rows.append((tb / ts, ts, tb, q))
rows.sort(reverse=True)
nflag = 0
print(f"{'ratio':>7} {'small':>8} {'big':>8}  query")
for r, ts, tb, q in rows:
    mark = ""
    if r > flag:
        mark = "  [noise-floor]" if ts < 0.5 else "  <<< FLAG"
        if ts >= 0.5:
            nflag += 1
    print(f"{r:7.2f} {ts:8.2f} {tb:8.2f}  {q}{mark}")
print(f"\ntotals: small {small['value']:.1f}s  big {big['value']:.1f}s  "
      f"ratio {big['value']/small['value']:.2f}  flagged(>={flag}x, "
      f">=0.5s base): {nflag}")
print("failed small:", small["failed"], " big:", big["failed"])
