#!/usr/bin/env python3
"""Per-query medians across bench leg JSONs (round-16 evidence tool).

Usage: median_r16.py LEG1.json LEG2.json ...
Prints one line per query: name, per-leg seconds, median. Flags
contended legs. Exit code 1 if any leg reported failures.
"""
import json, statistics, sys

legs = []
bad = False
for p in sys.argv[1:]:
    with open(p) as f:
        line = f.readline().strip()
    if not line:
        print(f"{p}: EMPTY", file=sys.stderr)
        bad = True
        continue
    d = json.loads(line)
    if d.get("failed"):
        print(f"{p}: FAILED rows: {d['failed']}", file=sys.stderr)
        bad = True
    legs.append((p, d))

names = sorted({q for _, d in legs for q in d.get("queries", {})})
for q in names:
    vals = [d["queries"][q] for _, d in legs
            if q in d.get("queries", {}) and d["queries"][q] >= 0]
    per = "/".join(f"{v:.2f}" for v in vals)
    med = statistics.median(vals) if vals else float("nan")
    print(f"{q:38s} legs {per:>24s}  median {med:7.2f}")
for p, d in legs:
    if d.get("contended"):
        print(f"CONTENDED: {p}", file=sys.stderr)
sys.exit(1 if bad else 0)
