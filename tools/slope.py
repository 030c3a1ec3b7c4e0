#!/usr/bin/env python3
"""Per-query scale-slope table from two Bench JSON logs.

Usage: python3 tools/slope.py LOG_SMALL LOG_BIG [flag_ratio]

Reads the one `"metric"` JSON line from each log, joins per-query times,
prints every row's ratio big/small sorted descending, and flags rows above
`flag_ratio` (default 6.0 — the round-9 verdict's root-cause threshold for
a 10x data step). Rows under 0.5s at the small SF are noise-dominated and
annotated as such rather than flagged.

When both logs carry the r12 `rows_out` key, two extra columns appear:
`outx` (output-row ratio big/small) and `s/Mrow` ratio — a flagged wall
ratio whose output ratio explains it (wall ratio <= ~1.5x the output
ratio) is annotated `[output-driven]` instead of FLAG, making the
"output growth vs plan regression" call machine-checkable instead of a
prose defense (r11 verdict prescription #4).
"""
import json, sys

def load(path):
    line = [l for l in open(path) if '"metric"' in l][0]
    return json.loads(line[line.index('{'):])

small, big = load(sys.argv[1]), load(sys.argv[2])
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
rs, rb = small.get("rows_out", {}), big.get("rows_out", {})
rows = []
for q, ts in small["queries"].items():
    tb = big["queries"].get(q)
    if tb is None or ts <= 0 or tb <= 0:
        continue
    os_, ob = rs.get(q, -1), rb.get(q, -1)
    rows.append((tb / ts, ts, tb, os_, ob, q))
rows.sort(reverse=True)
have_rows = any(os_ >= 0 and ob >= 0 for _, _, _, os_, ob, _ in rows)
nflag = 0
hdr = f"{'ratio':>7} {'small':>8} {'big':>8}"
if have_rows:
    hdr += f" {'outx':>7} {'out_big':>9}"
print(hdr + "  query")
for r, ts, tb, os_, ob, q in rows:
    outx = (ob / os_) if (os_ is not None and os_ and os_ > 0
                          and ob is not None and ob >= 0) else None
    mark = ""
    if r > flag:
        if ts < 0.5:
            mark = "  [noise-floor]"
        elif outx is not None and r <= 1.5 * outx:
            mark = "  [output-driven]"
        else:
            mark = "  <<< FLAG"
            nflag += 1
    line = f"{r:7.2f} {ts:8.2f} {tb:8.2f}"
    if have_rows:
        line += (f" {outx:7.2f}" if outx is not None else f" {'-':>7}")
        line += (f" {ob:9d}" if ob is not None and ob >= 0 else f" {'-':>9}")
    print(line + f"  {q}{mark}")
print(f"\ntotals: small {small['value']:.1f}s  big {big['value']:.1f}s  "
      f"ratio {big['value']/small['value']:.2f}  flagged(>={flag}x, "
      f">=0.5s base, not output-driven): {nflag}")
print("failed small:", small["failed"], " big:", big["failed"])
