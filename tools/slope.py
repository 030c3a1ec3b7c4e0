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

r13 additions:
  - `stage_of` (consumer query -> its staged-artifact bench row): a
    flagged consumer whose wall ratio is explained by its stage
    artifact's row-count growth is annotated `[candidate-driven]` — the
    candidate analog of `[output-driven]` (r12 verdict prescription #1).
  - `isolated` (query -> fresh-JVM re-measured seconds) in the BIG log:
    when present, the ratio uses the ISOLATED number (the window number
    is shown in brackets) — window rows carry up to ~3x accumulated
    JVM/page-cache state (r12 verdict prescription #2); flags fire on
    the isolated measurement only.
"""
import json, sys

def load(path):
    line = [l for l in open(path) if '"metric"' in l][0]
    return json.loads(line[line.index('{'):])

# --names-only: print just the flagged query names (one per line) —
# bench_seg.sh feeds these to the fresh-JVM isolation re-measure pass
names_only = "--names-only" in sys.argv
# --data-ratio=K: the data-volume step between the two logs (10 for a
# decade, 3 for sf10->sf30). A full-corpus operator with CONSTANT
# output (a report, a top-k, a sketch) legitimately grows ~K per step —
# outx can't defend it (output ratio 1) and flagging it buries real
# superlinear rows. With the ratio given, flagged rows at <= 1.2*K are
# annotated [corpus-linear] instead (1.2 = the same grace the
# output-driven band uses, tighter because K already includes the
# expected growth).
data_ratio = None
argv = []
for a in sys.argv[1:]:
    if a == "--names-only":
        continue
    elif a.startswith("--data-ratio="):
        data_ratio = float(a.split("=", 1)[1])
    else:
        argv.append(a)
small, big = load(argv[0]), load(argv[1])
flag = float(argv[2]) if len(argv) > 2 else 6.0
rs, rb = small.get("rows_out", {}), big.get("rows_out", {})
stage_of = {**small.get("stage_of", {}), **big.get("stage_of", {})}
iso = big.get("isolated", {})
rows = []
for q, ts in small["queries"].items():
    tb_win = big["queries"].get(q)
    if tb_win is None or ts <= 0 or tb_win <= 0:
        continue
    tb = iso.get(q, tb_win)
    if tb <= 0:
        tb = tb_win
    os_, ob = rs.get(q, -1), rb.get(q, -1)
    rows.append((tb / ts, ts, tb, tb_win, os_, ob, q))
rows.sort(reverse=True)
have_rows = any(os_ >= 0 and ob >= 0 for _, _, _, _, os_, ob, _ in rows)

def out_ratio(q):
    """rows_out ratio big/small for a query (or stage row), or None."""
    a, b = rs.get(q, -1), rb.get(q, -1)
    return (b / a) if a and a > 0 and b >= 0 else None

nflag = 0
flagged_names = []
hdr = f"{'ratio':>7} {'small':>8} {'big':>8}"
if have_rows:
    hdr += f" {'outx':>7} {'out_big':>9}"
if not names_only:
    print(hdr + "  query")
for r, ts, tb, tb_win, os_, ob, q in rows:
    outx = (ob / os_) if (os_ is not None and os_ and os_ > 0
                          and ob is not None and ob >= 0) else None
    stage_outx = out_ratio(stage_of[q]) if q in stage_of else None
    mark = ""
    if r > flag:
        if ts < 0.5:
            mark = "  [noise-floor]"
        elif outx is not None and r <= 1.5 * outx:
            mark = "  [output-driven]"
        elif stage_outx is not None and r <= 1.5 * stage_outx:
            mark = f"  [candidate-driven x{stage_outx:.1f} via {stage_of[q]}]"
        elif data_ratio is not None and r <= 1.2 * data_ratio:
            mark = "  [corpus-linear]"
        else:
            mark = "  <<< FLAG"
            nflag += 1
            flagged_names.append(q)
    if q in iso and abs(tb_win - tb) > 1e-9:
        mark += f"  [window {tb_win:.2f}s]"
    if names_only:
        continue
    line = f"{r:7.2f} {ts:8.2f} {tb:8.2f}"
    if have_rows:
        line += (f" {outx:7.2f}" if outx is not None else f" {'-':>7}")
        line += (f" {ob:9d}" if ob is not None and ob >= 0 else f" {'-':>9}")
    print(line + f"  {q}{mark}")
if names_only:
    for q in flagged_names:
        print(q)
    sys.exit(0)
print(f"\ntotals: small {small['value']:.1f}s  big {big['value']:.1f}s  "
      f"ratio {big['value']/small['value']:.2f}  flagged(>={flag}x, "
      f">=0.5s base, not output/candidate-driven): {nflag}")
print("failed small:", small["failed"], " big:", big["failed"])
