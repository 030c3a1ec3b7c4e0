#!/usr/bin/env python3
"""Regenerate README's suite-index table (dev tooling, driver-side deps
only): result-row counts from a Verify outDir + per-query seconds from a
Bench JSON, rendered as the two-column markdown table.

Usage: python3 tools/gen_index.py <verify_outdir> <bench_json>
Prints the table to stdout; paste into README under "Suite index".
"""
import glob
import json
import math
import os
import sys

import duckdb


def qnum(name):
    return int(name[1:].split("_")[0])


def main(out_dir, bench_json):
    bench = json.load(open(bench_json))["queries"]
    con = duckdb.connect()
    rows = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            # a query with no written result must not silently vanish
            # from the README table — flag it loudly
            print(f"WARNING: {name}: no parquet result in {d}; "
                  "EXCLUDED from index", file=sys.stderr)
            continue
        # path via a bound parameter, never interpolated into the SQL
        n = con.execute(
            "SELECT count(*) FROM read_parquet(?)", [f"{d}/*.parquet"]
        ).fetchone()[0]
        rows[name] = n
    names = sorted(rows, key=qnum)
    half = math.ceil(len(names) / 2)
    left, right = names[:half], names[half:]
    print("| query | rows (sf0.01) | sf0.1 sec | | query | rows (sf0.01)"
          " | sf0.1 sec |")
    print("|---|---|---|---|---|---|---|")
    for i in range(half):
        def cell(ns, i):
            if i >= len(ns):
                return " | | "
            n = ns[i]
            sec = bench.get(n)
            if isinstance(sec, (int, float)) and sec < 0:
                # Bench's "query threw" sentinel — a failure must not
                # render as a plausible timing
                print(f"WARNING: {n}: bench sec={sec} (query threw); "
                      "rendered as '-'", file=sys.stderr)
                sec = None
            s = f"{sec:.1f}" if isinstance(sec, (int, float)) else "-"
            return f"{n} | {rows[n]} | {s}"
        print(f"| {cell(left, i)} | | {cell(right, i)} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
