#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not
part of the library): run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Compares each <outDir>/<name> parquet result against its DuckDB oracle over
the same sf tables: columns sorted by name, rows sorted, exact value
compare (floats also reported with tolerance so we can tell real logic
errors from last-ulp noise).
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(map(repr, t)))

def eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

def approx(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(approx(x, y, tol) for x, y in zip(a, b))
    return eq(a, b)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(only or oracle):
        sql = oracle[name]
        res_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark result written"); n_bad += 1
            continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1
            continue
        g = con.execute(f"SELECT * FROM read_parquet('{res_glob}')")
        gcols = [d[0] for d in g.description]
        grows = g.fetchall()
        oc, orows2 = canon(orows, ocols)
        gc, grows2 = canon(grows, gcols)
        if oc != gc:
            print(f"FAIL {name}: columns {gc} != oracle {oc}"); n_bad += 1
            continue
        if len(orows2) != len(grows2):
            print(f"FAIL {name}: {len(grows2)} rows != oracle {len(orows2)}")
            n_bad += 1
            continue
        exact = all(all(eq(a, b) for a, b in zip(gr, orow))
                    for gr, orow in zip(grows2, orows2))
        if exact:
            print(f"OK   {name} ({len(grows2)} rows)"); n_ok += 1
        else:
            near = all(all(approx(a, b) for a, b in zip(gr, orow))
                       for gr, orow in zip(grows2, orows2))
            bad = next((i, gr, orow) for i, (gr, orow)
                       in enumerate(zip(grows2, orows2))
                       if not all(eq(a, b) for a, b in zip(gr, orow)))
            tag = "NEAR" if near else "FAIL"
            print(f"{tag} {name}: first diff row {bad[0]}:")
            print(f"   spark : {bad[1]}")
            print(f"   oracle: {bad[2]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sys.exit(main(sf, out, only))
