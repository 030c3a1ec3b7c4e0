#!/usr/bin/env python3
"""Oracle output-type lint (dev tooling): flag result columns whose DuckDB
type can hash differently in the driver's comparator than the Spark parquet
value (HUGEINT -> float64 in pandas, DECIMAL -> object, unsigned ints,
INTERVAL), and any oracle-vs-spark column type mismatch.

Rule (README + verify skill): every oracle SELECT boundary must emit only
BIGINT / INTEGER / DOUBLE / VARCHAR / BOOLEAN / DATE / TIMESTAMP (arrays
stringified). INTEGER is safe ONLY when both sides agree (DuckDB INTEGER and
Spark INT both surface as int32 in the comparator — six rounds of green
hash_match on q32/q38/q5x INT columns prove it); the cross-side mismatch
check below still flags INTEGER-vs-BIGINT.

Run after Verify: python3 tools/typesweep.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, os, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# DuckDB types that survive the driver's comparator unchanged (INTEGER:
# int32 on both sides, see header — mismatch vs BIGINT still flags below).
SAFE = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "INTEGER",
        "TIMESTAMP", "TIMESTAMP WITH TIME ZONE"}
# Spark parquet logical types we accept on the result side.
SPARK_SAFE = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "INTEGER",
              "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS"}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_flag = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            odesc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FLAG {name}: oracle DESCRIBE error: {e}")
            n_flag += 1
            continue
        otypes = {r[0]: r[1] for r in odesc}
        stypes = {}
        res_glob = os.path.join(out_dir, name, "*.parquet")
        if glob.glob(res_glob):
            sdesc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{res_glob}')").fetchall()
            stypes = {r[0]: r[1] for r in sdesc}
        for col, typ in otypes.items():
            base = typ.split("(")[0].strip()
            if base not in SAFE:
                print(f"FLAG {name}.{col}: oracle type {typ}")
                n_flag += 1
        for col, typ in stypes.items():
            base = typ.split("(")[0].strip()
            if base not in SPARK_SAFE:
                print(f"FLAG {name}.{col}: spark result type {typ}")
                n_flag += 1
        # cross-side mismatch (INTEGER vs BIGINT etc. hash as different
        # numpy dtypes in a pandas-based comparator)
        for col in sorted(set(otypes) & set(stypes)):
            ob, sb = otypes[col].split("(")[0], stypes[col].split("(")[0]
            norm = {"TIMESTAMP_NS": "TIMESTAMP",
                    "TIMESTAMP WITH TIME ZONE": "TIMESTAMP"}
            if norm.get(ob, ob) != norm.get(sb, sb):
                print(f"FLAG {name}.{col}: oracle {otypes[col]} "
                      f"!= spark {stypes[col]}")
                n_flag += 1
    print(f"\n{n_flag} flags over {len(oracle)} oracles")
    return 1 if n_flag else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
