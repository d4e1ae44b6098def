#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sfDir parquet tables, compare with the Spark parquet dump
from graft.Verify (column names sorted, rows sorted, values stringified).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)

def table_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            bad += 1
            continue
        cur = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in cur.description]
        srows = cur.fetchall()
        oc, orr = table_canon(ocols, orows)
        sc, srr = table_canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            bad += 1
            continue
        if orr != srr:
            print(f"FAIL {name}: rows differ (oracle {len(orr)} vs spark "
                  f"{len(srr)})")
            for i, (a, b) in enumerate(zip(orr, srr)):
                if a != b:
                    print(f"  first diff at {i}:\n   oracle: {a}\n   spark:  {b}")
                    break
            else:
                n = min(len(orr), len(srr))
                print(f"  extra rows from {n}: "
                      f"{orr[n:n+2] if len(orr)>n else srr[n:n+2]}")
            bad += 1
            continue
        print(f"OK   {name}: {len(srr)} rows")
        ok += 1
    print(f"== {ok} ok, {bad} fail")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
