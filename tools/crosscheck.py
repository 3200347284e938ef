#!/usr/bin/env python3
"""Local oracle cross-check: run graft.Verify output vs DuckDB on the same
parquet tables, mimicking the driver's compare (columns sorted by name,
row-order-independent, exact values)."""
import duckdb, json, sys, glob, os
from decimal import Decimal

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_out"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if v is None:
        return ("z_none", "")
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(round(v, 9)))
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, int):
        return ("i", str(v))
    return ("s", str(v))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows), [cols[i] for i in order]

fails = []
for name in sorted(oracle):
    if only and name not in only: continue
    pq = f"{out_dir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"MISSING {name}"); fails.append(name); continue
    sr = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
    scols = [d[0] for d in sr.description]; srows = sr.fetchall()
    try:
        dr = con.execute(oracle[name])
        dcols = [d[0] for d in dr.description]; drows = dr.fetchall()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {str(e).splitlines()[0][:150]}"); fails.append(name); continue
    s, sc = canon(scols, srows)
    d, dc = canon(dcols, drows)
    if sc != dc:
        print(f"COLS {name}: spark={sc} duck={dc}"); fails.append(name); continue
    if s == d:
        print(f"OK   {name} ({len(s)} rows)")
    else:
        fails.append(name)
        print(f"DIFF {name}: spark {len(s)} rows vs duck {len(d)} rows; cols={sc}")
        sset, dset = set(s), set(d)
        for r in list(sset - dset)[:3]: print(f"   spark-only: {r}")
        for r in list(dset - sset)[:3]: print(f"   duck-only:  {r}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} matched" + (f"; FAILED: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
