#!/usr/bin/env python3
"""Local oracle cross-check: run graft.Verify output vs DuckDB on the same
parquet tables, mimicking the driver's compare (columns sorted by name,
row-order-independent, exact values AND exact arrow types).

Round-1 lesson: the driver's hash is type-strict — Spark sum(decimal(18,2))
-> DECIMAL(28,2) vs DuckDB -> DECIMAL(38,2) flips hash_match false even when
every value agrees. So this script compares arrow schema types verbatim and
does NOT normalize decimals or round floats."""
import duckdb, json, sys, glob, os

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
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", str(v))
    # Decimal, str, date, datetime, bytes, lists... exact string form.
    return (type(v).__name__, str(v))

def canon(tbl):
    names = [f.name for f in tbl.schema]
    types = {f.name: str(f.type) for f in tbl.schema}
    order = sorted(names)
    rows = tbl.to_pylist()
    return sorted(tuple(norm(r[c]) for c in order) for r in rows), order, types

fails = []
for name in sorted(oracle):
    if only and name not in only: continue
    pq = f"{out_dir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"MISSING {name}"); fails.append(name); continue
    sa = con.execute(f"SELECT * FROM '{pq}/*.parquet'").arrow()
    try:
        da = con.execute(oracle[name]).arrow()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {str(e).splitlines()[0][:150]}"); fails.append(name); continue
    s, sc, st = canon(sa)
    d, dc, dt = canon(da)
    if sc != dc:
        print(f"COLS {name}: spark={sc} duck={dc}"); fails.append(name); continue
    tdiff = {c: (st[c], dt[c]) for c in sc if st[c] != dt[c]}
    if tdiff:
        print(f"TYPE {name}: " + ", ".join(f"{c}: spark={a} duck={b}" for c, (a, b) in tdiff.items()))
        fails.append(name); continue
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
