#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare (FIXTURES.md §4).

Usage: python3 scripts/compare.py [sfDir] [verifyOut] [only_prefix...]
Runs after `sbt "runMain graft.Verify <sfDir> <verifyOut>"`.
"""
import duckdb, json, math, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3:]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(v):
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("dec", str(v.normalize()))
    except Exception:
        pass
    return v

def normrow(r):
    return tuple(norm(v) for v in r)

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and not any(name.startswith(p) for p in only):
        continue
    try:
        mine_rel = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        mine_cols = [d[0] for d in mine_rel.description]
        mine = mine_rel.fetchall()
        ref_rel = con.execute(sql)
        ref_cols = [d[0] for d in ref_rel.description]
        ref = ref_rel.fetchall()
    except Exception as e:
        print(f"{name:28s} ERROR {e}")
        fails += 1
        continue
    # driver sorts columns by name before hashing -> compare column-name-sorted
    mi = [i for _, i in sorted((c, i) for i, c in enumerate(mine_cols))]
    ri = [i for _, i in sorted((c, i) for i, c in enumerate(ref_cols))]
    m = [normrow([r[i] for i in mi]) for r in mine]
    f = [normrow([r[i] for i in ri]) for r in ref]
    if sorted(mine_cols) != sorted(ref_cols):
        print(f"{name:28s} COLS mine={sorted(mine_cols)} ref={sorted(ref_cols)}")
        fails += 1
    elif m == f:
        print(f"{name:28s} OK ({len(m)} rows)")
    else:
        fails += 1
        diff = next((i for i, (a, b) in enumerate(zip(m, f)) if a != b), None)
        print(f"{name:28s} MISMATCH rows {len(m)} vs {len(f)} first-diff@{diff}")
        if diff is not None:
            print(f"   mine: {m[diff]}")
            print(f"   ref : {f[diff]}")
        elif len(m) != len(f):
            k = min(len(m), len(f))
            print(f"   extra side: {'mine' if len(m) > len(f) else 'ref'} -> {(m + f)[k] if False else (m[k] if len(m) > len(f) else f[k])}")
print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
