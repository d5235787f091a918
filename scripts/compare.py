#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare (FIXTURES.md §4).

Usage: python3 scripts/compare.py [sfDir] [verifyOut] [only_prefix...]
Runs after `sbt "runMain graft.Verify <sfDir> <verifyOut>"`.

STRICTNESS (round 2): this mirror must be AT LEAST as strict as the driver,
which loads both sides into pandas, sorts columns by name, sort_values the
frame, and hashes value reprs. Round 1's mirror normalized Decimals before
comparing — exactly the trailing-zero/scale difference the driver trips on —
so 8 queries were locally green but driver-red. Rules now:
  * NO value normalization of any kind: repr(v) must match char-for-char
    (Decimal('530.00') != Decimal('530') != 530.0).
  * dtypes must match column-for-column (int64 vs float64 is a FAIL even
    when values compare equal).
  * frames are sorted with pandas sort_values over all columns, so an
    array/map-typed output column raises exactly like the driver's comparator
    ("unhashable type: numpy.ndarray" -> reported as ERROR).
"""
import json
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3:]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")


def canon(df):
    """Driver shape: columns sorted by name, rows sorted by all columns."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def reprs(df):
    return [tuple(repr(v) for v in row) for row in df.itertuples(index=False, name=None)]


oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and not any(name.startswith(p) for p in only):
        continue
    try:
        mine = canon(con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df())
        ref = canon(con.execute(sql).df())
    except Exception as e:
        print(f"{name:28s} ERROR {type(e).__name__}: {e}")
        fails += 1
        continue
    if list(mine.columns) != list(ref.columns):
        print(f"{name:28s} COLS mine={list(mine.columns)} ref={list(ref.columns)}")
        fails += 1
        continue
    dt_m, dt_r = [str(t) for t in mine.dtypes], [str(t) for t in ref.dtypes]
    if dt_m != dt_r:
        bad = [(c, a, b) for c, a, b in zip(mine.columns, dt_m, dt_r) if a != b]
        print(f"{name:28s} DTYPE {bad}")
        fails += 1
        continue
    m, r = reprs(mine), reprs(ref)
    if m == r:
        print(f"{name:28s} OK ({len(m)} rows, dtypes {dt_m})")
    else:
        fails += 1
        diff = next((i for i, (a, b) in enumerate(zip(m, r)) if a != b), None)
        print(f"{name:28s} MISMATCH rows {len(m)} vs {len(r)} first-diff@{diff}")
        if diff is not None:
            print(f"   mine: {m[diff]}")
            print(f"   ref : {r[diff]}")
        elif len(m) != len(r):
            k = min(len(m), len(r))
            side = "mine" if len(m) > len(r) else "ref"
            print(f"   extra side: {side} -> {(m if len(m) > len(r) else r)[k]}")
print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
