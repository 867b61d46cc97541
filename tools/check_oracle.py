#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries against DuckDB oracles.

Mimics the driver's correctness gate: run graft.Verify at a given sf
dir, then for each query with an oracle, run the oracle SQL in DuckDB
over the same parquet tables and compare (rows, schema-by-name, and
values with columns sorted by name).

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
(assumes Verify has already been run into <verify_outdir>)
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{files[0]}'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM '{files[0]}'").fetchall()
            want = con.sql(oracle[name])
            want_cols = sorted(want.columns)
            want_rows = con.sql(
                f"SELECT {', '.join(want_cols)} FROM ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: schema {got_cols} != {want_cols}")
            n_bad += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            n_bad += 1
            continue
        mism = None
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            gn = tuple(norm(x) for x in g)
            wn = tuple(norm(x) for x in w)
            if gn != wn:
                mism = (i, gn, wn)
                break
        if mism:
            i, g, w = mism
            print(f"FAIL {name}: row {i}: got {g} != want {w}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
            n_ok += 1
    # rows-only queries: just check they produced rows
    ora = set(oracle)
    for path in sorted(glob.glob(f"{outdir}/*/")):
        name = path.rstrip("/").split("/")[-1]
        if name in ora:
            continue
        files = glob.glob(f"{path}/*.parquet")
        n = con.sql(f"SELECT count(*) FROM '{files[0]}'").fetchone()[0] if files else 0
        print(f"ROWS {name}: {n}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
