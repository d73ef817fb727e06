#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query dir in
outDir, run the matching oracle SQL from oracle_sql.json in DuckDB over the
sf tables, sort columns by name, and compare values.

Usage: check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def connect(sf_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; ScaleUp replicas are
        # spark-written directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def main(sf_dir, out_dir):
    import os
    # fresh connection per query: one long-lived connection accumulates
    # enough temp/catalog state over dozens of replica-scale oracles to
    # hit DuckDB's allocator (observed at the x10 sweep)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ran = sorted(d for d in os.listdir(out_dir)
                 if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_rows_only = 0
    for name in ran:
        con = connect(sf_dir)
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:9s} {name}: {len(got)} rows")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if a != b and not (math.isnan(a) and math.isnan(b)):
                        bad = (c, i, a, b)
                        break
                elif str(a) != str(b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL  {name}: first diff col={c} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            # dtype note (schema-match is part of the driver's gate)
            dd = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(e[c].dtype)]
            note = f"  [dtype diff: {dd}]" if dd else ""
            print(f"PASS  {name}: {len(g)} rows{note}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
