#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query dir in
outDir, run the matching oracle SQL from oracle_sql.json in DuckDB over the
sf tables, sort columns by name, and compare values.

Usage: check_oracle.py <sfDir> <outDir>

Also importable: check(sf_dir, out_dir, names=None) returns
{name: (status, detail)} with status in {"pass", "fail", "rows_only"} —
tools/scalecheck.py builds its replica-scale gate on this.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def connect(sf_dir):
    con = duckdb.connect()
    # bound the allocator explicitly: DuckDB's default (80% of RAM) lets a
    # borderline oracle plan balloon nondeterministically under thread
    # parallelism — observed as a bad-allocation OOM on a replica-scale
    # ANN oracle that passes cleanly under a fixed budget. 64G clears the
    # hungriest oracle (graph_pagerank's 10 chained CTE rounds pin ~38G at
    # the x10 replica) with bounded headroom.
    con.execute("SET memory_limit='64GB'")
    con.execute("SET threads=16")
    for t in TABLES:
        # driver testdata is one file per table; ScaleUp replicas are
        # spark-written directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def check_one(con, oracle, out_dir, name):
    """Compare one query dir against its oracle. Returns (status, detail)."""
    try:
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        return "fail", f"cannot read spark output: {e}"
    if name not in oracle:
        if len(got) > 0:
            return "rows_only", f"{len(got)} rows"
        return "rows_only", "0 rows (ROWS-ONLY-EMPTY!)"
    retried = ""
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        if "Out of Memory" not in str(e):
            return "fail", f"oracle SQL error: {str(e).splitlines()[0]}"
        # DuckDB's allocator occasionally trips on a borderline plan under
        # 16-thread parallelism (observed: emb_dup_lsh_wide at the x10
        # replica — the identical SQL returns the identical frame at 8
        # threads). Lower parallel state means lower peak hash-table
        # memory for the same plan; ONE retry, annotated, so a genuine
        # over-limit oracle still fails loudly.
        try:
            con.execute("SET threads=4")
            exp = con.execute(oracle[name]).df()
            retried = "  [oracle retried at 4 threads after OOM]"
        except Exception as e2:
            return "fail", f"oracle SQL error: {str(e2).splitlines()[0]}"
        finally:
            # restore full parallelism: check() hands each query a fresh
            # connection, but an importer sharing a connection must not
            # have every LATER oracle silently degraded to 4 threads
            # (which would also mask genuine over-limit plans — they could
            # no longer OOM and would carry no annotation)
            try:
                con.execute("SET threads=16")
            except Exception:
                pass
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        return "fail", f"columns {list(g.columns)} vs {list(e.columns)}"
    if len(g) != len(e):
        return "fail", f"rows {len(g)} vs {len(e)}"
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b and not (math.isnan(a) and math.isnan(b)):
                    return "fail", f"first diff col={c} row={i}: spark={a!r} oracle={b!r}"
            elif str(a) != str(b):
                return "fail", f"first diff col={c} row={i}: spark={a!r} oracle={b!r}"
    # dtype note (schema-match is part of the driver's gate)
    dd = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
          if str(g[c].dtype) != str(e[c].dtype)]
    note = f"{len(g)} rows" + (f"  [dtype diff: {dd}]" if dd else "") + retried
    return "pass", note


def check(sf_dir, out_dir, names=None, quiet=False):
    """Check every (or the named subset of) query dirs in out_dir against
    their oracles on sf_dir's tables. Returns {name: (status, detail)}."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ran = sorted(d for d in os.listdir(out_dir)
                 if os.path.isdir(f"{out_dir}/{d}"))
    if names is not None:
        ran = [n for n in ran if n in set(names)]
    results = {}
    label = {"pass": "PASS ", "fail": "FAIL ", "rows_only": "ROWS-ONLY"}
    for name in ran:
        # fresh connection per query, closed explicitly: one long-lived
        # connection accumulates enough temp/catalog state over dozens of
        # replica-scale oracles to hit DuckDB's allocator (observed at the
        # x10 sweep), and leaving cleanup to refcounting re-creates the
        # same pressure under exceptions / other interpreters. connect()
        # itself stays inside the guard — a connect-time failure must fail
        # THIS query, not kill the remaining sweep.
        con = None
        try:
            con = connect(sf_dir)
            results[name] = check_one(con, oracle, out_dir, name)
        except Exception as e:
            results[name] = ("fail", f"checker error: {str(e).splitlines()[0]}")
        finally:
            if con is not None:
                con.close()
        if not quiet:
            st, detail = results[name]
            print(f"{label[st]:9s} {name}: {detail}", flush=True)
    return results


def check_isolated(sf_dir, out_dir, name, timeout_sec=1800):
    """Re-check ONE query in a fresh python subprocess.

    A DuckDB query that dies at the allocator ("bad allocation") can leave
    the PROCESS heap poisoned — observed at the x10 sweep: after one
    borderline oracle OOM'd, even fresh connect() calls in the same
    interpreter failed to allocate 2 KB, cascading 100+ spurious FAILs.
    Per-query connections (already in place) don't help because the damage
    is process-level, so the retry must be process-level too."""
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__),
           "--one", name, sf_dir, out_dir]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_sec)
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("{"):
                v = json.loads(line)
                return v["status"], v["detail"]
        return "fail", f"isolated checker produced no verdict (rc={r.returncode})"
    except subprocess.TimeoutExpired:
        return "fail", f"isolated checker timed out after {timeout_sec}s"


def main(sf_dir, out_dir):
    results = check(sf_dir, out_dir)
    n_pass = sum(1 for s, _ in results.values() if s == "pass")
    n_fail = sum(1 for s, _ in results.values() if s == "fail")
    n_rows_only = sum(1 for s, _ in results.values() if s == "rows_only")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "--one":
        # single-query subprocess mode for check_isolated: last stdout line
        # is a JSON verdict
        name, sf, out = sys.argv[2], sys.argv[3], sys.argv[4]
        res = check(sf, out, names=[name], quiet=True)
        st, detail = res.get(name, ("fail", "query dir not found"))
        print(json.dumps({"status": st, "detail": detail}))
        sys.exit(0 if st == "pass" else 1)
    sys.exit(main(sys.argv[1], sys.argv[2]))
