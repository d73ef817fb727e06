#!/usr/bin/env python3
"""Replica-scale gate for the output-quadratic exact pair family
(dedup_prefix_join, dedup_clusters_exact, dedup_pair_recall) — the queries
tools/scalecheck.py skips at copies >= 5 because their canonical one-shot
DuckDB oracle (a single hash aggregate over EVERY shingle-sharing doc
pair) exceeds the allocator on a x10 duplicate-dense replica (VERDICT r9
stretch ask #8).

Strategy:
  ENGINE side — graft.Verify runs the three queries on the replica
  unchanged: the Spark plans ARE the oracled semantics.
  ORACLE side — the same pair computation, memory-bounded by doc_a chunk:
  materialize the shingle-set derivation once (temp tables), aggregate
  intersections one doc_a residue class at a time (peak hash-table state
  ~1/chunks of the one-shot plan), accumulate into a __pairs temp table,
  then run the downstream SQL (threshold join / recursive CC / recall
  report) taken VERBATIM from oracle_sql.json with its embedded pair
  derivation swapped for __pairs.
  EQUIVALENCE — before scaling, the chunked oracle is self-checked
  against the canonical one-shot SQL on the base dir, where both fit:
  any frame difference aborts the gate. Chunking only partitions the
  aggregate's GROUP BY space into disjoint doc_a classes, so equality is
  expected by construction; the self-check turns that into evidence.

Usage:
  python3 tools/paircheck.py [--copies 10] [--src /root/testdata/sf0.1]
      [--dst target/scale_x10] [--chunks 16] [--cpus 16]
      [--out SCALECHECK_x10_pairs.json] [--skip-verify] [--mem 40GB]
"""
import argparse
import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, norm                       # noqa: E402
from scalecheck import REPO, run_sbt, parse_times           # noqa: E402

QUERIES = ["dedup_prefix_join", "dedup_clusters_exact", "dedup_pair_recall"]


def connect(sf_dir, mem, threads):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def build_pairs(con, oracle, chunks):
    """Materialize the exact >= 0.3 Jaccard pair set into a __pairs temp
    table, one doc_a residue class per aggregate. The shingle derivation
    (tok/sh CTE text) is lifted verbatim from the canonical oracle so the
    two stay one source of truth."""
    sql0 = oracle["dedup_prefix_join"]
    prelude = sql0.split("\nsz AS", 1)[0]   # "WITH tok AS (...),\nsh AS (...),"
    prelude = prelude.rstrip().rstrip(",")
    assert prelude.startswith("WITH "), "unexpected prefix-join oracle shape"
    con.execute(f"CREATE TEMP TABLE __sh AS {prelude}\nSELECT doc_id, hs FROM sh")
    con.execute("CREATE TEMP TABLE __sz AS SELECT doc_id, len(hs) AS sz FROM __sh")
    con.execute("CREATE TEMP TABLE __ex AS SELECT doc_id, unnest(hs) AS h FROM __sh")
    con.execute("CREATE TEMP TABLE __pairs (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)")
    for c in range(chunks):
        con.execute(f"""INSERT INTO __pairs
          WITH inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              count(*) AS i
            FROM __ex a JOIN __ex b ON a.h = b.h AND a.doc_id < b.doc_id
            WHERE (a.doc_id % {chunks}) = {c}
            GROUP BY 1, 2)
          SELECT doc_a, doc_b,
            round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4)
          FROM inter JOIN __sz sa ON sa.doc_id = inter.doc_a
          JOIN __sz sb ON sb.doc_id = inter.doc_b
          WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.3""")


def chunked_frames(con, oracle):
    """The three queries' oracle frames, downstream SQL verbatim from
    oracle_sql.json with the pair derivation swapped for __pairs."""
    frames = {}
    frames["dedup_prefix_join"] = con.execute(
        "SELECT doc_a, doc_b, jaccard FROM __pairs ORDER BY doc_a, doc_b").df()
    cl = oracle["dedup_clusters_exact"]
    assert "edges AS" in cl, "unexpected clusters oracle shape"
    cl2 = ("WITH RECURSIVE good AS (SELECT doc_a, doc_b FROM __pairs),\n"
           + cl[cl.index("edges AS"):])
    frames["dedup_clusters_exact"] = con.execute(cl2).df()
    rc = oracle["dedup_pair_recall"]
    rc2 = rc.replace(oracle["dedup_prefix_join"],
                     "SELECT doc_a, doc_b, jaccard FROM __pairs")
    assert rc2 != rc, "recall oracle no longer embeds the prefix-join text"
    frames["dedup_pair_recall"] = con.execute(rc2).df()
    return frames


def compare(got, exp):
    """check_oracle.check_one's frame compare, against an in-memory
    expected frame instead of an oracle statement."""
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        return "fail", f"columns {list(g.columns)} vs {list(e.columns)}"
    if len(g) != len(e):
        return "fail", f"rows {len(g)} vs {len(e)}"
    for c in g.columns:
        for i, (a, b) in enumerate(zip(g[c].tolist(), e[c].tolist())):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b and not (math.isnan(a) and math.isnan(b)):
                    return "fail", f"first diff col={c} row={i}: {a!r} vs {b!r}"
            elif str(a) != str(b):
                return "fail", f"first diff col={c} row={i}: {a!r} vs {b!r}"
    return "pass", f"{len(g)} rows"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=None)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--mem", default="40GB")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-verify", action="store_true",
                    help="reuse existing base/replica Verify outputs")
    args = ap.parse_args()

    dst = args.dst or f"{REPO}/target/scale_x{args.copies}"
    out_file = args.out or f"{REPO}/SCALECHECK_x{args.copies}_pairs.json"
    base_out = f"{REPO}/target/paircheck_base"
    repl_out = f"{REPO}/target/paircheck_replica_x{args.copies}"
    qlist = ",".join(QUERIES)
    env = {"SPARK_GRAFT_CPUS": args.cpus}

    have = all(os.path.exists(f"{dst}/{t}.parquet") for t in TABLES)
    if not have:
        run_sbt(f"graft.tools.ScaleUp {args.src} {dst} {args.copies}",
                log_name=f"{REPO}/target/paircheck_scaleup.log")

    # logs are stamped by --copies (like scalecheck's base_log/repl_log):
    # a --copies 10 run followed by --copies 30 --skip-verify must not read
    # the smaller run's timings, and the skip path only engages when BOTH
    # logs and the replica Verify output actually exist for THIS copies
    base_log = f"{REPO}/target/paircheck_base_x{args.copies}.log"
    repl_log = f"{REPO}/target/paircheck_replica_x{args.copies}.log"
    reusable = (args.skip_verify
                and os.path.exists(f"{base_out}/oracle_sql.json")
                and os.path.exists(base_log) and os.path.exists(repl_log)
                and all(os.path.exists(f"{repl_out}/{q}") for q in QUERIES))
    if args.skip_verify and not reusable:
        print("--skip-verify: prior outputs/logs incomplete for "
              f"x{args.copies}; running Verify", flush=True)
    if reusable:
        t_base = parse_times(open(base_log).read())
        t_repl = parse_times(open(repl_log).read())
    else:
        so = run_sbt(f"graft.Verify {args.src} {base_out} {qlist}", env,
                     log_name=base_log)
        t_base = parse_times(so)
        so = run_sbt(f"graft.Verify {dst} {repl_out} {qlist}", env,
                     log_name=repl_log)
        t_repl = parse_times(so)

    oracle = json.load(open(f"{base_out}/oracle_sql.json"))

    # 1. base self-check: chunked oracle == canonical one-shot oracle
    results = {}
    print("== base self-check: chunked vs canonical ==", flush=True)
    con = connect(args.src, args.mem, args.threads)
    build_pairs(con, oracle, args.chunks)
    for name, frame in chunked_frames(con, oracle).items():
        canon = con.execute(oracle[name]).df()
        st, detail = compare(frame, canon)
        print(f"{st:5s} chunked≡canonical {name}: {detail}", flush=True)
        results[f"selfcheck_{name}"] = {"status": st, "detail": detail}
        if st != "pass":
            con.close()
            json.dump(results, open(out_file, "w"), indent=1)
            sys.exit(1)
    con.close()

    # 2. replica gate: engine parquet vs chunked oracle
    print(f"== x{args.copies} replica gate ({args.chunks} chunks) ==",
          flush=True)
    con = connect(dst, args.mem, args.threads)
    t0 = time.time()
    build_pairs(con, oracle, args.chunks)
    t_pairs = time.time() - t0
    n_pairs = con.execute("SELECT count(*) FROM __pairs").fetchone()[0]
    print(f"__pairs: {n_pairs} rows in {t_pairs:.1f}s", flush=True)
    for name, frame in chunked_frames(con, oracle).items():
        got = con.execute(
            f"SELECT * FROM '{repl_out}/{name}/*.parquet'").df()
        st, detail = compare(got, frame)
        results[name] = {
            "status": st, "detail": detail,
            "t_base_sec": t_base.get(name), "t_replica_sec": t_repl.get(name),
            "time_ratio": (round(t_repl[name] / t_base[name], 2)
                           if name in t_base and name in t_repl else None)}
        print(f"{st:5s} {name}: {detail} "
              f"(engine {t_repl.get(name)}s, base {t_base.get(name)}s)",
              flush=True)
    con.close()

    summary = {
        "copies": args.copies, "chunks": args.chunks,
        "n_true_pairs_replica": n_pairs,
        "t_oracle_pairs_sec": round(t_pairs, 1),
        "n_pass": sum(1 for v in results.values() if v["status"] == "pass"),
        "n_fail": sum(1 for v in results.values() if v["status"] != "pass")}
    json.dump({"summary": summary, "results": results},
              open(out_file, "w"), indent=1)
    print(json.dumps(summary), flush=True)
    sys.exit(1 if summary["n_fail"] else 0)


if __name__ == "__main__":
    main()
