#!/usr/bin/env python3
"""Replica-scale correctness + scaling gate (VERDICT r8 ask #3): one command
that (a) builds — or reuses — a ×N replica of a testdata dir via
graft.tools.ScaleUp, (b) runs graft.Verify over BOTH the base dir and the
replica, (c) re-checks every oracled query against DuckDB on the replica,
and (d) emits per-query base→replica wall-time ratios and hash verdicts as
one JSON file. Round 8's five scale bugs (an Int overflow past 2^31, four
float-sum drifts) were caught by exactly this sweep run by hand; this tool
makes it a repeatable gate instead of a one-round act.

Usage:
  python3 tools/scalecheck.py [--copies 10] [--src /root/testdata/sf0.1]
      [--dst target/scale_x{copies}] [--out SCALECHECK.json]
      [--queries a,b,c] [--skip a,b] [--cpus 16] [--no-default-skip]

Recommended round-close recipe (r10: the ×30 sweep is FULL-surface):
  python3 tools/scalecheck.py --copies 10 --out SCALECHECK_x10.json
  python3 tools/scalecheck.py --copies 30 --out SCALECHECK_x30.json
  python3 tools/scalecheck.py --copies 3 --out SCALECHECK_x3.json \
      --queries dedup_prefix_join,dedup_clusters_exact,dedup_pair_recall
The exact all-pairs family is output-quadratic in duplicate-group size
(×10 replica: ~440-460 s/query, honest cost of exact semantics), so it is
skipped at copies >= 5 by default and swept at ×3; dedup_lexical_cosine
(one order cheaper — runs at ×10 in 272 s) is additionally skipped at
copies >= 20. Verify runs get SPARK_GRAFT_WARMUP=1 so ratios compare
steady-state probe cost, and summary.over_budget flags (without failing)
queries whose replica time exceeds --budget-sec.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# output-quadratic at replica scale (duplicate-dense corpus): swept at x3.
# dedup_pair_recall embeds dedup_prefix_join as its ground truth, so it
# inherits the family's cost and sweep schedule.
QUADRATIC = ["dedup_prefix_join", "dedup_clusters_exact", "dedup_pair_recall"]
# output-quadratic but an order cheaper (single self-join, no array
# verify): runs at x10 (272 s, hash-exact), skipped at copies >= 20 where
# engine + DuckDB both go multi-thousand-second. Cost bound on the capped
# alternative: tools.PairCapDemo measured 66.7 s at x30 with budget 8/doc.
QUADRATIC_X20 = ["dedup_lexical_cosine"]
# the retired default near-dup geometry (r13: emb_dup_lsh re-pointed at
# the strictly-dominating wide+multiprobe dataflow). The legacy 4x4-bit
# bands hit a measured collision floor on duplicate-dense replicas
# (x30: 1004 s — 37% of the whole r12 sweep, re-proving a geometry the
# BENCH.md round-12 A/B already retired); kept runnable for the A/B
# record, swept to x10 (36 s there), skipped at copies >= 20.
LEGACY_X20 = ["emb_dup_lsh_legacy"]

# Known-priced queries whose replica time exceeds the default budget by
# design; carried into summary.over_budget_notes so an over-budget flag
# never reads as an unexamined regression (r12 verdict #6).
OVER_BUDGET_NOTES = {
    "dedup_winnow_pairs":
        "uncapped exact winnow pair set is the registered contract; its "
        "budget knob is proven (x30: 89.3 s capped vs 144.8 s uncapped, "
        "BENCH.md) but a cap changes the emitted pair set, so the "
        "oracled default stays uncapped",
    "emb_dup_lsh": (
        "wide+multiprobe geometry (the r13 default): highest-recall "
        "member, output-bound — pays for the true pairs it emits; "
        "maxCandidatesPerDoc is the documented knob"),
    "dedup_lexical_cosine":
        "single self-join quadratic member; x10 evidence 272 s, "
        "capped alternative measured 66.7 s (PairCapDemo)",
    "mm_dup_pairs": (
        "output-bound emitter: replica duplication SQUARES phash "
        "duplicate-group sizes (x30 emits 23.7M true pairs, hash-exact); "
        "maxCandidatesPerDoc is the documented budget knob — measured at "
        "x30 by MmPairCapDemo: budget 8/doc bounds the emitted set 27x "
        "(859,865 vs 23,720,853 pairs; this stage's wall is candidate-"
        "generation-bound at local[32], 25.9 vs 25.8 s — the knob's win "
        "is every downstream consumer of the pair set). Left uncapped "
        "because a cap changes the oracled pair set (same contract as "
        "dedup_winnow_pairs)"),
}

TIME_RE = re.compile(r"^\[verify-time\] (\S+) ([0-9.]+)")
NAME_RE = re.compile(r"^\[query-name\] (\S+)")

# Source files owning the quadratic pair family's dataflow: a sweep that
# SKIPS those queries cites the committed paircheck evidence instead, and
# that citation is only valid if the evidence postdates the last change
# to these files (r13 verdict #4: the re-run-on-change policy lived only
# in habit).
PAIR_FAMILY_OWNERS = [
    "src/main/scala/graft/ops/Dedup.scala",
    "src/main/scala/graft/ops/RetrievalQuality.scala",
    "src/main/scala/graft/ops/TextAnalysis.scala",
]
PAIR_EVIDENCE_FILES = ["SCALECHECK_x3.json", "SCALECHECK_x10_pairs.json"]


def paircheck_staleness():
    """None if the committed pair-family evidence postdates the last
    commit touching the family's source files; a human-readable reason
    otherwise."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct %h", "--"] +
            PAIR_FAMILY_OWNERS,
            cwd=REPO, capture_output=True, text=True).stdout.strip()
        if not out:
            return None
        ct, commit = int(out.split()[0]), out.split()[1]
    except Exception as e:  # git unavailable: can't adjudicate, say so
        return f"cannot read pair-family git history: {e}"
    have = [f for f in PAIR_EVIDENCE_FILES
            if os.path.exists(os.path.join(REPO, f))]
    if not have:
        return "no committed paircheck evidence files exist"
    newest = max(os.path.getmtime(os.path.join(REPO, f)) for f in have)
    if ct > newest:
        return (f"pair-family sources changed (commit {commit}) AFTER the "
                f"newest paircheck evidence ({', '.join(have)}) — re-run "
                f"tools/paircheck.py and the x3 pair sweep before citing it")
    return None


def machine_fingerprint():
    """Load + process-count snapshot so cross-round ratio comparisons
    carry their weather with them (r13 verdict stretch #8)."""
    fp = {}
    try:
        l1, l5, l15 = os.getloadavg()
        fp.update({"loadavg_1m": round(l1, 2), "loadavg_5m": round(l5, 2),
                   "loadavg_15m": round(l15, 2)})
    except OSError:
        pass
    try:
        fp["n_procs"] = sum(1 for d in os.listdir("/proc") if d.isdigit())
    except OSError:
        pass
    try:
        fp["cpus"] = os.cpu_count()
    except Exception:
        pass
    return fp


def run_sbt(main_args, env_extra=None, log_name=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    cmd = ["sbt", "-batch", f"runMain {main_args}"]
    print(f"+ {' '.join(cmd)}", flush=True)
    p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True)
    if log_name:
        with open(log_name, "w") as f:
            f.write(p.stdout)
            f.write("\n--- stderr ---\n")
            f.write(p.stderr)
    if p.returncode != 0:
        tail = "\n".join(p.stdout.splitlines()[-20:])
        raise RuntimeError(f"sbt failed ({main_args}):\n{tail}")
    return p.stdout


def parse_times(stdout):
    times = {}
    for line in stdout.splitlines():
        m = TIME_RE.match(line)
        if m:
            times[m.group(1)] = float(m.group(2))
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--skip", default=None,
                    help="comma-separated queries to drop from the run")
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--no-default-skip", action="store_true",
                    help="run the quadratic pair family even at copies>=5")
    ap.add_argument("--budget-sec", type=float, default=120.0,
                    help="per-query replica wall-time budget; queries over "
                         "it are FLAGGED in summary.over_budget (not failed)")
    ap.add_argument("--skip-verify", action="store_true",
                    help="reuse existing base/replica Verify outputs and "
                         "their saved logs (re-run only the oracle phase — "
                         "for iterating on oracle-side issues)")
    args = ap.parse_args()

    dst = args.dst or f"{REPO}/target/scale_x{args.copies}"
    out_file = args.out or f"{REPO}/SCALECHECK_x{args.copies}.json"

    queries = args.queries.split(",") if args.queries else None
    skip = set(args.skip.split(",")) if args.skip else set()
    if queries is None and args.copies >= 5 and not args.no_default_skip:
        skip |= set(QUADRATIC)
    if queries is None and args.copies >= 20 and not args.no_default_skip:
        skip |= set(QUADRATIC_X20) | set(LEGACY_X20)

    # the machine-weather fingerprint is taken at sweep START (the sweep
    # itself raises load); the pair-family citation check runs whenever
    # this sweep will skip that family and lean on committed evidence
    fingerprint = machine_fingerprint()
    pair_stale = paircheck_staleness() if (skip & set(QUADRATIC)) else None
    if pair_stale:
        print(f"WARNING: STALE PAIRCHECK EVIDENCE — {pair_stale}",
              flush=True)

    # 1. build (or reuse) the replica — ScaleUp is deterministic in
    # (src, copies), so an existing dst with all tables is the same data
    have = all(os.path.exists(f"{dst}/{t}.parquet") for t in
               ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"])
    if not have:
        run_sbt(f"graft.tools.ScaleUp {args.src} {dst} {args.copies}",
                log_name=f"{REPO}/target/scalecheck_scaleup.log")
    else:
        print(f"reusing replica at {dst}", flush=True)

    # 2+3. Verify on base and replica, capturing [verify-time] lines.
    # The base run goes first and unfiltered (cheap at sf0.1) so its
    # [verify-time] names give the full query list; the replica run —
    # where a skipped quadratic query would cost ~8 min — gets an
    # explicit subset of (names - skip).
    base_subset = ""
    if queries is not None:
        base_subset = " " + ",".join(q for q in queries if q not in skip)

    base_out = f"{REPO}/target/scalecheck_base_x{args.copies}"
    repl_out = f"{REPO}/target/scalecheck_replica_x{args.copies}"
    # WARMUP=1: standing-artifact builds (indexes, BPE, verdicts, ALS
    # model) run before the timed loop, so base->replica ratios compare
    # STEADY-STATE probe cost instead of charging the one-off build to
    # whichever query runs first (r9's quality_distill 5.4x at x30 was
    # mostly its per-session curate-artifact build)
    env = {"SPARK_GRAFT_CPUS": args.cpus, "SPARK_GRAFT_WARMUP": "1"}
    # per-copies log names: the x3 sweep of a round-close chain used to
    # clobber the x30 run's logs, so a later --skip-verify against the
    # bigger replica read the SMALLER run's query names (observed as an
    # empty intersection when re-checking one x30 query)
    base_log = f"{REPO}/target/scalecheck_verify_base_x{args.copies}.log"
    repl_log = f"{REPO}/target/scalecheck_verify_replica_x{args.copies}.log"
    # full-surface assertion (r12 verdict #2): when no explicit subset is
    # requested, the swept name set must equal the LIVE registry minus the
    # documented skips — derived from graft.tools.ListQueries at run time,
    # so a stale --skip-verify log or a base pass that silently dropped a
    # query (e.g. authored after the logs were written) is a hard error
    # BEFORE the expensive replica pass, instead of an under-covered sweep
    # that still prints "full".
    def assert_full_surface(names):
        reg_out = run_sbt("graft.tools.ListQueries",
                          log_name=f"{REPO}/target/scalecheck_registry.log")
        registry = {m.group(1) for line in reg_out.splitlines()
                    for m in [NAME_RE.match(line)] if m}
        if not registry:
            raise RuntimeError("ListQueries printed no [query-name] lines")
        stale = sorted(set(names) - registry)
        kept = sorted(set(names) & registry)  # drop renamed/deleted
        missing = sorted((registry - skip) - set(kept))
        if missing:
            raise RuntimeError(
                f"full-surface sweep under-covers the registry: "
                f"{len(missing)} of {len(registry)} queries missing "
                f"({', '.join(missing[:10])}{'...' if len(missing) > 10 else ''}) "
                f"— re-run without --skip-verify to refresh the logs")
        if stale:
            print(f"dropping {len(stale)} stale log names not in the "
                  f"registry: {', '.join(stale)}", flush=True)
        return kept

    if args.skip_verify:
        t_base = parse_times(open(base_log).read())
        t_repl = parse_times(open(repl_log).read())
        names = sorted(set(t_base) - skip)
        if queries is not None:  # honor an explicit subset here too
            names = sorted(set(names) & set(queries))
        else:
            names = assert_full_surface(names)
    else:
        t_base = parse_times(run_sbt(
            f"graft.Verify {args.src} {base_out}{base_subset}", env,
            log_name=base_log))
        names = sorted(set(t_base) - skip)
        if queries is None:
            names = assert_full_surface(names)
        repl_subset = " " + ",".join(names)
        t_repl = parse_times(run_sbt(
            f"graft.Verify {dst} {repl_out}{repl_subset}", env,
            log_name=repl_log))

    # 4. oracle gate on the REPLICA (base-scale correctness is the
    # driver's own sf0.01 gate; this one exists to catch scale-only bugs)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check_oracle
    # one fresh subprocess PER oracle check. Running all replica-scale
    # oracles through one interpreter is not survivable: DuckDB's
    # allocator state degrades across dozens of near-limit queries even
    # with per-query connections — observed twice at x10 as a cascade
    # (one borderline band oracle dies at the allocator, then EVERY later
    # query fails to allocate single kilobytes; the second time the
    # native bad_alloc aborted the whole process before a retry pass
    # could run). Each query that was seen failing this way passes alone
    # in a fresh process. Isolation costs ~1 s/query of interpreter +
    # view setup — noise against replica-scale oracle runtimes — and
    # makes every verdict independent: a FAIL here is the query's own.
    verdicts = {}
    label = {"pass": "PASS ", "fail": "FAIL ", "rows_only": "ROWS-ONLY"}
    for n in names:
        verdicts[n] = check_oracle.check_isolated(dst, repl_out, n)
        st, detail = verdicts[n]
        print(f"{label.get(st, st):9s} {n}: {detail}", flush=True)

    # 5. emit the gate file
    per_query = {}
    for n in names:
        st, detail = verdicts.get(n, ("missing", "no replica output"))
        b, r = t_base.get(n), t_repl.get(n)
        per_query[n] = {
            "status": st, "detail": detail,
            "base_sec": b, "replica_sec": r,
            "ratio": round(r / b, 2) if b and r and b > 0 else None,
        }
    ratios = sorted(q["ratio"] for q in per_query.values()
                    if q["ratio"] is not None)
    summary = {
        "copies": args.copies, "src": args.src, "dst": dst,
        "n_queries": len(names),
        "n_pass": sum(1 for q in per_query.values() if q["status"] == "pass"),
        "n_fail": sum(1 for q in per_query.values() if q["status"] == "fail"),
        "n_rows_only": sum(1 for q in per_query.values()
                           if q["status"] == "rows_only"),
        "n_missing": sum(1 for q in per_query.values()
                         if q["status"] == "missing"),
        "skipped": sorted(skip),
        "over_budget": sorted(
            n for n, q in per_query.items()
            if q["replica_sec"] is not None
            and q["replica_sec"] > args.budget_sec),
        # every over-budget member either carries a documented pricing
        # note (known output-bound / quadratic contracts) or surfaces as
        # "UNEXAMINED" for the round to adjudicate
        "over_budget_notes": {
            n: OVER_BUDGET_NOTES.get(n, "UNEXAMINED — investigate")
            for n, q in per_query.items()
            if q["replica_sec"] is not None
            and q["replica_sec"] > args.budget_sec},
        "budget_sec": args.budget_sec,
        "median_time_ratio": ratios[len(ratios) // 2] if ratios else None,
        # sum over `names` only, so base/replica totals cover the SAME
        # query set (the unfiltered base pass may run queries the replica
        # skips, e.g. the quadratic pair family at copies >= 5)
        "total_base_sec": round(
            sum(v for n, v in t_base.items() if n in names), 1),
        "total_replica_sec": round(
            sum(v for n, v in t_repl.items() if n in names), 1),
        "machine": fingerprint,
    }
    if pair_stale:
        summary["paircheck_stale"] = pair_stale
    with open(out_file, "w") as f:
        json.dump({"summary": summary, "queries": per_query}, f, indent=1)
    print(json.dumps(summary, indent=1))
    print(f"wrote {out_file}")
    return 1 if summary["n_fail"] or summary["n_missing"] else 0


if __name__ == "__main__":
    sys.exit(main())
