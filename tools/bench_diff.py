#!/usr/bin/env python3
"""Cross-round bench regression diff (r14 verdict #5: the round-close
record must name every shared-set query whose min moved >25% in EITHER
direction, not just the wins).

Usage: bench_diff.py <old BENCH_QUERIES_rN.json> <new BENCH_QUERIES.json>
       [--threshold 0.25] [--abs-floor 0.25]

Prints: totals, every shared query moved more than threshold (relative)
AND abs-floor (seconds — sub-noise moves on 0.1 s queries aren't
narration-worthy), split into REGRESSED / IMPROVED, plus added/removed
queries with their cost. Exit code 0 always — this is a reporting tool,
the judgment call stays in BENCH.md.

--markdown (r15 stretch #8): emit the same facts as a BENCH.md-ready
block — headline line, weather lines, and bullet lists — so the
round-close section is generated from the records rather than
hand-transcribed (the both-directions rule stays mechanical; prose
attribution is still added by hand around the generated block).
"""
import json
import sys


def load(path):
    qs, total = None, None
    for line in open(path):
        try:
            j = json.loads(line)
        except json.JSONDecodeError:
            continue
        if j.get("metric") == "queries":
            qs = j["queries"]
        elif j.get("metric") == "total":
            total = j
    if qs is None:
        sys.exit(f"{path}: no queries line")
    return qs, total


def machine_line(tag, total):
    """One-line weather summary from the record's own fingerprint
    (records from before round 16 carry none — say so explicitly)."""
    m = (total or {}).get("machine")
    if not m:
        return f"{tag} machine: (no fingerprint in record)"
    s, e = m.get("start", {}), m.get("end", {})
    return (f"{tag} machine: load {s.get('loadavg_1m')}→{e.get('loadavg_1m')}"
            f" (5m {s.get('loadavg_5m')}→{e.get('loadavg_5m')}),"
            f" procs {s.get('n_procs')}→{e.get('n_procs')},"
            f" cpus {s.get('cpus')}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--") and "=" not in a}
    opts = {a.split("=")[0]: a.split("=")[1] for a in sys.argv[1:]
            if a.startswith("--") and "=" in a}
    thr = float(opts.get("--threshold", 0.25))
    floor = float(opts.get("--abs-floor", 0.25))
    md = "--markdown" in flags
    old_q, old_t = load(args[0])
    new_q, new_t = load(args[1])
    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))

    def tot(t):
        return f"{t['value']} s / {t['n_queries']} queries" if t else "?"
    shared_old = sum(old_q[q] for q in shared if old_q[q] >= 0)
    shared_new = sum(new_q[q] for q in shared if new_q[q] >= 0)
    moved = [(q, old_q[q], new_q[q]) for q in shared
             if old_q[q] >= 0 and new_q[q] >= 0
             and abs(new_q[q] - old_q[q]) > floor
             and max(new_q[q], old_q[q]) > min(new_q[q], old_q[q]) * (1 + thr)]
    reg = sorted([m for m in moved if m[2] > m[1]], key=lambda m: m[1] - m[2])
    imp = sorted([m for m in moved if m[2] < m[1]], key=lambda m: m[2] - m[1])

    if md:
        b = "-"
        print(f"Official run **{tot(new_t)}** (was {tot(old_t)}); "
              f"shared set ({len(shared)}): "
              f"{shared_old:.1f} → {shared_new:.1f} s.")
        print(machine_line("Old", old_t))
        print(machine_line("New", new_t))
        print(f"\nREGRESSED >{thr:.0%} (and >{floor}s): {len(reg)}")
        for q, a, v in reg:
            print(f"{b} `{q}`: {a:.2f} → {v:.2f} (+{v - a:.2f} s)")
        print(f"\nIMPROVED >{thr:.0%} (and >{floor}s): {len(imp)}")
        for q, a, v in imp:
            print(f"{b} `{q}`: {a:.2f} → {v:.2f} ({v - a:.2f} s)")
        if added:
            cost = sum(new_q[q] for q in added if new_q[q] >= 0)
            print(f"\nNEW queries ({len(added)}, {cost:.2f} s total): " +
                  ", ".join(f"`{q}` {new_q[q]:.2f}" for q in added))
        if removed:
            print(f"\nREMOVED: " +
                  ", ".join(f"`{q}` (was {old_q[q]:.2f})" for q in removed))
        return

    print(f"old: {tot(old_t)}   new: {tot(new_t)}")
    print(machine_line("old", old_t))
    print(machine_line("new", new_t))
    print(f"shared set ({len(shared)}): {shared_old:.1f} -> "
          f"{shared_new:.1f} s")
    print(f"\nREGRESSED >{thr:.0%} (and >{floor}s): {len(reg)}")
    for q, a, b in reg:
        print(f"  {q}: {a:.2f} -> {b:.2f}  (+{b - a:.2f} s)")
    print(f"\nIMPROVED >{thr:.0%} (and >{floor}s): {len(imp)}")
    for q, a, b in imp:
        print(f"  {q}: {a:.2f} -> {b:.2f}  ({b - a:.2f} s)")
    if added:
        cost = sum(new_q[q] for q in added if new_q[q] >= 0)
        print(f"\nNEW queries ({len(added)}, {cost:.2f} s total):")
        for q in added:
            print(f"  {q}: {new_q[q]:.2f}")
    if removed:
        print(f"\nREMOVED queries ({len(removed)}):")
        for q in removed:
            print(f"  {q}: was {old_q[q]:.2f}")


if __name__ == "__main__":
    main()
