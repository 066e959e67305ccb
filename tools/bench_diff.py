#!/usr/bin/env python3
"""Per-query bench regression diff — the cross-round comparison the
verdicts compute by hand, as a tool.

Usage:  python3 tools/bench_diff.py OLD.json NEW.json [ratio-threshold]

Accepts either BENCH_FULL.json shape:
  {"total": s, "queries": {"qNN_name": {"sec": s, "failed": bool}}}
or the driver's one-line bench record:
  {"value": s, "queries": {"qNN": s}}
Query keys are matched on their qNN prefix, so the two shapes compare.

Exit 1 if any shared query regressed past the threshold (default 1.3x)
AND by more than 0.3s absolute (sub-second jitter is not a regression).
"""
import json
import re
import sys


def load(path):
    d = json.load(open(path))
    queries = d.get("queries")
    if queries is None and "tail" in d:
        # driver snapshot: the bench line is embedded (possibly
        # truncated at the front) in the "tail" string
        m = re.search(r'"queries":(\{[^}]*\})', d["tail"])
        queries = json.loads(m.group(1)) if m else {}
    out = {}
    failed = set()
    for k, v in (queries or {}).items():
        sec = v["sec"] if isinstance(v, dict) else float(v)
        m = re.match(r"(q\d+)", k)
        key = m.group(1) if m else k
        out[key] = (sec, k)
        # a failed entry's recorded sec is meaningless (often short) —
        # comparing it like a pass would read a pass->fail as "improved"
        if isinstance(v, dict) and v.get("failed"):
            failed.add(key)
    total = d.get("total", d.get("value"))
    if total is None:
        total = sum(s for s, _ in out.values())
    return total, (out, failed)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old_total, (old, old_failed) = load(sys.argv[1])
    new_total, (new, new_failed) = load(sys.argv[2])
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    old_shared = sum(old[q][0] for q in shared)
    new_shared = sum(new[q][0] for q in shared)
    print(f"totals: old={old_total:.1f}s new={new_total:.1f}s | "
          f"shared {len(shared)} queries: {old_shared:.1f}s -> "
          f"{new_shared:.1f}s ({new_shared / max(old_shared, 1e-9):.2f}x)")
    if added:
        add_cost = sum(new[q][0] for q in added)
        print(f"added ({add_cost:.1f}s): " +
              " ".join(f"{new[q][1]}={new[q][0]:.2f}s" for q in added))
    if removed:
        print("removed: " + " ".join(old[q][1] for q in removed))
    # pass -> fail is the worst regression a bench differ exists to
    # catch; report it first and never let its short "sec" count as
    # an improvement. (fail -> fail is carried noise; fail -> pass is
    # a recovery, reported for the record.)
    now_failing = sorted(q for q in shared
                         if q in new_failed and q not in old_failed)
    for q in now_failing:
        print(f"REGRESSION {new[q][1]}: was passing, now FAILED")
    for q in sorted(q for q in shared
                    if q in old_failed and q not in new_failed):
        print(f"recovered  {new[q][1]}: was FAILED, now passes")
    comparable = [q for q in shared
                  if q not in old_failed and q not in new_failed]
    regressions = []
    for q in comparable:
        o, n = old[q][0], new[q][0]
        if n > o * threshold and n - o > 0.3:
            regressions.append((n / max(o, 1e-9), new[q][1], o, n))
    for ratio, name, o, n in sorted(regressions, reverse=True):
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    improvements = [(o / max(n, 1e-9), new[q][1], old[q][0], new[q][0])
                    for q in comparable
                    for o, n in [(old[q][0], new[q][0])]
                    if o > n * threshold and o - n > 0.3]
    for ratio, name, o, n in sorted(improvements, reverse=True)[:10]:
        print(f"improved   {name}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    if regressions or now_failing:
        sys.exit(1)
    print(f"no regressions past {threshold}x (+0.3s absolute)")


if __name__ == "__main__":
    main()
