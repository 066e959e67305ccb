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
    for k, v in (queries or {}).items():
        sec = v["sec"] if isinstance(v, dict) else float(v)
        m = re.match(r"(q\d+)", k)
        out[m.group(1) if m else k] = (sec, k)
    total = d.get("total", d.get("value"))
    if total is None:
        total = sum(s for s, _ in out.values())
    return total, out


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old_total, old = load(sys.argv[1])
    new_total, new = load(sys.argv[2])
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
    regressions = []
    for q in shared:
        o, n = old[q][0], new[q][0]
        if n > o * threshold and n - o > 0.3:
            regressions.append((n / max(o, 1e-9), new[q][1], o, n))
    for ratio, name, o, n in sorted(regressions, reverse=True):
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    improvements = [(o / max(n, 1e-9), new[q][1], old[q][0], new[q][0])
                    for q in shared
                    for o, n in [(old[q][0], new[q][0])]
                    if o > n * threshold and o - n > 0.3]
    for ratio, name, o, n in sorted(improvements, reverse=True)[:10]:
        print(f"improved   {name}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    if regressions:
        sys.exit(1)
    print(f"no regressions past {threshold}x (+0.3s absolute)")


if __name__ == "__main__":
    main()
