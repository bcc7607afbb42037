#!/usr/bin/env python3
"""Compare two bench_full.json artifacts by per-query MEDIAN, not total.

Usage: bench_compare.py <old.json> <new.json> [threshold_ratio]

Full-suite totals at sf0.1 swing up to +/-50% run to run (GC debris in the
shared JVM), so the only trustworthy round-over-round signal is the
per-query median-of-3, and only when it moves by more than the noise
band. Prints queries whose median moved by more than `threshold_ratio`
(default 1.5x either way), plus added/removed queries.
"""
import json
import sys


def main(old_path: str, new_path: str, threshold: float = 1.5) -> int:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    slower, faster = [], []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a is None or b is None or a <= 0:
            continue
        ratio = b / a
        if ratio >= threshold:
            slower.append((ratio, name, a, b))
        elif ratio <= 1.0 / threshold:
            faster.append((ratio, name, a, b))
    for ratio, name, a, b in sorted(slower, reverse=True):
        print(f"SLOWER {ratio:5.2f}x  {name}: {a:.3f}s -> {b:.3f}s")
    for ratio, name, a, b in sorted(faster):
        print(f"faster {ratio:5.2f}x  {name}: {a:.3f}s -> {b:.3f}s")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    tot_old = sum(v for v in oq.values() if v)
    tot_new = sum(v for v in nq.values() if v)
    common = set(oq) & set(nq)
    ct_old = sum(oq[n] for n in common if oq[n])
    ct_new = sum(nq[n] for n in common if nq[n])
    print(f"total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"(common queries only: {ct_old:.1f}s -> {ct_new:.1f}s; "
          f"treat totals as trend, medians as signal)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
