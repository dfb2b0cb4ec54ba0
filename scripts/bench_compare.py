#!/usr/bin/env python3
"""Compare two BENCH_FULL.json runs query-by-query.

Usage: python3 scripts/bench_compare.py OLD.json NEW.json [threshold_ratio]

Prints queries whose warm time changed by more than threshold_ratio
(default 1.5x) AND by more than 0.3s absolute — both gates, because this
host's run-to-run noise is large (identical code has measured 110-168s
suite totals same-day; see README's bench contract). Added/removed
queries are always listed.
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    qo, qn = old["queries"], new["queries"]
    print(f"old: {old['value']:.1f}s / {len(qo)} queries   "
          f"new: {new['value']:.1f}s / {len(qn)} queries")
    for name in sorted(set(qn) - set(qo)):
        print(f"  ADDED   {name:30s} {qn[name]:6.2f}s")
    for name in sorted(set(qo) - set(qn)):
        print(f"  REMOVED {name:30s} {qo[name]:6.2f}s")
    rows = []
    for name in sorted(set(qo) & set(qn)):
        a, b = qo[name], qn[name]
        if abs(b - a) < 0.3:
            continue
        r = b / a if a > 0 else float("inf")
        if r > ratio or r < 1 / ratio:
            rows.append((r, name, a, b))
    for r, name, a, b in sorted(rows, key=lambda t: -t[0]):
        tag = "SLOWER" if r > 1 else "faster"
        print(f"  {tag}  {name:30s} {a:6.2f}s -> {b:6.2f}s  ({r:.2f}x)")
    if not rows:
        print("  no per-query change beyond noise gates "
              f"(> {ratio}x and > 0.3s)")


if __name__ == "__main__":
    main()
