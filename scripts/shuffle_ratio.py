#!/usr/bin/env python3
"""Shuffle-byte growth ratios between two ShuffleAudit runs.

Usage: python3 scripts/shuffle_ratio.py SHUFFLE_sf0.1.json SHUFFLE_sf1.json [data_factor]

For every query present in both files, prints shuffle write bytes at
each SF and the growth ratio, sorted by ratio descending. Bytes are a
pure function of plan+data (no host noise), so ratio > data_factor
means the query's exchanged volume grows super-linearly in the input —
the 100 TB red flag wall-clock on 32 local threads can't show crisply.
Queries whose absolute shuffle volume is tiny at both SFs (< 1 MB) are
reported separately: their ratios are floor-dominated (fit frames,
partial-agg rows) and say nothing about scaling.
"""
import sys, json

def load(p):
    with open(p) as f:
        return json.load(f)

def fmt(b):
    if b >= 1 << 30: return f"{b / (1 << 30):.2f}G"
    if b >= 1 << 20: return f"{b / (1 << 20):.1f}M"
    if b >= 1 << 10: return f"{b / (1 << 10):.0f}K"
    return str(b)

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    rows, tiny = [], []
    for name in sorted(set(qa) & set(qb)):
        wa = qa[name]["shuffle_write"]
        wb = qb[name]["shuffle_write"]
        spill = qb[name]["spill_mem"] + qb[name]["spill_disk"]
        if max(wa, wb) < 1 << 20:
            tiny.append(name)
            continue
        ratio = wb / wa if wa else float("inf")
        rows.append((ratio, name, wa, wb, spill))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'small':>8s} {'large':>8s} {'ratio':>7s} {'spill':>8s}")
    for ratio, name, wa, wb, spill in rows:
        flag = "  <-- super-linear" if ratio > factor * 1.5 else ""
        print(f"{name:34s} {fmt(wa):>8s} {fmt(wb):>8s} {ratio:>6.1f}x {fmt(spill):>8s}{flag}")
    print(f"\n{len(tiny)} queries under 1 MB at both SFs (floor-dominated, not ranked): "
          + ", ".join(tiny))
    only_a = sorted(set(qa) - set(qb))
    if only_a:
        print(f"\nonly in {sys.argv[1]}: {len(only_a)} queries")

if __name__ == "__main__":
    main()
