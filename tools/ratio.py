#!/usr/bin/env python3
"""Compare two sweep artifacts: per-query ratios, medians, outliers.

Usage: python3 tools/ratio.py <small.json> <big.json> [threshold]
"""
import json
import statistics
import sys


def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    common = sorted(set(a) & set(b))
    ratios = {}
    for q in common:
        if a[q] > 0 and b[q] > 0:
            ratios[q] = b[q] / a[q]
    med = statistics.median(ratios.values())
    ta = sum(v for q, v in a.items() if q in ratios)
    tb = sum(v for q, v in b.items() if q in ratios)
    print(f"common {len(ratios)}  total {ta:.1f}s -> {tb:.1f}s "
          f"({tb / ta:.2f}x)  median ratio {med:.2f}")
    print(f"only in {sys.argv[1]}: {sorted(set(a) - set(b))}")
    print(f"only in {sys.argv[2]}: {sorted(set(b) - set(a))}")
    print(f"\nrows with ratio > {thr} (or > 5s absolute):")
    for q in sorted(ratios, key=lambda q: -ratios[q]):
        if ratios[q] > thr or b[q] > 5:
            print(f"  {q:34s} {a[q]:8.2f} -> {b[q]:8.2f}  {ratios[q]:6.2f}x")


if __name__ == "__main__":
    main()
