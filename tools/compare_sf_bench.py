#!/usr/bin/env python3
"""Compare two Bench JSON artifacts across scale factors.

Usage: compare_sf_bench.py <small.json> <big.json> [row_scale]

Prints per-query time ratios sorted descending, with the implied
wall-clock scaling exponent log(t_big/t_small)/log(row_scale)
(1.0 = linear in rows, <1 sub-linear at fixed parallelism).
Queries whose ratio exceeds the row scale (super-linear) are flagged
CLIFF; 0.6-1.0 exponents are flagged WATCH.
"""
import json
import math
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs, qb = small["queries"], big["queries"]
rows = []
for name in sorted(qs):
    if name not in qb:
        print(f"MISSING in big: {name}")
        continue
    ts, tb = qs[name], qb[name]
    ratio = tb / ts if ts > 0 else float("inf")
    expo = math.log(ratio) / math.log(scale) if ratio > 0 else float("nan")
    rows.append((ratio, expo, name, ts, tb))
for name in sorted(set(qb) - set(qs)):
    print(f"MISSING in small: {name}")

rows.sort(reverse=True)
print(f"{'query':28s}{'t_small':>9s}{'t_big':>9s}{'ratio':>8s}{'exp':>7s}  flag")
n_cliff = n_watch = 0
for ratio, expo, name, ts, tb in rows:
    flag = ""
    if ratio > scale:
        flag, n_cliff = "CLIFF", n_cliff + 1
    elif expo > 0.6:
        flag, n_watch = "WATCH", n_watch + 1
    print(f"{name:28s}{ts:9.2f}{tb:9.2f}{ratio:8.2f}{expo:7.2f}  {flag}")

errs_b = big.get("errors") or {}
for k, v in errs_b.items():
    print(f"ERROR at big SF: {k}: {v}")
tot_s = sum(qs.values())
tot_b = sum(qb[k] for k in qb if k in qs)
print(f"\ntotals (shared queries): {tot_s:.1f} -> {tot_b:.1f} s "
      f"(x{tot_b/tot_s:.2f} at {scale:g}x rows); "
      f"cliffs={n_cliff} watch={n_watch} errors={len(errs_b)}")
