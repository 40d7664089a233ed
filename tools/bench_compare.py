#!/usr/bin/env python3
"""Cross-round bench adjudication per BASELINE.md "Bench drift
normalization": for every query present in both bench artifacts, compute
raw ratio now/prev and the drift-normalized ratio (divided by the NOW
run's drift_factor), and flag queries above the 2x normalized bar.

Usage: bench_compare.py <prev.json> <now.json> [bar]

Bench artifacts are the full files written via SPARK_GRAFT_BENCH_OUT
(with a "queries" map); drift_factor is read from the NOW artifact when
present (else 1.0, with a warning — solo-adjudicate by hand).
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries") or d.get("slowest_queries") or {}
    return d, {k: float(v) for k, v in qs.items()}


def main():
    prev_path, now_path = sys.argv[1], sys.argv[2]
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    prev_doc, prev = load(prev_path)
    now_doc, now = load(now_path)
    drift = float(now_doc.get("drift_factor") or 0) or 1.0
    if "drift_factor" not in now_doc:
        print("WARN: no drift_factor in NOW artifact; using 1.0", file=sys.stderr)
    common = sorted(set(prev) & set(now))
    added = sorted(set(now) - set(prev))
    removed = sorted(set(prev) - set(now))
    rows = []
    for q in common:
        if prev[q] <= 0:
            continue
        raw = now[q] / prev[q]
        rows.append((q, prev[q], now[q], raw, raw / drift))
    rows.sort(key=lambda r: -r[4])
    flagged = [r for r in rows if r[4] > bar]
    tot_prev = sum(prev[q] for q, *_ in [(r[0],) for r in rows])
    tot_now = sum(now[r[0]] for r in rows)
    ratios = [r[4] for r in rows]
    med = sorted(ratios)[len(ratios) // 2] if ratios else float("nan")
    geo = math.exp(sum(math.log(x) for x in ratios) / len(ratios)) if ratios else float("nan")
    print(f"common={len(common)} added={added} removed={removed}")
    print(f"drift_factor(now)={drift:.3f}")
    print(f"common-total raw ratio={tot_now / tot_prev:.3f} "
          f"(normalized {tot_now / tot_prev / drift:.3f}); "
          f"median normalized={med:.3f}, geomean normalized={geo:.3f}")
    print(f"\ntop movers (normalized ratio, bar={bar}):")
    for q, p, n, raw, norm in rows[:12]:
        mark = " <-- FLAG" if norm > bar else ""
        print(f"  {q:28s} {p:8.2f} -> {n:8.2f}  raw x{raw:.2f}  norm x{norm:.2f}{mark}")
    print(f"\nflagged_above_bar={len(flagged)}")
    sys.exit(0 if not flagged else 3)


if __name__ == "__main__":
    main()
