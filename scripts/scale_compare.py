#!/usr/bin/env python3
"""Compare two Bench JSON outputs (e.g. sf0.1 vs a 10x replica).

Usage: python3 scripts/scale_compare.py <small.json> <big.json> [factor]

Prints per-query ratios sorted worst-first, flagging queries whose
big/small ratio exceeds the data factor (super-linear scaling).
"""
import json
import sys

def load(path):
    """Accept both bench formats: scalar seconds per query (stdout
    line) or {n,min,max,mean} stats objects (the full-detail file)."""
    qs = json.load(open(path))["queries"]
    return {k: (v["min"] if isinstance(v, dict) else v) for k, v in qs.items()}

def main():
    small = load(sys.argv[1])
    big = load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for q in sorted(set(small) & set(big)):
        s, b = small[q], big[q]
        rows.append((b / s if s > 0 else float("inf"), s, b, q))
    rows.sort(reverse=True)
    n_super = 0
    print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query")
    for r, s, b, q in rows:
        flag = " <-- SUPER-LINEAR" if r > factor else ""
        if r > factor:
            n_super += 1
        print(f"{r:7.2f} {s:8.2f} {b:8.2f}  {q}{flag}")
    ts, tb = sum(small[q] for _, _, _, q in rows), sum(big[q] for _, _, _, q in rows)
    print(f"\ntotals: small={ts:.1f}s big={tb:.1f}s ratio={tb/ts:.2f} "
          f"(data factor {factor:g}); {n_super} super-linear")

if __name__ == "__main__":
    main()
