#!/usr/bin/env python3
"""Scaling-exponent table between two bench_detail records.

Usage: tools/bench_exponents.py <detail_at_sf0.1.json> <detail_at_10x.json> [topN]

For each query present in both records, exponent = log10(t_10x / t_base).
Prints the topN by 10x cost as a markdown table (for SCALING.md), plus
every query whose exponent exceeds 0.9 regardless of rank, and summary
percentiles. Exponents on a fixed 32-thread box are an upper bound for a
real 10x cluster (no extra executors to spread onto).
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        rec = json.load(f)
    return {
        name: q
        for name, q in rec.get("queries", {}).items()
        if isinstance(q, dict) and q.get("sec", -1) >= 0
    }


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    common = sorted(set(base) & set(big), key=lambda n: -big[n]["sec"])
    rows = []
    for name in common:
        t1, t10 = base[name]["sec"], big[name]["sec"]
        expo = math.log10(t10 / t1) if t1 > 0 else float("nan")
        rows.append((name, t1, t10, expo,
                     big[name].get("cpu_sec", 0.0), big[name].get("gc_sec", 0.0)))

    print(f"queries in both records: {len(common)} "
          f"(base-only: {len(set(base) - set(big))}, "
          f"10x-only: {len(set(big) - set(base))})")
    print("\n| query | sf0.1 s | 10x s | exponent | 10x cpu s | 10x gc s |")
    print("|---|---|---|---|---|---|")
    for name, t1, t10, expo, cpu, gc in rows[:top_n]:
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {expo:.2f} | {cpu:.1f} | {gc:.1f} |")

    hot = [r for r in rows if r[3] > 0.9]
    print(f"\nexponent > 0.9 ({len(hot)}):")
    for name, t1, t10, expo, _, _ in sorted(hot, key=lambda r: -r[3]):
        print(f"  {name}: {t1:.2f} -> {t10:.2f} s (exp {expo:.2f})")

    expos = sorted(r[3] for r in rows)
    if expos:
        def pct(p):
            return expos[min(len(expos) - 1, int(p * len(expos)))]
        print(f"\nexponent percentiles over {len(expos)} queries: "
              f"p50 {pct(.5):.2f}  p90 {pct(.9):.2f}  p99 {pct(.99):.2f}  "
              f"max {expos[-1]:.2f}")
        print(f"sum sf0.1 {sum(r[1] for r in rows):.1f} s -> "
              f"10x {sum(r[2] for r in rows):.1f} s "
              f"(whole-catalog exponent "
              f"{math.log10(sum(r[2] for r in rows) / sum(r[1] for r in rows)):.2f})")


if __name__ == "__main__":
    main()
