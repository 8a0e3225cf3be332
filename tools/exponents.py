#!/usr/bin/env python3
"""Growth-exponent table from the 1x/10x/100x replica-ladder BENCH_detail
files (builder-side; feeds SCALING.md's round-14 exponent table).

Usage: exponents.py <bd_1x> <bd_10x> <bd_100x>

Exponent e over a volume step S: e = log(t_hi / t_lo) / log(S), from
min-of-reps wall and min-of-reps task CPU (the noise-immune companion on
a shared host — wall exponents are flattened by 32-way parallelism
amortizing fixed overhead, CPU exponents are not). Queries under 100 ms
at the small scale are flagged overhead_bound: their ratios are fixed
cost, not scaling signal. Prints a markdown table sorted by 10x->100x
wall exponent, flagging e > 1.05 (super-linear).
"""
import json
import math
import sys


def load(path):
    d = json.load(open(path))
    out = {}
    for name, q in d["detail"].items():
        if q.get("err") in (None, "null") and q["sec"] >= 0 and q["reps"]:
            out[name] = (min(q["reps"]),
                         min(q["cpu_reps"]) if q.get("cpu_reps") else None)
    return out


def main(p1, p10, p100):
    b1, b10, b100 = load(p1), load(p10), load(p100)
    shared = sorted(set(b1) & set(b10) & set(b100))

    def e(lo, hi, step):
        if lo is None or hi is None or lo <= 0 or hi <= 0:
            return None
        return round(math.log(hi / lo) / math.log(step), 2)

    rows = []
    for q in shared:
        w1, c1 = b1[q]
        w10, c10 = b10[q]
        w100, c100 = b100[q]
        rows.append((q, w1, w10, w100,
                     e(w10, w100, 10), e(w1, w100, 100),
                     e(c10, c100, 10), e(c1, c100, 100),
                     w1 < 0.1))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else -9))
    print("| query | wall 1x/10x/100x (s) | e(wall) 10x→100x | e(wall)"
          " 1x→100x | e(cpu) 10x→100x | e(cpu) 1x→100x | flag |")
    print("|---|---|---|---|---|---|---|")
    for (q, w1, w10, w100, ew_hi, ew_all, ec_hi, ec_all, ovh) in rows:
        flags = []
        if ew_hi is not None and ew_hi > 1.05:
            flags.append("SUPER-LINEAR wall")
        if ec_hi is not None and ec_hi > 1.05:
            flags.append("super-linear cpu")
        if ovh:
            flags.append("overhead_bound at 1x")
        print(f"| {q} | {w1:.2f} / {w10:.2f} / {w100:.2f} | {ew_hi} |"
              f" {ew_all} | {ec_hi} | {ec_all} | {'; '.join(flags)} |")
    sup = [r[0] for r in rows if r[4] is not None and r[4] > 1.05 and not r[8]]
    print()
    print(f"super-linear wall (10x→100x, not overhead-bound): {sup or 'none'}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
