#!/usr/bin/env python3
"""Build the 10x scale-probe artifact from two Bench JSON lines.

Usage: probe10x.py <bench_sf0.01.json> <bench_sf0.1.json> <out.json>

Growth = sec(sf0.1) / sec(sf0.01) for a 10x data-volume step. Reading the
numbers: well under 10 = overhead-bound or sublinear (fine), around 10 =
linear (fine), well over 10 = superlinear (a scale smell worth a plan
read). Sub-100ms queries at the small SF are flagged `overhead_bound` —
their ratios are fixed-cost noise, not scaling signal.
"""
import json
import sys

FAMILIES = {
    "core": ["q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09",
             "q10", "q11", "q12", "q13", "q14", "q15", "q16", "q17", "q18",
             "q19", "q20", "q88"],
    "window": ["q21", "q22", "q23", "q24", "q25", "q46", "q50", "q52"],
    "events": ["q26", "q27", "q28", "q29", "q30", "q31", "q67", "q68",
               "q70", "q71"],
    "text_quality": ["q32", "q33", "q34", "q37", "q60", "q85"],
    "dedup_hash": ["q35", "q36", "q42", "q43", "q44", "q47", "q48", "q55",
                   "q63", "q77", "q78", "q81"],
    "vectors": ["q38", "q40", "q41", "q49", "q51", "q69", "q73", "q74",
                "q76", "q87", "q90"],
    "multimodal": ["q75", "q83", "q84", "q89", "q91", "q92"],
    "curation": ["q56", "q57", "q58", "q59", "q61", "q62", "q64", "q65",
                 "q66", "q72", "q79", "q80", "q82", "q86"],
    "domain": ["q45", "q53", "q54"],
}


def family_of(name):
    prefix = name.split("_")[0]
    for fam, members in FAMILIES.items():
        if prefix in members:
            return fam
    # an unmapped query silently lands in the catch-all and vanishes from
    # its family's growth line — make the drift loud (r7: q74 did exactly
    # this until the verdict caught it)
    print(f"WARNING: {name} not in any FAMILIES entry; classified 'other'",
          file=sys.stderr)
    return "other"


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    queries = {}
    fams = {}
    for name, s_small in small["queries"].items():
        s_big = big["queries"].get(name)
        if s_big is None or s_small <= 0 or s_big <= 0:
            continue
        growth = s_big / s_small
        fam = family_of(name)
        queries[name] = {
            "sf0.01_sec": round(s_small, 4),
            "sf0.1_sec": round(s_big, 4),
            "growth": round(growth, 2),
            "family": fam,
            "overhead_bound": s_small < 0.1,
        }
        fams.setdefault(fam, []).append((s_small, s_big))
    families = {}
    for fam, pairs in sorted(fams.items()):
        tot_s = sum(p[0] for p in pairs)
        tot_b = sum(p[1] for p in pairs)
        families[fam] = {
            "n_queries": len(pairs),
            "sf0.01_total_sec": round(tot_s, 3),
            "sf0.1_total_sec": round(tot_b, 3),
            "growth": round(tot_b / tot_s, 2),
        }
    out = {
        "metric": "10x_scale_probe",
        "sf_small": small["sf"],
        "sf_big": big["sf"],
        "total_growth": round(big["value"] / small["value"], 2),
        "canary_small": small.get("canary"),
        "canary_big": big.get("canary"),
        "families": families,
        "queries": dict(sorted(queries.items())),
    }
    with open(sys.argv[3], "w") as f:
        json.dump(out, f, indent=1)
    print(f"total growth {out['total_growth']}x "
          f"({small['value']:.1f}s -> {big['value']:.1f}s)")
    for fam, st in families.items():
        print(f"{fam:14s} n={st['n_queries']:2d} "
              f"{st['sf0.01_total_sec']:7.2f}s -> {st['sf0.1_total_sec']:7.2f}s "
              f"growth {st['growth']:5.2f}x")
    worst = sorted(queries.items(), key=lambda kv: -kv[1]["growth"])[:8]
    print("\nsteepest per-query growth:")
    for name, st in worst:
        flag = " (overhead-bound baseline)" if st["overhead_bound"] else ""
        print(f"  {name:30s} {st['sf0.01_sec']:7.3f} -> {st['sf0.1_sec']:7.3f} "
              f"= {st['growth']:6.2f}x{flag}")


if __name__ == "__main__":
    main()
