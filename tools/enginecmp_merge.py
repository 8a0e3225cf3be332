#!/usr/bin/env python3
"""Merge Spark BENCH_detail files and bench_duckdb.py outputs into one
engine-vs-engine artifact (builder-side only, not shipped library code).

Usage:
    enginecmp_merge.py <spark_sf01_detail> <spark_10x_detail> \
        <duck_sf01> <duck_10x> <out> <method-string>

r14 shape (verdict #3/#4):
  - ALL shared queries are timed on both engines, including the hash
    family (q42/q43/q44/q48/q63/q77) — but the HEADLINE ratio stays on
    the idiomatic subset, because the hash-family DuckDB oracles execute
    our generated hash64 chain (a correctness harness, not a native
    DuckDB plan); their numbers are reported as a separate subtotal with
    that caveat machine-readable, plus an all-queries secondary ratio.
  - An overhead-vs-growth decomposition: queries whose Spark wall grows
    <2x across the 10x data step are "flat" (per-query fixed cost
    dominates — JVM scheduling, plan/codegen, single-row-group scan
    floor), the rest "growing" (data-bound). The flat subtotal is where
    the sf0.1 headline margin goes; the growing subtotal is the number
    that predicts cluster behavior.
"""
import json
import sys

HASH_FAMILY = {
    "q42_minhash_signatures", "q43_minhash_lsh_pairs", "q44_simhash",
    "q48_winnowing_fingerprints", "q63_simhash_pairs",
    "q77_simhash_pairs_blocked"}


def spark_times(path):
    # min-of-reps, not median: the r14 box shows intermittent kernel-time
    # storms (SCALING.md "machine-noise episodes") that inflate individual
    # reps 3-30x; for deterministic work the min approximates the
    # uncontended cost. The DuckDB leg uses the same statistic.
    d = json.load(open(path))
    return {name: min(q["reps"]) for name, q in d["detail"].items()
            if q.get("err") in (None, "null") and q["sec"] >= 0 and q["reps"]}


def duck_times(path):
    d = json.load(open(path))
    return {name: t for name, t in d["queries"].items() if t is not None}


def main(s01p, s10p, d01p, d10p, out, method):
    s01, s10 = spark_times(s01p), spark_times(s10p)
    d01, d10 = duck_times(d01p), duck_times(d10p)
    shared = sorted(set(s01) & set(s10) & set(d01) & set(d10))
    everything = sorted(set(s01) | set(s10) | set(d01) | set(d10))
    excluded = [q for q in everything if q not in shared]
    idiom = [q for q in shared if q not in HASH_FAMILY]
    hashq = [q for q in shared if q in HASH_FAMILY]
    flat = [q for q in idiom if s10[q] / max(s01[q], 1e-9) < 2.0]
    growing = [q for q in idiom if q not in flat]

    def tot(m, qs):
        return round(sum(m[q] for q in qs), 2)

    def block(qs):
        return {
            "n_queries": len(qs),
            "spark": {"sf0.1_total_sec": tot(s01, qs),
                      "10x_total_sec": tot(s10, qs),
                      "growth": round(tot(s10, qs) / max(tot(s01, qs), 1e-9), 2)},
            "duckdb": {"sf0.1_total_sec": tot(d01, qs),
                       "10x_total_sec": tot(d10, qs),
                       "growth": round(tot(d10, qs) / max(tot(d01, qs), 1e-9), 2)},
            "spark_vs_duckdb": {
                "sf0.1": round(tot(s01, qs) / max(tot(d01, qs), 1e-9), 2),
                "10x": round(tot(s10, qs) / max(tot(d10, qs), 1e-9), 2)},
        }

    per_query = {q: {"spark_sf0.1": s01[q], "spark_10x": s10[q],
                     "duckdb_sf0.1": d01[q], "duckdb_10x": d10[q]}
                 for q in shared}
    tail = sorted(shared, key=lambda q: -d10[q])[:3]
    art = {
        "metric": "engine_cmp_r14",
        "method": method,
        "headline": block(idiom),
        "headline_note": "idiomatic queries only - the gate ratio. "
            "Hash-family DuckDB oracles execute our generated hash64 chain "
            "(a correctness harness, not a native DuckDB plan), so their "
            "times measure that harness; reported separately below, per "
            "r13 verdict #3, rather than silently excluded or silently "
            "flattering the headline.",
        "hash_family": block(hashq) if hashq else None,
        "all_queries": block(shared),
        "overhead_vs_growth": {
            "flat_note": "flat = Spark wall grows <2x for 10x data: "
                "per-query fixed cost (JVM scheduling, planning, "
                "single-row-group scan floor at these file sizes) "
                "dominates; this subtotal does not scale with data and "
                "is where the sf0.1 margin goes.",
            "flat": block(flat),
            "flat_queries": flat,
            "growing_note": "growing = data-bound at this octave; the "
                "ratio that predicts cluster behavior.",
            "growing": block(growing),
        },
        "excluded": excluded,
        "duckdb_tail_note": "slowest DuckDB 10x: " + ", ".join(
            f"{q} = {d10[q]} s" for q in tail),
        "per_query": per_query,
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"headline": art["headline"],
                      "hash_family": art["hash_family"],
                      "all_queries": art["all_queries"],
                      "flat": art["overhead_vs_growth"]["flat"],
                      "growing": art["overhead_vs_growth"]["growing"],
                      "excluded": excluded}))


if __name__ == "__main__":
    main(*sys.argv[1:7])
