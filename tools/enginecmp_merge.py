#!/usr/bin/env python3
"""Merge Spark BENCH_detail files and bench_duckdb.py outputs into one
engine-vs-engine artifact (builder-side only, not shipped library code).

Usage:
    enginecmp_merge.py <spark_sf01_detail> <spark_10x_detail> \
        <duck_sf01> <duck_10x> <out> <method-string>

Queries compared = intersection of all four runs, minus errored entries.
Hash-family queries should already be absent from the DuckDB runs (passed
as the skip list to bench_duckdb.py); anything missing on either side is
reported in "excluded" rather than silently dropped.
"""
import json
import sys


def spark_times(path):
    d = json.load(open(path))
    return {name: q["sec"] for name, q in d["detail"].items()
            if q.get("err") in (None, "null") and q["sec"] >= 0}


def duck_times(path):
    d = json.load(open(path))
    return {name: t for name, t in d["queries"].items() if t is not None}


def main(s01p, s10p, d01p, d10p, out, method):
    s01, s10 = spark_times(s01p), spark_times(s10p)
    d01, d10 = duck_times(d01p), duck_times(d10p)
    shared = sorted(set(s01) & set(s10) & set(d01) & set(d10))
    everything = sorted(set(s01) | set(s10) | set(d01) | set(d10))
    excluded = [q for q in everything if q not in shared]

    def tot(m):
        return round(sum(m[q] for q in shared), 2)

    per_query = {q: {"spark_sf0.1": s01[q], "spark_10x": s10[q],
                     "duckdb_sf0.1": d01[q], "duckdb_10x": d10[q]}
                 for q in shared}
    tail = sorted(shared, key=lambda q: -d10[q])[:3]
    art = {
        "metric": "engine_cmp_r13",
        "method": method,
        "n_queries": len(shared),
        "spark": {"sf0.1_total_sec": tot(s01), "10x_total_sec": tot(s10),
                  "growth": round(tot(s10) / tot(s01), 2)},
        "duckdb": {"sf0.1_total_sec": tot(d01), "10x_total_sec": tot(d10),
                   "growth": round(tot(d10) / tot(d01), 2)},
        "spark_vs_duckdb_same_queries": {
            "sf0.1": round(tot(s01) / tot(d01), 2),
            "10x": round(tot(s10) / tot(d10), 2)},
        "excluded": excluded,
        "duckdb_tail_note": "slowest DuckDB 10x: " + ", ".join(
            f"{q} = {d10[q]} s" for q in tail),
        "per_query": per_query,
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in
                      ("n_queries", "spark", "duckdb",
                       "spark_vs_duckdb_same_queries", "excluded")}))


if __name__ == "__main__":
    main(*sys.argv[1:7])
