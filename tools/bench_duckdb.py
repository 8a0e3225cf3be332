#!/usr/bin/env python3
"""Builder-side baseline probe: time each oracle SQL in DuckDB at a given sf
and print seconds per query, for comparison against graft.Bench output.
Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir(with oracle_sql.json)> [skip1,skip2,...]

The optional skip list is for the hash-family queries (q42/q43/q44/q48/
q63/q77), whose oracles execute our generated hash64 chain — minutes each at
10x scale and not a measurement of DuckDB anyway (SCALING.md caveat).
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"  # spark-written directory layout
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    # min-of-reps (default 2, env DUCK_REPS): the r14 box shows intermittent
    # kernel-time storms inflating single passes — same statistic as the
    # Spark leg (enginecmp_merge). A first pass over 30 s is not repeated
    # (the storm amplitude is irrelevant at that magnitude).
    reps = int(os.environ.get("DUCK_REPS", "2"))
    for name in sorted(oracle):
        if any(name.startswith(s) for s in skip):
            continue
        try:
            best = None
            for r in range(reps):
                t0 = time.time()
                con.execute(oracle[name]).fetchall()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
                if sec > 30:
                    break
            times[name] = round(best, 3)
        except Exception as e:
            times[name] = None
            print(f"{name}: FAILED {e}", file=sys.stderr)
    print(json.dumps({"total": round(sum(v for v in times.values() if v), 2),
                      "queries": times}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3].split(",") if len(sys.argv) > 3 else ())
