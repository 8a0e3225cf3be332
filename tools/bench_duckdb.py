#!/usr/bin/env python3
"""Builder-side baseline probe: time each oracle SQL in DuckDB at a given sf
and print seconds per query, for comparison against graft.Bench output.
Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir(with oracle_sql.json)>
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
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
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = None
            print(f"{name}: FAILED {e}", file=sys.stderr)
    print(json.dumps({"total": round(sum(v for v in times.values() if v), 2),
                      "queries": times}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
