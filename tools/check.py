#!/usr/bin/env python3
"""Local correctness loop (builder-side only, not shipped library code).

Mimics the driver's DuckDB-oracle compare: runs each oracle SQL from
verify_out/oracle_sql.json against the sf parquet tables, reads the Spark
result parquet, sorts columns by name and rows by all columns, and compares
cell-exact. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish (e.g. pandas NaT)
            return True
    except Exception:
        pass
    return a == b


def main(sf_dir, out_dir, only=None):
    # bare connection, NO UDFs — the grading harness runs oracle SQL on a
    # plain DuckDB connection, so the local loop must too (the old xxh64
    # UDF masked exactly the q42/q43/q44/q48 failures it was meant to fix)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and only not in name:
            continue
        sql = oracle[name]
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = norm(duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = []
        for ci, c in enumerate(exp.columns):
            ev, gv = exp[c].tolist(), got[c].tolist()
            for ri in range(len(ev)):
                if not cells_equal(ev[ri], gv[ri]):
                    bad.append((ri, c, ev[ri], gv[ri]))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows x {len(exp.columns)} cols)")
            n_pass += 1
    selected = [n for n in oracle if not only or only in n]
    print(f"== {n_pass} pass / {n_fail} fail / {len(selected)} total ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
