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

# --- Spark-compatible xxhash64 (seed 42), registered as a DuckDB UDF -------
# Reference XXH64 over the UTF-8 bytes, identical to Spark's
# XxHash64Function.hash(UTF8String, StringType, 42) — validated value-exact
# against `spark.sql("select xxhash64(s)")` for empty/short/long/multibyte
# strings. The oracle SQL for the xxhash64 query family (q42/q43/q44/q48)
# builds everything else (multiply-shift slots, bit votes, windows) in SQL.
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc, k):
    acc = (acc + k * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(s, seed=42):
    data = s.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round64(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round64(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round64(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round64(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round64(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round64(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.create_function("xxh64", lambda s: xxh64(s),
                        [duckdb.typing.VARCHAR], duckdb.typing.BIGINT)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
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
    missing = set(json.load(open(f"{out_dir}/oracle_sql.json")))
    print(f"== {n_pass} pass / {n_fail} fail / {len(missing)} total ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
