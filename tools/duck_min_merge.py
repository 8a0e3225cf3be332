#!/usr/bin/env python3
"""Per-query min across two bench_duckdb.py sessions — the DuckDB analog
of detail_min_merge.py, completing the r16 symmetric two-session protocol
(r15 left the DuckDB 10x leg single-session with a footnote).

Usage: duck_min_merge.py <a.json> <b.json> <out.json>
"""
import json
import sys


def main(pa, pb, out):
    a = json.load(open(pa))
    b = json.load(open(pb))
    qa, qb = a["queries"], b["queries"]
    merged = {}
    prov = {}
    for q in sorted(set(qa) | set(qb)):
        va, vb = qa.get(q), qb.get(q)
        if va is not None and vb is not None:
            merged[q] = min(va, vb)
            prov[q] = "A" if va <= vb else "B"
        elif va is not None:
            merged[q], prov[q] = va, "A(only)"
        elif vb is not None:
            merged[q], prov[q] = vb, "B(only)"
        else:
            merged[q], prov[q] = None, "err"
    # r16 ADVICE: `if v` dropped legitimate 0.0 walls from the total, and
    # an err-in-both-sessions query vanished silently — an incomplete
    # merge read as a faster run. Use `is not None` and surface the count.
    err_cnt = sum(1 for v in merged.values() if v is None)
    json.dump({"total": round(sum(v for v in merged.values()
                                  if v is not None), 2),
               "statistic": "min_of_reps_across_2_sessions",
               "err_queries": err_cnt,
               "sessions": [pa, pb], "session_provenance": prov,
               "queries": merged},
              open(out, "w"))
    pb_cnt = sum(1 for v in prov.values() if v.startswith("B"))
    print(f"wrote {out}: {len(merged)} queries, {pb_cnt} from session B, "
          f"{err_cnt} err in BOTH sessions")
    if err_cnt:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
