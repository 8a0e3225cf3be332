#!/usr/bin/env python3
"""Per-query min across two Bench detail sessions (the sweep-level analog
of the 100x board's spliced_cells protocol: this box's kernel-time storms
are episodic and can inflate ALL reps of a contiguous query range within
one session — r15 measured q78 stable at ~4.9 s in one sf0.1 session and
~1.0-1.4 s isolated on BOTH the r14 and r15 binaries, i.e. session/storm
state, not code). Taking each query's min across sessions keeps the
min-of-reps statistic while giving every cell two independent chances to
dodge a storm window.

Usage: detail_min_merge.py <a.json> <b.json> <out.json> [only_b=q87,...]

only_b: queries whose binary/plan changed between the sessions — their
cells come from session B alone (session A measured a different plan).
Provenance lands in out["session_provenance"].
"""
import json
import sys


def main(pa, pb, out, only_b=()):
    a = json.load(open(pa))
    b = json.load(open(pb))
    da, db = a["detail"], b["detail"]
    merged = {}
    prov = {}
    for q in sorted(set(da) | set(db)):
        va, vb = da.get(q), db.get(q)
        ok_a = va and va.get("err") in (None, "null") and va["reps"] and q not in only_b
        ok_b = vb and vb.get("err") in (None, "null") and vb["reps"]
        if ok_a and ok_b:
            pick = va if min(va["reps"]) <= min(vb["reps"]) else vb
            prov[q] = "A" if pick is va else "B"
        elif ok_b:
            pick, prov[q] = vb, "B(only)"
        elif ok_a:
            pick, prov[q] = va, "A(only)"
        elif q in only_b:
            # only_b means session A measured a DIFFERENT binary/plan for
            # this query: if B has no valid cell, an explicit error beats
            # silently landing A's stale-plan measurement in the merge.
            pick, prov[q] = {"err": f"only_b query has no valid session-B cell ({pb})",
                             "reps": []}, "err(only_b_missing)"
        else:
            pick, prov[q] = (va or vb or {"err": "missing in both sessions",
                                          "reps": []}), "err"
        merged[q] = dict(pick)
        if prov[q] in ("A", "B"):
            # keep BOTH sessions' reps visible for noise inspection
            other = vb if pick is va else va
            merged[q]["reps_other_session"] = other["reps"]
    json.dump({"sf": b.get("sf"), "statistic": "min_of_reps_across_2_sessions",
               "sessions": [pa, pb], "only_b": list(only_b),
               "session_provenance": prov, "detail": merged},
              open(out, "w"))
    pb_cnt = sum(1 for v in prov.values() if v.startswith("B"))
    print(f"wrote {out}: {len(merged)} queries, {pb_cnt} cells from session B")


if __name__ == "__main__":
    only = sys.argv[4].split(",") if len(sys.argv) > 4 else ()
    main(sys.argv[1], sys.argv[2], sys.argv[3], only)
