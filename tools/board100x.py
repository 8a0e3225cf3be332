#!/usr/bin/env python3
"""Assemble the 100x full-board artifact from a Bench detail file
(builder-side; r14 refresh of the r11/r12 100x boards under the honest
noop full-materialization protocol — r13 found count()-based timing let
Catalyst prune the measured work, so pre-r13 boards over-reported
projection-heavy queries).

Usage: board100x.py <bd_100x.json> <out.json> <note>
"""
import json
import sys


def main(detail_path, out_path, note):
    d = json.load(open(detail_path))
    det = d["detail"]
    ok = {k: v for k, v in det.items() if v.get("err") in (None, "null")
          and v["sec"] >= 0}
    errs = {k: v["err"] for k, v in det.items() if k not in ok}
    wall = {k: round(min(v["reps"]), 3) for k, v in ok.items()}
    cpu = {k: (round(min(v["cpu_reps"]), 1) if v.get("cpu_reps") else None)
           for k, v in ok.items()}
    slowest = sorted(ok, key=lambda k: -wall[k])[:10]
    art = {
        "probe": note,
        "materialize": "noop",
        "sf": d.get("sf"),
        "queries_run": len(det),
        "green": len(ok),
        "errors": errs,
        "canary": d.get("canary"),
        "total_sec_min_wall": round(sum(wall.values()), 1),
        "total_sec_min_cpu": round(sum(c for c in cpu.values() if c), 1),
        "slowest_10_min_wall": {k: wall[k] for k in slowest},
        "min_wall_sec": wall,
        "min_cpu_sec": cpu,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in (
        "queries_run", "green", "errors", "total_sec_min_wall",
        "total_sec_min_cpu", "slowest_10_min_wall")}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
