#!/usr/bin/env python3
"""Adapter: rebuild a minimal BENCH_detail-shaped file from a 100x board
artifact (min_wall_sec / min_cpu_sec), so tools/exponents.py can consume a
board whose full detail file was not kept. Min-of-reps is idempotent:
min([min]) == min.

Usage: board_to_detail.py <board.json> <out_detail.json>
"""
import json
import sys


def main(board_path, out_path):
    b = json.load(open(board_path))
    wall, cpu = b["min_wall_sec"], b.get("min_cpu_sec", {})
    detail = {}
    for q, w in wall.items():
        c = cpu.get(q)
        detail[q] = {"sec": w, "rows": -1, "err": None, "reps": [w],
                     "cpu_reps": [c] if c is not None else []}
    json.dump({"sf": b.get("sf"), "detail": detail}, open(out_path, "w"))
    print(f"wrote {out_path}: {len(detail)} queries")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
