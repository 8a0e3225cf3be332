#!/usr/bin/env python3
"""Assemble the q93 past-knee artifact (r16 verdict #4): the q76-vs-q93
comparison at a corpus PAST the 262k-vector one-long clamp knee, as a
board-adjacent cell — registered-query walls from a Bench detail file
(board protocol: noop materialization, min-of-reps, shuffle/spill
recorded) joined with the band-width/occupancy/candidate legs from a
ProbeRhWide run on the SAME corpus.

Usage: q93_pastknee_merge.py <bench_detail.json> <rhwide_probe.json> <out.json>
"""
import json
import sys


def main(detail_path, probe_path, out_path):
    det = json.load(open(detail_path))["detail"]
    probe = json.load(open(probe_path))

    def cell(name):
        q = det[name]
        assert q.get("err") in (None, "null"), f"{name} errored: {q.get('err')}"
        return {
            "wall_min_sec": round(min(q["reps"]), 3),
            "wall_reps": q["reps"],
            "cpu_min_sec": round(min(q["cpu_reps"]), 1) if q.get("cpu_reps") else None,
            "shuffle_mb_max": max(q.get("shuf_mb") or [0]),
            "spill_mb_max": max(q.get("spill_mb") or [0]),
            "rows": q["rows"],
        }

    legs = {(l["mode"], l["n"]): l for l in probe["legs"]}
    n = max(x for _, x in legs)
    clamped = legs[("clamped15", n)]
    wide = legs[("wide", n)]
    art = {
        "probe": "q93_pastknee_board_cell",
        "note": "registered q76 (clamped 15-bit one-long rule) vs q93 "
            "(wide rh_band_keys rule) on the same past-knee corpus, board "
            "protocol; band_bits/occupancy/candidates from ProbeRhWide on "
            "the identical corpus. This cell replaces q93's knee-rung "
            "board slot, where both rules pick the same width and the "
            "cell only measured q76's work plus a payload premium.",
        "corpus_n_vectors": n,
        "q76_rh_lsh_stats": {**cell("q76_rh_lsh_stats"),
            "band_bits": clamped["band_bits"],
            "occ_mean": clamped["occ_mean"], "occ_p99": clamped["occ_p99"],
            "candidate_pairs": clamped["candidate_pairs"]},
        "q93_rh_wide_stats": {**cell("q93_rh_wide_stats"),
            "band_bits": wide["band_bits"],
            "occ_mean": wide["occ_mean"], "occ_p99": wide["occ_p99"],
            "candidate_pairs": wide["candidate_pairs"]},
        "sources": {"bench_detail": detail_path, "rhwide_probe": probe_path},
    }
    art["wide_vs_clamped_wall"] = round(
        art["q93_rh_wide_stats"]["wall_min_sec"]
        / max(art["q76_rh_lsh_stats"]["wall_min_sec"], 1e-9), 3)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in (
        "corpus_n_vectors", "wide_vs_clamped_wall")} |
        {"q76_wall": art["q76_rh_lsh_stats"]["wall_min_sec"],
         "q93_wall": art["q93_rh_wide_stats"]["wall_min_sec"],
         "q76_bits": art["q76_rh_lsh_stats"]["band_bits"],
         "q93_bits": art["q93_rh_wide_stats"]["band_bits"]}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
