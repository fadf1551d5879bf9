#!/usr/bin/env python3
"""Build BENCH_SUMMARY_sf1.json — the r12 full-suite scaling gate.

Inputs: the sf1 no-retry Bench stdout JSON (per-query seconds at
sf1 = 10x rows) and the current sf0.1 BENCH_SUMMARY.json (per-query
seconds at sf0.1). Emits per query: sf1 seconds, sf0.1 seconds, the
sf1/sf0.1 scaling factor, and whether it clears the stated line
(13x at 10x data — the round-6 cliff-audit convention: linear-ish
operators land well under it; n^1.5-class builds approach it).

Usage: sf1_summary.py <sf1_stdout.json> <sf0.1_summary.json> <out.json> [line]
"""
import json
import sys


def main() -> None:
    sf1_path, sf01_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    line = float(sys.argv[4]) if len(sys.argv) > 4 else 13.0
    sf1 = json.load(open(sf1_path))["queries"]
    sf01 = json.load(open(sf01_path))["queries"]
    rows = {}
    over = []
    missing_ref = []
    for name, t1 in sorted(sf1.items()):
        t01 = sf01.get(name)
        if t01 is None or t01 <= 0:
            missing_ref.append(name)
            # uniform row schema: consumers iterate queries and read
            # under_line; the missing-reference branch must carry it too
            rows[name] = {
                "sf1_s": round(t1, 3),
                "sf01_s": None,
                "scale": None,
                "under_line": None,
            }
            continue
        scale = t1 / t01
        rows[name] = {
            "sf1_s": round(t1, 3),
            "sf01_s": round(t01, 3),
            "scale": round(scale, 2),
            "under_line": scale <= line,
        }
        if scale > line:
            over.append((name, round(scale, 2)))
    over.sort(key=lambda x: -x[1])
    out = {
        "metric": "sf1_scaling_gate",
        "data_multiple": 10,
        "line": line,
        "n_queries": len(rows),
        "n_over_line": len(over),
        "over_line": dict(over),
        "missing_sf01_reference": missing_ref,
        "sf1_total_s": round(sum(sf1.values()), 1),
        "queries": rows,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"{len(rows)} queries, {len(over)} over the {line}x line: {over[:15]}")


if __name__ == "__main__":
    main()
