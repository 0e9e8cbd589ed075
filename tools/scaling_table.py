#!/usr/bin/env python3
"""Render the SCALING.md table from three bench JSON lines.

Usage: python3 tools/scaling_table.py sf0.001.json sf0.01.json sf0.1.json
Prints the markdown table (query | three SF times | 0.01->0.1 ratio) in
the sf0.1 bench's query order, plus the totals line.
"""
import json, sys

def load(p):
    return json.load(open(p))

def main():
    a, b, c = (load(p) for p in sys.argv[1:4])
    qa, qb, qc = a["queries"], b["queries"], c["queries"]
    print("| query | sf0.001 | sf0.01 | sf0.1 | ×(0.01→0.1, 10× data) |")
    print("|---|---|---|---|---|")
    for k in qc:
        va, vb, vc = qa.get(k), qb.get(k), qc[k]
        if vb and vc:
            r = vc / vb
            ratio = "~1" if r < 1.45 else f"{r:.1f}"
        else:
            ratio = "—"
        fa = f"{va:.3f}" if va is not None else "—"
        fb = f"{vb:.3f}" if vb is not None else "—"
        print(f"| {k:<22} | {fa} | {fb} | {vc:.3f} | {ratio} |")
    print()
    print(f"Totals: {a['value']:.1f} / {b['value']:.1f} / {c['value']:.1f} s "
          f"over {len(qc)} queries.")

if __name__ == "__main__":
    main()
