#!/usr/bin/env python3
"""Render the frozen BASELINE.md per-query pin table from a bench_full.json
(one full-registry `graft.Bench` run, SPARK_GRAFT_BENCH_ITERS=3, dedicated
machine). Emits a 3-column-pair markdown table sorted by query name, plus a
total line — paste into BASELINE.md's pinned-yardstick section. Dev-only.

Usage: python3 tools/pin_table.py <bench_full.json>
"""
import json, sys, math

d = json.load(open(sys.argv[1]))
qs = {k: v for k, v in d["queries"].items() if v >= 0}
total = sum(qs.values())
items = sorted(qs.items())
print(f"Total: **{total:.1f} s over {len(items)} queries** "
      f"(mean {total/len(items):.2f} s/query).")
print()
print("| query | sec | query | sec | query | sec |")
print("|---|---|---|---|---|---|")
rows = math.ceil(len(items) / 3)
for i in range(rows):
    cells = []
    for c in range(3):
        j = c * rows + i
        if j < len(items):
            cells += [items[j][0], f"{items[j][1]:.2f}"]
        else:
            cells += ["", ""]
    print("| " + " | ".join(cells) + " |")
