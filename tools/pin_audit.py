#!/usr/bin/env python3
"""Tolerance audit: compare a fresh bench_full.json against the pin table
currently frozen in BASELINE.md (the 3-column-pair markdown table). Prints
every query whose new wall exceeds 2x its old pin, plus summary stats.
Dev-only tool.

Usage: python3 tools/pin_audit.py <bench_full.json> [baseline_md]
"""
import json, re, sys

bench = json.load(open(sys.argv[1]))
md = open(sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md").read()

pins = {}
for m in re.finditer(r"\|\s*(q_\w+)\s*\|\s*([0-9.]+)\s*(?=\|)", md):
    pins[m.group(1)] = float(m.group(2))

new = {k: v for k, v in bench["queries"].items() if v >= 0}
over = []
for q, sec in sorted(new.items()):
    pin = pins.get(q)
    if pin is not None and sec > 2 * pin:
        over.append((q, pin, sec, sec / pin))

print(f"pins in BASELINE.md: {len(pins)}; queries in bench: {len(new)}; "
      f"unpinned new queries: {len(set(new) - set(pins))}")
print(f"total new: {sum(new.values()):.1f} s; "
      f"like-for-like total (pinned only): "
      f"{sum(v for k, v in new.items() if k in pins):.1f} s vs "
      f"{sum(v for k, v in pins.items() if k in new):.1f} s pinned")
if over:
    print(f"\n{len(over)} queries over 2x pin:")
    for q, pin, sec, r in sorted(over, key=lambda x: -x[3]):
        print(f"  {q}: {sec:.2f} s vs pin {pin:.2f} ({r:.2f}x)")
else:
    print("\nzero queries over 2x pin")
