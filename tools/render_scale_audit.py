#!/usr/bin/env python3
"""Render target/scale_audit.json as the SCALE.md slope table.

Usage: python3 tools/render_scale_audit.py [path-to-json]
Prints a markdown table (query | sf0.1 | x10 | slope) plus a summary
line (max slope, flagged count) for pasting into SCALE.md's
"Measured scale slopes" section.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/scale_audit.json"
d = json.load(open(path))
qs = d["queries"]
flag = d.get("flag_above", 15.0)


def qnum(name):
    digits = ""
    for c in name[1:]:
        if not c.isdigit():
            break
        digits += c
    return int(digits) if digits else 0


rows = sorted(qs.items(), key=lambda kv: (qnum(kv[0]), kv[0]))
print("| Query | sf0.1 | ×10 | slope |")
print("|---|---|---|---|")
flagged = []
for name, v in rows:
    mark = " †" if v["slope"] > flag else ""
    if v["slope"] > flag:
        flagged.append(name)
    print(f"| {name} | {v['small']:.2f}s | {v['big']:.2f}s | "
          f"{v['slope']:.1f}{mark} |")
mx = max(rows, key=lambda kv: kv[1]["slope"])
print()
print(f"n={len(rows)} max_slope={mx[1]['slope']:.1f} ({mx[0]}) "
      f"flagged(> {flag}): {flagged or 'none'}")
