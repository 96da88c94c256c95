#!/usr/bin/env python3
"""Assemble the standing 10x artifacts after a bench chain.

Usage:
  python3 tools/assemble_bench10x.py <sized_metric.json> <default_metric.json> <round>

Expects bench_metric.json in the repo root to hold the matching sf0.1
run (the chain's last step). Rewrites BENCH_10X.json and regenerates
the per-query `| query | sf0.1 (s) | 10x (s) | ratio |` table in
BASELINE.md in place (10x column = sized mode, where all queries run).
Prose around the table is NOT touched — update totals/notes by hand.
"""
import json
import sys

sized_p, def_p, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
sized = json.load(open(sized_p))
defm = json.load(open(def_p))
sf01 = json.load(open('bench_metric.json'))
assert sf01['sf'].rstrip('/').endswith('sf0.1'), \
    f"bench_metric.json is not an sf0.1 run: {sf01['sf']}"

bench10x = {
    "corpus": ("ScaleProbeGen 10x of sf0.1 (50k docs / 20k vectors / "
               "1M events / 6M lineitem, constant dup density, disjoint "
               "replica key/vocab spaces)"),
    "round": rnd,
    "modes": {
        "sized_geometry": {
            "note": ("SPARK_GRAFT_SCALE_GEOMETRY=1 - the production "
                     "calling convention: q26/q34/q57 sized via "
                     "suggestBits/suggestCells at corpus count"),
            "result": sized,
        },
        "default_geometry": {
            "note": ("declared test-SF parameters: q26/q34/q57 fail "
                     "loudly at their bucket caps BY DESIGN (the "
                     "spec-pinned stale-geometry fail-fast); remaining "
                     "queries run"),
            "result": defm,
        },
    },
}
json.dump(bench10x, open('BENCH_10X.json', 'w'), indent=1)

rows = []
for q in sorted(sized['queries']):
    t10 = sized['queries'][q]
    t01 = sf01['queries'].get(q)
    ratio = f"{t10 / t01:.1f}x" if t01 else "-"
    t01s = f"{t01:.2f}" if t01 else "-"
    rows.append(f"| {q} | {t01s} | {t10:.2f} | {ratio} |")
table = ("| query | sf0.1 (s) | 10x (s) | ratio |\n|---|---|---|---|\n"
         + "\n".join(rows) + "\n")
src = open('BASELINE.md').read()
start = src.index('| query | sf0.1 (s) | 10x (s) | ratio |')
end = start
for line in src[start:].splitlines(keepends=True):
    if not line.startswith('|'):
        break
    end += len(line)
open('BASELINE.md', 'w').write(src[:start] + table + src[end:])
print("sized", sized['value'], sized['n_ok'], "err", sized['n_err'])
print("default", defm['value'], defm['n_ok'], "err", defm['n_err'],
      list(defm.get('errors', {})))
print("sf0.1", sf01['value'], sf01['n_ok'])
