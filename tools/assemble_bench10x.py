#!/usr/bin/env python3
"""Assemble the standing 10x artifacts after a bench chain.

Usage:
  python3 tools/assemble_bench10x.py <tenx_metric.json> <round>

Since round 11 the three LSH/cell queries auto-size their geometry
from the corpus count (Similarity.AutoGeometry), so the old
sized/default two-mode chain collapsed into ONE mode: the default
path IS the production calling convention at any scale, and the
stale-geometry fail-fast is exercised by spec (explicitly-passed
small bits/nCells still die at the caps) rather than by a bench mode.

Expects bench_metric.json in the repo root to hold the matching sf0.1
run (the chain's last step). Rewrites BENCH_10X.json and regenerates
the per-query `| query | sf0.1 (s) | 10x (s) | ratio |` table in
BASELINE.md in place. Prose around the table is NOT touched — update
totals/notes by hand.
"""
import json
import sys

tenx_p, rnd = sys.argv[1], int(sys.argv[2])
tenx = json.load(open(tenx_p))
sf01 = json.load(open('bench_metric.json'))
assert sf01['sf'].rstrip('/').endswith('sf0.1'), \
    f"bench_metric.json is not an sf0.1 run: {sf01['sf']}"

bench10x = {
    "corpus": ("ScaleProbeGen 10x of sf0.1 (50k docs / 20k vectors / "
               "1M events / 6M lineitem, constant dup density, disjoint "
               "replica key/vocab spaces)"),
    "round": rnd,
    "modes": {
        "auto_geometry": {
            "note": ("the default path — q26/q34/q57 auto-size "
                     "bits/nCells from the corpus count "
                     "(Similarity.AutoGeometry); no env var, no manual "
                     "suggestBits/suggestCells. The stale-geometry "
                     "fail-fast stays spec-pinned for explicitly "
                     "passed parameters"),
            "result": tenx,
        },
    },
}
json.dump(bench10x, open('BENCH_10X.json', 'w'), indent=1)

rows = []
for q in sorted(tenx['queries']):
    t10 = tenx['queries'][q]
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
print(f"BENCH_10X.json + BASELINE.md table refreshed for round {rnd} "
      f"({len(rows)} queries)")
