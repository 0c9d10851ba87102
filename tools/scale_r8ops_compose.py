#!/usr/bin/env python3
"""Compose SCALE_R8OPS.json — three-decade evidence for the round-8
operators (kNN join, mutual-kNN clustering, BFS hops, quota fill,
perceptual-hash dedup, positional zip join, Mahalanobis outlier scrub,
centroid drift, LSH eval harness, hybrid RRF retrieval).

Inputs: BenchReps JSONs at sf0.1 / 10x / 100x (same host, same session
style) and the verify_local logs of the 10x and 100x oracle compares.
Output schema matches SCALE_NEWOPS.json (per-query reps/medians per
decade, growth ratios, fitted log-log slope, oracle rows at each scale).
"""
import json, math, re, sys

reps1_p, reps10_p, reps100_p, duck10_p, duck100_p, out_p = sys.argv[1:7]

reps1 = json.load(open(reps1_p))["queries"]
reps10 = json.load(open(reps10_p))["queries"]
reps100 = json.load(open(reps100_p))["queries"]


def parse_duck(path):
    out = {}
    for line in open(path):
        m = re.match(r"(OK-\S+|FAIL\S*)\s+(\S+) rows=(\d+)", line.strip())
        if m:
            out[m.group(2)] = "%s rows=%s" % (m.group(1), m.group(3))
    return out


duck10, duck100 = parse_duck(duck10_p), parse_duck(duck100_p)

NOTES = {
    "dedup_lsh_eval":
        "cost tracks duplicate-PAIR mass (rare-shingle blocks + LSH "
        "buckets), not corpus size: true pairs measured from the query "
        "output = 256 (sf0.1) / 20,149 (10x) / 2,149,000 (100x). The "
        "10x->100x decade grows verified-pair work 107x while wall "
        "clock grows 20x - sub-proportional in the work driver; the "
        "sf0.1->10x wall-clock INVERSION is the fixture's organic dup "
        "groups being denser than ScaleGen's bounded groups of 10",
}

out = {}
for q in reps100:
    if q not in reps1 or q not in reps10:
        print("skip %s: missing from %s" % (
            q, "sf0.1 reps" if q not in reps1 else "10x reps"),
            file=sys.stderr)
        continue
    m1, m10, m100 = (reps1[q]["median"], reps10[q]["median"],
                     reps100[q]["median"])
    entry = {
        "sf0.1": reps1[q],
        "x10": reps10[q],
        "growth": round(m10 / m1, 2),
        "x100": reps100[q],
        "growth_10x_to_100x": round(m100 / m10, 2),
    }
    xs, ys = [0.0, 1.0, 2.0], [math.log10(m1), math.log10(m10),
                               math.log10(m100)]
    xbar, ybar = sum(xs) / 3, sum(ys) / 3
    entry["loglog_slope"] = round(
        sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) /
        sum((x - xbar) ** 2 for x in xs), 2)
    if q in duck10:
        entry["oracle_10x"] = duck10[q]
    if q in duck100:
        entry["oracle_100x"] = duck100[q]
    if q in NOTES:
        entry["note"] = NOTES[q]
    out[q] = entry

json.dump({
    "slice": "10x and 100x of sf0.1 (ScaleGen, Aug-14 fixtures; "
             "near-dup groups of 10)",
    "note": "round-8 operators; 5-rep medians per decade, same host and "
            "session style per decade; oracles = DuckDB over the slice "
            "parquet via tools/verify_local.py",
    "queries": out,
}, open(out_p, "w"), indent=1)
print(json.dumps({q: {k: v for k, v in e.items()
                      if k not in ("sf0.1", "x10", "x100")}
                  for q, e in out.items()}, indent=1))
