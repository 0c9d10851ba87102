#!/usr/bin/env python3
"""Compose SCALE100X.json — third-decade scale evidence.

Inputs:
  - a BenchReps JSON at the 100x slice (reps + medians per query)
  - the recorded SCALE10X.json (sf0.1 + 10x medians, same host/round)
  - the verify_local output log of the 100x oracle compare
Output: SCALE100X.json — per-operator {sf0.1, 10x, 100x medians, decade
growth ratios, fitted log-log slope over the three decades, oracle
status at 100x}. A slope near 1.0 = linear scaling; < 1 = fixed
per-job overhead still amortizing; the slope is fitted on
(log10 mult, log10 median) over mult in {1, 10, 100}.
"""
import json, math, re, sys

reps100_path, scale10x_path, duck_log, out_path = sys.argv[1:5]
# optional args 5-7: BenchMetrics JSONs at sf0.1 / 10x / 100x — adds a
# host-noise-immune data_movement block per operator (shuffle records /
# input records at each decade + growth ratios)
metrics = [json.load(open(p))["queries"] for p in sys.argv[5:8]] \
    if len(sys.argv) > 5 else None

reps100 = json.load(open(reps100_path))["queries"]
s10 = json.load(open(scale10x_path))["queries"]

oracle = {}
for line in open(duck_log):
    m = re.match(r"(OK-\S+|FAIL\S*)\s+(\S+) rows=(\d+)", line.strip())
    if m:
        oracle[m.group(2)] = {"status": m.group(1), "rows": int(m.group(3))}

CAPPED = {
    "dedup_clusters_star":
        "catalog query caps its corpus at vec_id<300 (brute-force edge "
        "generator is the oracle baseline); the star-CC operator runs "
        "over the FULL corpus inside dedup_pipeline's LSH->CC path",
}
TWIN = {"em_gmm": "em_gmm_fixed", "dedup_minhash_lsh": "dedup_minhash_oracle"}

out = {}
for q, v in reps100.items():
    m100 = v["median"]
    m1 = s10.get(q, {}).get("sf01_median_s")
    m10 = s10.get(q, {}).get("x10_median_s")
    entry = {
        "sf01_median_s": m1,
        "x10_median_s": m10,
        "x100_median_s": m100,
        "x100_reps_s": v["reps"],
        "growth_10x_to_100x": round(m100 / m10, 2) if m10 else None,
    }
    if m1 and m10:
        # least-squares slope of log10(t) on log10(mult) at mult=1,10,100
        xs, ys = [0.0, 1.0, 2.0], [math.log10(m1), math.log10(m10),
                                   math.log10(m100)]
        xbar, ybar = sum(xs) / 3, sum(ys) / 3
        slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / \
            sum((x - xbar) ** 2 for x in xs)
        entry["loglog_slope"] = round(slope, 2)
    oq = TWIN.get(q, q)
    if oq in oracle:
        entry["oracle_at_100x"] = oracle[oq]["status"]
        entry["oracle_rows_at_100x"] = oracle[oq]["rows"]
        if oq != q:
            entry["oracle_via_twin"] = oq
    if q in CAPPED:
        entry["caveat"] = CAPPED[q]
    if metrics and all(q in m for m in metrics):
        m1x, m10x, m100x = (m[q] for m in metrics)
        dm = {}
        for key, label in [("shuffle_write_records", "shuffle_records"),
                           ("input_records", "input_records"),
                           ("shuffle_write_bytes", "shuffle_bytes")]:
            vals = [m1x[key], m10x[key], m100x[key]]
            dm[label] = vals
            if vals[0] > 0:
                dm[label + "_growth"] = [round(vals[1] / vals[0], 2),
                                         round(vals[2] / vals[0], 2)]
        dm["disk_spill_bytes_x100"] = m100x["disk_spill_bytes"]
        entry["data_movement"] = dm
    out[q] = entry

json.dump({"slice": "100x of sf0.1 (ScaleGen v2: 60M lineitem, 10M "
                    "events, 500k documents, 200k embeddings; bounded "
                    "near-dup groups of 10 — see ScaleGenSpec)",
           "queries": out}, open(out_path, "w"), indent=1)
print(json.dumps(out, indent=1))
