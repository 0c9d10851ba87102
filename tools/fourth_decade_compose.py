#!/usr/bin/env python3
"""Assemble the fourth-decade block for SCALE_R9OPS.json (VERDICT r8 #4):
the steepest round-8 log-log slopes probed one decade past the 100x
slice, on single-table-subset ScaleGen slices (documents-only 1000x for
the dedup family; lineitem+orders 300x for the salted join).

Inputs: the docs1000/li300 BenchReps JSONs, the prior per-query 100x
medians (SCALE100X.json / SCALE_R8OPS.json for the prefix-containment
row), and an oracle-status JSON {query: status-string} for the slices
where the DuckDB dual was tractable.

The implied slope uses the actual decade width: docs1000 is 10x the
100x slice (slope per log10), li300 is 3x (slope = log(r)/log(3)).
"""
import json, math, os, sys

docs_p, li_p, oracle_p, out_p = sys.argv[1:5]
docs = json.load(open(docs_p))["queries"]
li = json.load(open(li_p))["queries"]
oracle = json.load(open(oracle_p))

# prior-medians files live at the repo root; optional argv 5/6 override
# so the tool works from any CWD
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
s100_p = sys.argv[5] if len(sys.argv) > 5 else os.path.join(repo, "SCALE100X.json")
r8_p = sys.argv[6] if len(sys.argv) > 6 else os.path.join(repo, "SCALE_R8OPS.json")
s100 = json.load(open(s100_p))["queries"]
r8 = json.load(open(r8_p))["queries"]

PRIOR_X100 = {
    "dedup_minhash_lsh": s100["dedup_minhash_lsh"]["x100_median_s"],
    "dedup_span_suffix": s100["dedup_span_suffix"]["x100_median_s"],
    "join_salted_skew": s100["join_salted_skew"]["x100_median_s"],
    # the containment row was rewritten to the prefix form in round 8;
    # its current-code 100x median lives in SCALE_R8OPS
    "dedup_containment": r8["dedup_containment_prefix"]["x100"]["median"],
}
PRIOR_SLOPE = {
    "dedup_minhash_lsh": s100["dedup_minhash_lsh"]["loglog_slope"],
    "dedup_span_suffix": s100["dedup_span_suffix"]["loglog_slope"],
    "join_salted_skew": s100["join_salted_skew"]["loglog_slope"],
    "dedup_containment": r8["dedup_containment_prefix"]["loglog_slope"],
}
SLICE = {
    "dedup_minhash_lsh": ("docs1000", 10.0),
    "dedup_containment": ("docs1000", 10.0),
    "dedup_span_suffix": ("docs1000", 10.0),
    "join_salted_skew": ("li300", 3.0),
}

out = {}
for q, (slice_name, widen) in SLICE.items():
    reps = (docs if slice_name == "docs1000" else li).get(q)
    if reps is None:
        # no timing yet — keep the row so an aborted width-32 attempt
        # (its story in the oracle-json width_note) is still recorded
        entry = {"slice": slice_name, "x100_median_s": PRIOR_X100[q],
                 "prior_three_decade_slope": PRIOR_SLOPE[q],
                 "fourth_median_s": None}
        extra = oracle.get(q)
        if isinstance(extra, dict):
            entry.update(extra)
        elif extra is not None:
            # mirror the with-reps branch: a bare status string is still
            # worth recording (e.g. an abort note with no timing)
            entry["oracle_fourth"] = extra
        out[q] = entry
        print(f"note {q}: no reps yet in {slice_name}", file=sys.stderr)
        continue
    m4, m100 = reps["median"], PRIOR_X100[q]
    ratio = m4 / m100
    out[q] = {
        "slice": slice_name,
        "x100_median_s": m100,
        "fourth_median_s": m4,
        "fourth_reps_s": reps["reps"],
        "growth_vs_x100": round(ratio, 2),
        "decade_width_x": widen,
        "implied_slope": round(math.log(ratio) / math.log(widen), 2),
        "prior_three_decade_slope": PRIOR_SLOPE[q],
    }
    extra = oracle.get(q)
    if isinstance(extra, dict):
        out[q].update(extra)
    elif extra is not None:
        out[q]["oracle_fourth"] = extra

json.dump(out, open(out_p, "w"), indent=1)
print(json.dumps(out, indent=1))
