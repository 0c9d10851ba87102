#!/usr/bin/env python3
"""Pool BenchReps JSONs from multiple sessions into one reps file.

Usage: reps_pool.py out.json in1.json in2.json [...]

Host noise on this VM class is bimodal (multi-second neighbor stalls),
so a single 3–5-rep session can land its median in the slow mode.
Pooling reps across sessions doubles the sample per query and takes the
median of the pooled list; the full pooled rep list is preserved so the
artifact stays auditable (no silent cherry-picking — every rep from
every session is in the output).
"""
import json, statistics, sys

out_path, in_paths = sys.argv[1], sys.argv[2:]
ins = [json.load(open(p)) for p in in_paths]
sf = ins[0]["sf"]
assert all(i["sf"] == sf for i in ins), "cannot pool across scales"
# medians are only comparable on the same host shape (host-noise memo):
# refuse to pool sessions that ran with different cpu counts
cpus = ins[0]["cpus"]
assert all(i["cpus"] == cpus for i in ins), \
    f"cannot pool across cpu counts: {[i['cpus'] for i in ins]}"

queries = {}
# union of query keys across ALL inputs — iterating only ins[0] silently
# dropped queries benched in later sessions only, contradicting the
# every-rep-is-in-the-output claim above
all_keys = sorted({q for i in ins for q in i["queries"]})
for q in all_keys:
    reps = [r for i in ins for r in i["queries"].get(q, {}).get("reps", [])]
    if not reps:  # present as a key but rep-less in every input
        print(f"[reps_pool] skipping {q}: no reps in any input",
              file=sys.stderr)
        continue
    queries[q] = {"reps": reps,
                  "median": round(statistics.median(reps), 2),
                  "sessions": sum(1 for i in ins
                                  if i["queries"].get(q, {}).get("reps"))}
res = {"sf": sf, "cpus": ins[0]["cpus"], "pooled_from": len(in_paths),
       "reps_per_query": {q: len(v["reps"]) for q, v in queries.items()},
       "queries": queries}
json.dump(res, open(out_path, "w"))
print(json.dumps({q: v["median"] for q, v in queries.items()}, indent=1))
