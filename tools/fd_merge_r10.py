#!/usr/bin/env python3
"""Merge the round-10 per-query fourth-decade reps files into the two
inputs fourth_decade_compose.py expects (docs1000 pool / li300 pool)."""
import json, sys
out_docs = {"sf": "docs1000", "queries": {}}
out_li = {"sf": "li300", "queries": {}}
for p in sys.argv[1:]:
    j = json.load(open(p))
    tgt = out_li if j.get("sf") == "li300" else out_docs
    tgt["queries"].update(j["queries"])
json.dump(out_docs, open("target/fd_docs1000_reps.json", "w"), indent=1)
json.dump(out_li, open("target/fd_li300_pool.json", "w"), indent=1)
print("docs:", list(out_docs["queries"]), "li:", list(out_li["queries"]))
