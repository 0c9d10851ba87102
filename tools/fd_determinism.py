#!/usr/bin/env python3
"""Fourth-decade determinism check: two independent Verify dumps of the
same query on the same slice must agree in row count AND content hash
(the correctness signal where the DuckDB dual is infeasible at 5M docs).
Usage: fd_determinism.py <v1Dir> <v2Dir> <query ...>
Prints one JSON object {query: {rows, hash_match}}."""
import glob, json, sys
import duckdb

v1, v2 = sys.argv[1], sys.argv[2]
out = {}
con = duckdb.connect()
for q in sys.argv[3:]:
    f1 = glob.glob(f"{v1}/{q}/*.parquet")
    f2 = glob.glob(f"{v2}/{q}/*.parquet")
    if not f1 or not f2:
        out[q] = {"rows": None, "hash_match": None,
                  "err": f"missing dump ({'v1' if not f1 else 'v2'})"}
        continue
    def agg(files):
        cols = [d[0] for d in
                con.sql(f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
        # COALESCE each column: concat_ws silently SKIPS NULLs, so two
        # dumps differing only in which column is NULL (or NULL vs '')
        # would hash equal without the sentinel (ADVICE round 10)
        collist = ", ".join(
            f"COALESCE(CAST(\"{c}\" AS VARCHAR), '<null>')" for c in sorted(cols))
        return con.sql(
            f"SELECT COUNT(*), md5(string_agg(r, '|' ORDER BY r)) FROM ("
            f"SELECT concat_ws(',', {collist}) AS r "
            f"FROM read_parquet({files!r}))").fetchone()
    (n1, h1), (n2, h2) = agg(f1), agg(f2)
    # an empty-vs-empty pair matches via NULL == NULL — surface it: rows=0
    # plus an explicit flag so a silent no-output run cannot read as green
    out[q] = {"rows": n1, "rows_match": n1 == n2,
              "hash_match": (h1 == h2) if n1 or n2 else True,
              "empty_both": (n1 == 0 and n2 == 0) or None}
    if out[q]["empty_both"] is None:
        del out[q]["empty_both"]
print(json.dumps(out, indent=1))
