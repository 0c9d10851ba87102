#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle comparison.

Usage: python3 tools/verify_local.py [outDir] [query ...]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<query>/ parquet dirs + oracle_sql.json. Optional query-name args
restrict the compare to that subset (scale runs dump only a few queries).

Mimics the driver: registers each testdata table as a DuckDB view, runs the
oracle SQL, sorts columns by name, compares cell values (exact + tolerance).

Env knobs for large-slice (10x/100x) compares:
  SF_DIR       parquet table dir (default /root/testdata/sf0.01)
  DUCK_TMP     DuckDB temp_directory (default: DuckDB's cwd-relative .tmp —
               set this to a spacious filesystem; the 100x pagerank oracle
               needs tens of GB of sort temp)
  DUCK_MEM     DuckDB memory_limit, e.g. '24GB'
"""
import json, sys, glob, math, os
import duckdb

# override with SF_DIR=/root/testdata/sf0.1 for 10x-scale spot checks
SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
ONLY = set(sys.argv[2:])

con = duckdb.connect()
if os.environ.get("DUCK_TMP"):
    os.makedirs(os.environ["DUCK_TMP"], exist_ok=True)
    con.sql(f"SET temp_directory = '{os.environ['DUCK_TMP']}'")
if os.environ.get("DUCK_MEM"):
    con.sql(f"SET memory_limit = '{os.environ['DUCK_MEM']}'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # subset ScaleGen slices (fourth-decade single-table probes) omit the
    # tables their ops don't read; a missing view only matters if an
    # oracle in the restricted compare set actually references it
    if os.path.exists(f"{SF_DIR}/{t}.parquet"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    else:
        print(f"[verify_local] {t}.parquet missing in {SF_DIR}; view skipped",
              file=sys.stderr)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
if ONLY:
    oracle = {k: v for k, v in oracle.items() if k in ONLY}
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.sql(f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
        exp = con.sql(sql).fetchall()
        ecols = [d[0] for d in con.sql(f"SELECT * FROM ({sql}) LIMIT 0").description]
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}"); fail += 1; continue
    # dtype parity (the OracleLintSpec HUGEINT lint's runtime sibling):
    # the driver hash is dtype-sensitive — a value-equal oracle whose
    # declared type lands in a different pandas dtype (epoch() DOUBLE vs
    # Spark BIGINT, round-7 join_interval_overlap) hashes red while the
    # tolerance compare below stays green. Compare declared DuckDB types
    # mapped to the pandas dtype class the driver would materialize.
    def pdclass(t):
        t = t.upper()
        if t.startswith("DECIMAL"): return "float64"
        if t.startswith("TIMESTAMP"): return "ts"
        if t.startswith("STRUCT") or t.startswith("MAP("): return "object"
        if t.endswith("[]"): return "list"
        return {"TINYINT": "int64", "SMALLINT": "int64", "INTEGER": "int64",
                "BIGINT": "int64", "HUGEINT": "float64",
                "UTINYINT": "uint", "USMALLINT": "uint", "UINTEGER": "uint",
                "UBIGINT": "uint", "FLOAT": "float64", "DOUBLE": "float64",
                "BOOLEAN": "bool", "VARCHAR": "object", "DATE": "date",
                "TIME": "time", "BLOB": "bytes", "INTERVAL": "td"}.get(t, t)
    try:
        gtypes = {r[0]: r[1] for r in
                  con.sql(f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
        etypes = {r[0]: r[1] for r in
                  con.sql(f"DESCRIBE SELECT * FROM ({sql})").fetchall()}
        dt_bad = [f"{c}: spark={gtypes[c]}({pdclass(gtypes[c])}) "
                  f"oracle={etypes[c]}({pdclass(etypes[c])})"
                  for c in gcols if pdclass(gtypes[c]) != pdclass(etypes[c])]
    except Exception as e:
        dt_bad = [f"describe failed: {e}"]
    if dt_bad:
        print(f"FAIL {name}: dtype parity: {'; '.join(dt_bad)}"); fail += 1; continue
    gperm = sorted(range(len(gcols)), key=lambda i: gcols[i])
    eperm = sorted(range(len(ecols)), key=lambda i: ecols[i])
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fail += 1; continue
    worst = 0.0; bad = None; exact = True
    for r, (g, e) in enumerate(zip(got, exp)):
        for gi, ei in zip(gperm, eperm):
            a, b = g[gi], e[ei]
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb): continue
                d = abs(fa - fb)
                if fa != fb: exact = False
                rel = d / max(abs(fa), abs(fb), 1e-12)
                if rel > worst: worst, bad = rel, (r, gcols[gi], a, b)
            elif a != b:
                # normalize hugeint/int width
                try:
                    if int(a) == int(b): continue
                except (TypeError, ValueError): pass
                if str(a) == str(b): continue
                print(f"FAIL {name}: row {r} col {gcols[gi]}: {a!r} != {b!r}")
                fail += 1; bad = "reported"; break
        if bad == "reported": break
    if bad == "reported": continue
    status = "OK-exact" if exact else (f"OK-tol maxrel={worst:.2e} at {bad}" if worst < 1e-9 else f"FAIL-float maxrel={worst:.2e} at {bad}")
    if status.startswith("FAIL"): fail += 1
    print(f"{status:<60} {name} rows={len(got)}")
print(f"\n{'ALL OK' if fail == 0 else f'{fail} FAILURES'} ({len(oracle)} oracle queries)")
sys.exit(1 if fail else 0)
