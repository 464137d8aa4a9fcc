#!/usr/bin/env python3
"""Local differential check mimicking the driver's t2 gate:
run graft.Verify at a scale factor, then compare each result parquet
against the DuckDB oracle (columns sorted by name, rows sorted, exact
value compare). Usage: tools/check.py [sfdir] [outdir] [--no-run]
"""
import json, subprocess, sys, glob, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

if "--no-run" not in sys.argv:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stdout.write(r.stderr[-4000:])
        sys.exit(f"Verify failed rc={r.returncode}")

import duckdb
from verify_common import canon, create_views

con = duckdb.connect()
create_views(con, SF)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

fails, passes = [], []
for name in sorted(set(list(oracle.keys()) + [os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)])):
    res_dir = f"{OUT}/{name}"
    if not os.path.isdir(res_dir):
        fails.append((name, "no result parquet")); continue
    got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
    gcols, grows = got.columns, got.fetchall()
    if name not in oracle:
        passes.append((name, f"rows-only ({len(grows)} rows)")); continue
    try:
        exp = con.sql(oracle[name])
        ecols, erows = exp.columns, exp.fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    if sorted(c.lower() for c in gcols) != sorted(c.lower() for c in ecols):
        fails.append((name, f"schema mismatch: got {sorted(gcols)} exp {sorted(ecols)}")); continue
    g, e = canon(grows, [c.lower() for c in gcols]), canon(erows, [c.lower() for c in ecols])
    if g == e:
        passes.append((name, f"OK ({len(g)} rows)"))
    else:
        diff = next(((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b),
                    (min(len(g), len(e)), g[len(e):len(e)+1], e[len(g):len(g)+1]))
        fails.append((name, f"value mismatch rows got={len(g)} exp={len(e)} first diff: {str(diff)[:400]}"))

for n, m in passes: print(f"PASS {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
