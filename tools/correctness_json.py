#!/usr/bin/env python3
"""Driver-style correctness artifact: compare Verify result parquet
against DuckDB oracles (same canonicalization as tools/check.py) and
write a CORRECTNESS-style JSON with per-gate timing.
Usage: tools/correctness_json.py <sfdir> <outdir> <artifact.json>
"""
import json, math, sys, glob, os, time

SF, OUT, ART = sys.argv[1], sys.argv[2], sys.argv[3]

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver testdata ships single files; Spark (ScaleData) writes
    # directories named <t>.parquet/ — glob whichever layout exists
    p = f"{SF}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = ("%.17g" % v) if not math.isnan(v) else "nan"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out

result = {}
for name in sorted(oracle.keys()):
    res_dir = f"{OUT}/{name}"
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "oracle_sec": None}
    result[name] = rec
    if not os.path.isdir(res_dir):
        rec["err"] = "no result parquet"; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        gcols, grows = got.columns, got.fetchall()
        t0 = time.time()
        exp = con.sql(oracle[name])
        ecols, erows = exp.columns, exp.fetchall()
        rec["oracle_sec"] = round(time.time() - t0, 2)
    except Exception as e:
        rec["err"] = f"oracle error: {e}"[:300]; continue
    rec["spark_rows"], rec["oracle_rows"] = len(grows), len(erows)
    rec["rows_match"] = len(grows) == len(erows)
    rec["schema_match"] = sorted(c.lower() for c in gcols) == \
        sorted(c.lower() for c in ecols)
    if rec["schema_match"]:
        rec["hash_match"] = canon(grows, [c.lower() for c in gcols]) == \
            canon(erows, [c.lower() for c in ecols])
    print(f"{name}: rows={rec['rows_match']} schema={rec['schema_match']} "
          f"hash={rec['hash_match']} ({rec['spark_rows']} rows, "
          f"oracle {rec['oracle_sec']}s)", flush=True)

json.dump(result, open(ART, "w"), indent=1)
ok = sum(1 for r in result.values()
         if r["rows_match"] and r["schema_match"] and r["hash_match"])
print(f"\n{ok}/{len(result)} fully green -> {ART}")
sys.exit(0 if ok == len(result) else 1)
