#!/usr/bin/env python3
"""Driver-style correctness artifact: compare Verify result parquet
against DuckDB oracles (same canonicalization as tools/check.py) and
write a CORRECTNESS-style JSON with per-gate timing.

Gates run in a process pool (--jobs N, default 4) because several
oracles are deliberately brute-force (all-pairs list_intersect /
cosine) and serialize to hours at sf1; each worker caps its DuckDB
threads so the pool shares the machine. Per-gate results persist to
<outdir>/__cmp/<gate>.json as they finish, so a re-run only pays for
gates without a cached verdict (delete __cmp to force).

Usage: tools/correctness_json.py <sfdir> <outdir> <artifact.json> [--jobs N]
"""
import json, sys, os, time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_common import canon, create_views

SF, OUT, ART = sys.argv[1], sys.argv[2], sys.argv[3]
JOBS = int(sys.argv[sys.argv.index("--jobs") + 1]) if "--jobs" in sys.argv else 4


def run_gate(name_sql):
    name, sql = name_sql
    cache = f"{OUT}/__cmp/{name}.json"
    if os.path.exists(cache):
        return name, json.load(open(cache)), True
    import duckdb
    con = duckdb.connect()
    con.sql(f"SET threads={max(2, 32 // JOBS)}")
    create_views(con, SF)
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "oracle_sec": None}
    res_dir = f"{OUT}/{name}"
    if not os.path.isdir(res_dir):
        rec["err"] = "no result parquet"
    else:
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            gcols, grows = got.columns, got.fetchall()
            t0 = time.time()
            exp = con.sql(sql)
            ecols, erows = exp.columns, exp.fetchall()
            rec["oracle_sec"] = round(time.time() - t0, 2)
            rec["spark_rows"], rec["oracle_rows"] = len(grows), len(erows)
            rec["rows_match"] = len(grows) == len(erows)
            rec["schema_match"] = sorted(c.lower() for c in gcols) == \
                sorted(c.lower() for c in ecols)
            if rec["schema_match"]:
                rec["hash_match"] = \
                    canon(grows, [c.lower() for c in gcols]) == \
                    canon(erows, [c.lower() for c in ecols])
        except Exception as e:
            rec["err"] = f"oracle error: {e}"[:300]
    json.dump(rec, open(cache, "w"))
    return name, rec, False


def main():
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    os.makedirs(f"{OUT}/__cmp", exist_ok=True)
    result = {}
    with ProcessPoolExecutor(max_workers=JOBS) as pool:
        for name, rec, cached in pool.map(run_gate, sorted(oracle.items())):
            result[name] = rec
            tag = " (cached)" if cached else ""
            print(f"{name}: rows={rec['rows_match']} "
                  f"schema={rec['schema_match']} hash={rec['hash_match']} "
                  f"({rec['spark_rows']} rows, oracle {rec['oracle_sec']}s)"
                  f"{tag}", flush=True)
    json.dump(result, open(ART, "w"), indent=1)
    ok = sum(1 for r in result.values()
             if r["rows_match"] and r["schema_match"] and r["hash_match"])
    print(f"\n{ok}/{len(result)} fully green -> {ART}")
    sys.exit(0 if ok == len(result) else 1)


if __name__ == "__main__":
    main()
