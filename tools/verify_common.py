"""Shared verification contract for tools/check.py and
tools/correctness_json.py: the table list, the DuckDB view bootstrap,
and the row canonicalization. This IS the comparison contract — keeping
it in one module is what stops a float-format or table-list tweak from
silently forking the two verifiers.
"""
import math
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def create_views(con, sf_dir):
    """Register every testdata table as a DuckDB view. Driver testdata
    ships single files; Spark (ScaleData) writes directories named
    <t>.parquet/ — glob whichever layout exists."""
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")


def canon(rows, cols):
    """Engine-neutral row canonicalization: columns sorted by name,
    floats via %.17g (nan spelled out), values repr'd, rows sorted."""
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
