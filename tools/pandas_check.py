#!/usr/bin/env python3
"""Pandas-fetch-path replica compare: Spark parquet read via pandas
(pyarrow) vs DuckDB oracle via .df(). Flags value OR dtype-class
divergence after check.py-style normalization — catches int-vs-float
render splits that symmetric tuple fetches hide."""
import sys, json, glob, math
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

import numpy as np
def norm(v):
    if v is None: return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v): return "NULL"
        return repr(round(float(v), 6))   # "5.0" — floats keep their class
    if isinstance(v, (int, np.integer)): return str(int(v))  # "5"
    if hasattr(v, 'isoformat'):
        if hasattr(v, 'tzinfo') and v.tzinfo is not None:
            import datetime
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        iso = v.isoformat()
        return iso[:-9] if iso.endswith('T00:00:00') else iso
    return str(v)

def canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows

bad = 0
for name in (sorted(only) if only else sorted(oracle)):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print("SKIP", name); continue
    sdf = pd.read_parquet(files[0]) if len(files) == 1 else pd.concat([pd.read_parquet(f) for f in files])
    odf = con.execute(oracle[name]).df()
    s, o = canon(sdf), canon(odf)
    if s != o:
        bad += 1
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:2]
        print(f"PANDAS-FAIL {name}: {len([1 for a,b in zip(s,o) if a!=b])} rows differ; first: {diffs}")
for_msg = "all match" if bad == 0 else f"{bad} queries diverge"
print(f"== pandas-path: {for_msg}")
sys.exit(1 if bad else 0)
