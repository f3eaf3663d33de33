#!/usr/bin/env python3
"""STRICT bit-exact variant of tools/check.py: floats normalized via
hex() (no rounding), timestamps to UTC-naive — catches 1-ulp
cross-engine divergences the 6-dp compare hides.

Usage: python3 tools/exact_check.py <sfDir> <verifyOutDir> [query ...]
Dev tool only — NOT part of the Scala library.
"""
import sys, json, glob, math, datetime
import duckdb
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
print(f"duckdb {duckdb.__version__} / "
      + con.execute("SELECT version()").fetchone()[0])
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# type-contract guard (see tools/check.py SAFE_TYPES): uncast HUGEINT
# etc. in a gated output is the r7 driver-only red-cell class
SAFE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "DATE", "VARCHAR",
              "TIMESTAMP", "BOOLEAN"}
def norm(v):
    if isinstance(v, float):
        return v.hex() if not math.isnan(v) else "NaN"
    if hasattr(v,'isoformat'):
        if hasattr(v,'tzinfo') and v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v
for name in (sorted(only) if only else sorted(oracle)):
    sql = oracle[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(name, "SKIP (no spark output in out_dir)")
        continue
    exotic = [(c, t) for c, t, *_ in con.execute(f"DESCRIBE {sql}")
              .fetchall() if t not in SAFE_TYPES]
    if exotic:
        print(name, f"EXACT-FAIL exotic oracle output types {exotic}")
        continue
    sq = f"SELECT * FROM read_parquet({files!r})"
    scols = [d[0] for d in con.execute(sq).description]
    srows = con.execute(sq).fetchall()
    ocols = [d[0] for d in con.execute(sql).description]
    orows = con.execute(sql).fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    S = sorted([tuple(norm(r[i]) for i in so) for r in srows], key=str)
    O = sorted([tuple(norm(r[i]) for i in oo) for r in orows], key=str)
    diffs = [(a,b) for a,b in zip(S,O) if a!=b]
    print(name, "EXACT-PASS" if not diffs else f"EXACT-FAIL {len(diffs)} rows differ")
    for a,b in diffs[:5]:
        print("  spark :", a)
        print("  oracle:", b)
