#!/usr/bin/env python3
"""Local dev harness approximating the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (Spark output) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with views named after the
testdata tables. Compares: column-name sets, row counts, and cell values
(rows sorted, columns sorted by name, floats rounded to 6 places,
timestamps normalized to UTC-naive microseconds).

Dev tool only — NOT part of the Scala library.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):  # date/datetime
        if hasattr(v, "tzinfo") and v.tzinfo is not None:
            import datetime
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


# The oracle-output type contract (COVERAGE.md determinism rules): every
# gated column must be one of these DuckDB types. Anything else — above
# all HUGEINT, which DuckDB's sum(BIGINT) returns and which different
# fetch paths render as int vs float vs Decimal — is the exact r7
# red-cell class (5/5 driver-only hash mismatches were uncast HUGEINTs).
SAFE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "DATE", "VARCHAR",
              "TIMESTAMP", "BOOLEAN"}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    print(f"duckdb {duckdb.__version__} / "
          + con.execute("SELECT version()").fetchone()[0])
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        sys.exit(f"ERROR: not in oracle_sql.json: {sorted(unknown)} "
                 f"(known: {sorted(oracle)[:5]}...)")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            sq = f"SELECT * FROM read_parquet({files!r})"
            scols = [d[0] for d in con.execute(sq).description]
            srows = con.execute(sq).fetchall()
            ocols = [d[0] for d in con.execute(sql).description]
            orows = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        exotic = [(c, t) for c, t, *_ in con.execute(f"DESCRIBE {sql}")
                  .fetchall() if t not in SAFE_TYPES]
        if exotic:
            print(f"FAIL {name}: exotic oracle output types {exotic} "
                  "(cast to BIGINT/DOUBLE — see SAFE_TYPES)")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        _, s = norm_rows(scols, srows)
        _, o = norm_rows(ocols, orows)
        if s != o:
            diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
