#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the paired
SQL from oracle_sql.json in DuckDB (with each raw parquet table registered as
a view named after the table), then compares:
  - row count, column names (sorted)
  - values: exact for non-floats; exact + 1e-9-relative report for floats
Exit code 0 iff everything matches exactly (the driver hashes values, so
"close" floats are flagged loudly).
"""
import json, math, sys, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver data is one file per table; MakeScale-derived dirs hold
        # part files
        path = f"{sf_dir}/{t}.parquet"
        glob_path = path if os.path.isfile(path) else f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob_path}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # Read the result directory EXACTLY the way the driver does:
        # pyarrow.parquet.read_table(dir). It treats every file not
        # prefixed with "_" or "." as a parquet fragment — a stray
        # rows.txt in the dir zeroed all 126 driver rows in round 9
        # while a *.parquet glob here stayed green. Never diverge again.
        try:
            got = pq.read_table(d)
        except Exception as e:
            print(f"[compare] {name}: RESULT DIR UNREADABLE (driver-style read): {e}")
            failures += 1
            continue
        if name not in oracle:
            print(f"[compare] {name}: NO ORACLE (rows={got.num_rows}) — rows-only check")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[compare] {name}: ORACLE SQL FAILED: {e}")
            failures += 1
            continue
        ok = True
        # Arrow TYPE parity, not just value equality: the driver hashes
        # values, and e.g. DuckDB's sum(BIGINT) -> HUGEINT surfaces as
        # decimal128(38,0) vs Spark's int64 — Python compares
        # Decimal(123) == 123 as True, so a value-level check alone
        # masked q9's three-round driver hash mismatch. Cast the oracle
        # (e.g. CAST(sum(x) AS BIGINT)) until types agree.
        gtypes = {f.name: str(f.type) for f in got.schema}
        etypes = {f.name: str(f.type) for f in exp.schema}
        for c in sorted(set(gtypes) & set(etypes)):
            if gtypes[c] != etypes[c]:
                print(f"[compare] {name}: TYPE MISMATCH {c}: spark={gtypes[c]} oracle={etypes[c]}")
                ok = False
        if sorted(got.column_names) != sorted(exp.column_names):
            print(f"[compare] {name}: COLUMN MISMATCH got={sorted(got.column_names)} exp={sorted(exp.column_names)}")
            ok = False
        if got.num_rows != exp.num_rows:
            print(f"[compare] {name}: ROWCOUNT got={got.num_rows} exp={exp.num_rows}")
            ok = False
        if ok:
            cols = sorted(got.column_names)
            g = got.select(cols).to_pylist()
            e = exp.select(cols).to_pylist()
            n_exact = n_close = n_bad = 0
            for rg, re_ in zip(g, e):
                for c in cols:
                    a, b = norm_cell(rg[c]), norm_cell(re_[c])
                    if a == b or (a is None and b is None):
                        n_exact += 1
                    elif isinstance(a, float) and isinstance(b, float) and \
                            abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
                        n_close += 1
                        if n_close <= 3:
                            print(f"    float-close {name}.{c}: {a!r} vs {b!r}")
                    else:
                        n_bad += 1
                        if n_bad <= 5:
                            print(f"    MISMATCH {name}.{c}: got={a!r} exp={b!r}")
            if n_bad or n_close:
                print(f"[compare] {name}: exact={n_exact} close={n_close} BAD={n_bad} rows={got.num_rows}")
                ok = False
            else:
                print(f"[compare] {name}: OK rows={got.num_rows} cols={len(cols)}")
        if not ok:
            failures += 1
    print(f"[compare] failures={failures}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
