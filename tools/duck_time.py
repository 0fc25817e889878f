#!/usr/bin/env python3
"""Warm min-of-3 DuckDB timing over a Verify dump's oracle_sql.json.

Usage: python3 tools/duck_time.py <sfDir> <verifyOutDir>

Mirrors the Spark Bench methodology (one warmup pass, then three timed
passes taking the per-query min) so the sf0.1 ratio compares like with
like. Prints one JSON line {"total": sec, "queries": {...}}.
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        glob_path = path if os.path.isfile(path) else f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob_path}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracles)
    for n in names:  # warmup
        try:
            con.execute(oracles[n]).fetchall()
        except Exception as e:
            print(f"[duck] {n}: FAILED {e}", file=sys.stderr)

    def timed():
        out = {}
        for n in names:
            t0 = time.time()
            try:
                con.execute(oracles[n]).fetchall()
            except Exception:
                pass
            out[n] = time.time() - t0
        return out

    passes = [timed(), timed(), timed()]
    qs = {n: min(p[n] for p in passes) for n in names}
    print(json.dumps({"total": sum(qs.values()), "queries": qs}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
