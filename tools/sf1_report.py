#!/usr/bin/env python3
"""sf1 scale checkpoint: correctness + Spark-vs-DuckDB timing on the derived
sf1 dataset (tools/MakeScale.scala).

Usage: python3 tools/sf1_report.py <sf1Dir> <verifyOutDir> <sparkTimesFile>

 - <verifyOutDir>: graft.Verify dump at sf1 (subset) — compared value-exact
   against each oracle, like tools/compare.py.
 - <sparkTimesFile>: TimeQueries output lines `TIMED <name> min=<sec> ...`.
 - DuckDB oracle timings: min of 2 runs per query on the same process.

The derived events table stores ts as BIGINT nanos (Spark cannot write
parquet TIMESTAMP(NANOS)); the events view converts back to TIMESTAMP so the
unchanged oracle SQL runs. Writes BENCH_sf1.json next to this script's repo
root and prints a per-family table.
"""
import json, math, os, re, sys, time, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FAMILY = {
    "q": "sql+join", "dd": "dedup", "dm": "dedup", "pd": "dedup",
    "tx": "text", "ss": "ann", "sd": "ann", "ao": "temporal",
    "rj": "temporal", "tk": "temporal", "ts": "temporal",
    "mm": "multimodal", "cs": "curation", "dc": "curation", "sp": "curation",
    "ev": "sql+join", "cp": "curation", "ap": "approx",
    # round 12: label the once-"other" tail by its real family
    "rt": "retrieval", "tok": "text", "tc": "text", "ml": "text",
    "emb": "ann", "cq": "ann", "gr": "graph", "ch": "curation",
    "ck": "curation", "cd": "curation", "ds": "curation",
}

# name-level overrides: queries whose wall-clock measures something other
# than their prefix family (q9 times a full relay HTTP round-trip — a
# transport benchmark; see SCALE.md "wire-path queries")
FAMILY_OVERRIDE = {"q9_wire_federation": "wire"}

def family(name):
    if name in FAMILY_OVERRIDE:
        return FAMILY_OVERRIDE[name]
    m = re.match(r"([a-z]+)", name)
    key = m.group(1)
    return FAMILY.get(key) or FAMILY.get(key[:2]) or "other"

def norm_cell(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def main(sf_dir, out_dir, spark_times_file, out_name="BENCH_sf1.json",
         metric="sf1_total"):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        glob_path = path if os.path.isfile(path) else f"{path}/*.parquet"
        if t == "events":
            # the derived events ts dtype follows the driver data's era:
            # BIGINT nanos (legacy TIMESTAMP(NANOS) source) needs the
            # ns->us conversion; a native timestamp passes through
            ts_type = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{glob_path}') LIMIT 1"
            ).fetchone()[0]
            if ts_type in ("BIGINT", "HUGEINT", "INTEGER"):
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) "
                    f"FROM read_parquet('{glob_path}')")
            else:
                con.execute(
                    f"CREATE VIEW events AS SELECT * "
                    f"FROM read_parquet('{glob_path}')")
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob_path}')")

    spark_times = {}
    for line in open(spark_times_file):
        m = re.search(r"TIMED (\S+)\s+min=([0-9.]+)", line)
        if m:
            spark_times[m.group(1)] = float(m.group(2))

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    rows, failures = [], 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name not in oracle:
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        # timing: min of 2 (first run also yields the comparison result)
        t0 = time.time(); exp = con.execute(oracle[name]).fetch_arrow_table()
        t1 = time.time(); con.execute(oracle[name]).fetchall()
        duck = min(time.time() - t1, t1 - t0)
        ok = (sorted(got.column_names) == sorted(exp.column_names)
              and got.num_rows == exp.num_rows)
        if ok:
            cols = sorted(got.column_names)
            g = got.select(cols).to_pylist()
            e = exp.select(cols).to_pylist()
            for rg, re_ in zip(g, e):
                for c in cols:
                    if norm_cell(rg[c]) != norm_cell(re_[c]):
                        ok = False
                        break
                if not ok:
                    break
        if not ok:
            failures += 1
        rows.append({
            "query": name, "family": family(name), "rows": got.num_rows,
            "match": bool(ok), "spark_s": spark_times.get(name),
            "duckdb_s": round(duck, 3),
        })
        print(f"[sf1] {name}: {'OK' if ok else 'MISMATCH'} rows={got.num_rows} "
              f"spark={spark_times.get(name)} duck={duck:.3f}")

    fams = {}
    for r in rows:
        if r["spark_s"] is None:
            continue
        f = fams.setdefault(r["family"], {"spark": 0.0, "duck": 0.0, "n": 0})
        f["spark"] += r["spark_s"]; f["duck"] += r["duckdb_s"]; f["n"] += 1
    print("\nfamily          n   spark_s  duck_s   ratio")
    for f, v in sorted(fams.items()):
        ratio = v["spark"] / v["duck"] if v["duck"] else float("nan")
        print(f"{f:15s} {v['n']:2d}  {v['spark']:7.2f} {v['duck']:7.2f}   {ratio:.2f}x")
    tot_s = sum(v["spark"] for v in fams.values())
    tot_d = sum(v["duck"] for v in fams.values())
    print(f"{'TOTAL':15s} {sum(v['n'] for v in fams.values()):2d}  "
          f"{tot_s:7.2f} {tot_d:7.2f}   {tot_s / tot_d:.2f}x")
    out = {
        "metric": metric, "value": round(tot_s, 2), "unit": "sec",
        "duckdb_total": round(tot_d, 2), "ratio": round(tot_s / tot_d, 3),
        "failures": failures, "queries": rows,
        "families": {f: {"spark": round(v["spark"], 2),
                         "duck": round(v["duck"], 2),
                         "ratio": round(v["spark"] / v["duck"], 2)}
                     for f, v in fams.items()},
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, out_name), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"[sf1] failures={failures}; wrote {out_name}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], *sys.argv[4:]))
