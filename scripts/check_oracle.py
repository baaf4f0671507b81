#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare (SURVEY.md §5.1).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables
as DuckDB views, runs each oracle SQL, and compares against the Spark
parquet dump <verifyOutDir>/<name>/ with columns sorted by name —
the same shape the driver hashes. Exact match required (doubles are
round(,4) on both sides by construction).
"""
import json, struct, sys, math
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        # The driver hashes BITS, and -0.0 != +0.0 (and NaN payloads
        # differ) at the bit level even though Python == says equal.
        # Hex the IEEE754 bytes for those edge values so this mirror is
        # exactly as strict as the driver's hash (r8's q_pmi_bigrams
        # lesson: one oracle -0.0 passed here, failed the driver).
        if math.isnan(v) or v == 0.0:
            return struct.pack("<d", v).hex()
        return v
    if isinstance(v, np.generic):  # numpy scalar (int64, bool_, ...)
        return norm(v.item())
    if hasattr(v, "tzinfo") and getattr(v, "tzinfo", None) is not None:
        return v.tz_localize(None) if hasattr(v, "tz_localize") else v
    # array detection BY TYPE, not hasattr(tolist): numpy scalars also
    # expose .tolist(), so the attribute probe is pandas-version-fragile
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            n_fail += 1
            continue
        # The driver's checker sorts rows with pandas and dies on top-level
        # array columns (unhashable numpy.ndarray) — reject them here too so
        # the local mirror is exactly as strict as the real gate.
        arr_cols = [c for c in spark.columns
                    if spark[c].map(lambda v: isinstance(
                        v, (np.ndarray, list, tuple))).any()]
        if arr_cols:
            print(f"FAIL {name}: top-level array columns {arr_cols} "
                  "(driver checker cannot hash these — emit scalar rows)")
            n_fail += 1
            continue
        o = oracle[sorted(oracle.columns)]
        s = spark[sorted(spark.columns)]
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1
            continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        ov = [[norm(v) for v in row] for row in o.itertuples(index=False)]
        sv = [[norm(v) for v in row] for row in s.itertuples(index=False)]
        if ov != sv:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(ov, sv)) if a != b)
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  oracle={bad[1]}\n  spark ={bad[2]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(o)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(sqls)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
