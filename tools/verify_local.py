#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §6).

Reads the Verify.scala output directory (one parquet dir per query +
oracle_sql.json), replays each oracle SQL in DuckDB with the fixture tables
registered by name, and compares: column names (sorted), row count, and
values (rows sorted for stability). Exact equality, floats included — the
driver's gate is an exact hash, so the local gate must be too.

Usage: verify_local.py <sf_dir> <verify_out_dir>
"""
import json
import math
import sys
import glob

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if hasattr(v, "isoformat"):  # datetime/date → comparable string
        return v.isoformat()
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def frame_key(df):
    cols = sorted(df.columns)
    rows = []
    for _, r in df[cols].iterrows():
        rows.append(tuple(norm_cell(r[c]) for c in cols))
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return cols, rows


def kind(v):
    """Type *kind* of a cell — int-like vs float-like must NOT cross-match:
    DuckDB returns HUGEINT (e.g. from SUM over INTEGER) as float64 while
    Spark writes int64; values compare equal but the driver's hash differs.
    That slack hid the b11 failure for three rounds. Integer width (int32 vs
    int64) is intentionally NOT distinguished.
    """
    import numpy as np
    if v is None:
        return "null"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, tuple):
        return "tuple"
    return type(v).__name__


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if kind(a) != kind(b):
        return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    # EXACT — the driver's gate hashes values bit-for-bit; any slack here
    # lets a row pass locally that the driver will fail (round-2/3 lesson).
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    spark_dirs = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(spark_dirs):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
        scols, srows = frame_key(spark_df)
        dcols, drows = frame_key(duck_df)
        if scols != dcols:
            results[name] = f"SCHEMA_MISMATCH spark={scols} duck={dcols}"
            continue
        if len(srows) != len(drows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(srows)} duck={len(drows)}"
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if not all(cells_equal(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        results[name] = "OK" if bad is None else f"VALUE_MISMATCH row{bad[0]} spark={bad[1]} duck={bad[2]}"

    for name in sorted(oracles):
        if name not in results:
            results[name] = "NO_SPARK_OUTPUT_FOR_ORACLE"

    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' or v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
