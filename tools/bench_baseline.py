#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given SF (the reference's engine =
DuckDB, so this approximates BASELINE per query) and compare with a Bench
JSON line. Usage: bench_baseline.py <sf_dir> <verify_out_dir> [bench.json]"""
import json, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

sf_dir, out_dir = sys.argv[1], sys.argv[2]
bench = None
if len(sys.argv) > 3:
    with open(sys.argv[3]) as f:
        line = f.read()
        bench = json.loads(line[line.index('{'):])["queries"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

rows = []
for name in sorted(oracles):
    t0 = time.time()
    try:
        con.execute(oracles[name]).fetchall()
        dt = time.time() - t0
    except Exception as e:
        dt = -1
    spark = bench.get(name) if bench else None
    ratio = (spark / dt) if (spark and dt > 0) else None
    rows.append((name, dt, spark, ratio))

print(f"{'query':24s} {'duckdb':>8s} {'spark':>8s} {'ratio':>7s}")
tot_d = tot_s = 0.0
for name, dt, spark, ratio in rows:
    tot_d += max(dt, 0); tot_s += spark or 0
    flag = ' <<' if ratio and ratio > 2 else ''
    print(f"{name:24s} {dt:8.3f} {spark if spark else 0:8.3f} {('%.1fx' % ratio) if ratio else '':>7s}{flag}")
print(f"{'TOTAL':24s} {tot_d:8.3f} {tot_s:8.3f} {tot_s/tot_d:6.1f}x")
