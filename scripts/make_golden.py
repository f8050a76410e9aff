#!/usr/bin/env python3
"""Snapshot the DuckDB oracle results as golden parquet files.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v0001"
  python3 scripts/make_golden.py /root/testdata/sf0.001 /tmp/v0001 src/test/resources/golden

GoldenParitySpec then asserts Spark output == golden offline (no DuckDB
at test time). Regenerate whenever a key's oracle SQL changes.
"""
import sys, json, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, verify_dir, golden_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{verify_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    os.makedirs(golden_dir, exist_ok=True)
    for key in sorted(oracles):
        out = f"{golden_dir}/{key}.parquet"
        con.execute(f"COPY ({oracles[key]}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"golden {key}: {n} rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
