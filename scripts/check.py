#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>

Reads <outDir>/<key>/ parquet (written by `graft.Verify <sfDir> <outDir>`)
and <outDir>/oracle_sql.json, runs each oracle on DuckDB with bare-name
views over <sfDir>/*.parquet, sorts columns by name, and compares
row-count, schema (column names) and exact cell values.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for key in sorted(oracles):
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark output"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = spark_rel.select(", ".join(f'"{c}"' for c in spark_cols)).fetchall()
            oracle_rel = con.sql(oracles[key])
            ocols = sorted(oracle_rel.columns)
            orows = oracle_rel.select(", ".join(f'"{c}"' for c in ocols)).fetchall()
        except Exception as e:
            print(f"FAIL {key}: exec error: {str(e).splitlines()[0][:200]}"); n_fail += 1; continue
        if spark_cols != ocols:
            print(f"FAIL {key}: columns {spark_cols} vs oracle {ocols}"); n_fail += 1; continue
        # Driver hashing is type-FAMILY-sensitive (r2 lesson: a DuckDB
        # HUGEINT sum converts to pandas float64 — "75.0" vs Spark's
        # BIGINT "75" hash-mismatched, while INTEGER vs BIGINT passed
        # because every int width stringifies identically). Flag drift
        # across families, not across widths within one family.
        def fam(t):
            t = str(t).upper()
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t  # HUGEINT, DECIMAL(..), VARCHAR, TIMESTAMP, ... exact
        sp_types = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
        o_types = dict(zip(oracle_rel.columns, map(str, oracle_rel.types)))
        tbad = [(c, sp_types[c], o_types[c]) for c in spark_cols
                if fam(sp_types[c]) != fam(o_types[c])]
        if tbad:
            c, st, ot = tbad[0]
            print(f"FAIL {key}: type drift col {c}: spark={st} oracle={ot}")
            n_fail += 1; continue
        if len(spark_rows) != len(orows):
            print(f"FAIL {key}: rows {len(spark_rows)} vs oracle {len(orows)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, orows)):
            if a != b:
                # report the first differing cell with detail
                for j, (x, y) in enumerate(zip(a, b)):
                    eq = (x == y) or (isinstance(x, float) and isinstance(y, float)
                                      and math.isnan(x) and math.isnan(y))
                    if not eq:
                        bad = (i, spark_cols[j], x, y)
                        break
                if bad: break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {key}: row {i} col {c}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
