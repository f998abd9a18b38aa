#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the engine's parquet output
(columns sorted by name, rows sorted, values compared cell-by-cell).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails += 1
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: engine output missing: {e}")
            fails += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            fails += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            fails += 1
            continue
        if not exp.equals(got):
            diff = (exp != got) & ~(exp.isna() & got.isna())
            n = int(diff.to_numpy().sum())
            print(f"FAIL {name}: {n} differing cells of {exp.size}")
            bad = diff.any(axis=1)
            print("  oracle:", exp[bad].head(3).to_dict("records"))
            print("  engine:", got[bad].head(3).to_dict("records"))
            fails += 1
            continue
        print(f"PASS {name} ({len(exp)} rows)")
    print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
