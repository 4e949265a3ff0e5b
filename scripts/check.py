#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads oracle_sql.json from the verify output dir, registers every
parquet table in sfDir as a DuckDB view, runs each oracle, and compares
with the Spark parquet dump (columns sorted by name, values compared
exactly after string rendering).
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def render(df: pd.DataFrame):
    out = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(repr(v))
            else:
                cells.append(str(v))
        out.append("|".join(cells))
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.concat(
                [pd.read_parquet(f) for f in sorted(glob.glob(spark_path + "/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        got_c, exp_c = canon(got), canon(exp)
        if list(got_c.columns) != list(exp_c.columns):
            print(f"FAIL {name}: columns differ spark={list(got_c.columns)} duck={list(exp_c.columns)}")
            n_fail += 1
            continue
        g, e = render(got_c), render(exp_c)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (spark={len(g)} duck={len(e)})")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                print(f"  spark extra={g[len(e):3+len(e)]} duck extra={e[len(g):3+len(g)]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
