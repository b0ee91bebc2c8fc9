"""Mimic the driver's correctness gate: run every __spark_entry__ query at
sf0.01 and compare against its DuckDB oracle (row count + column set +
order-insensitive values).

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64").round(6)
        elif "int" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from clinical_trial_searchengine_spark.session import get_spark

    spark = get_spark(
        master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    try:
        oracles = entry.oracle_sql(sf_dir)
    except TypeError:
        oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(got)} rows  [{dt:.1f}s]")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        g, e_ = norm(got), norm(exp)
        if len(g) != len(e_):
            failures.append((name, f"rowcount {len(g)} != {len(e_)}"))
            print(f"FAIL  {name}: rowcount {len(g)} != {len(e_)}")
            continue
        if list(g.columns) != list(e_.columns):
            failures.append((name, f"cols {list(g.columns)} != {list(e_.columns)}"))
            print(f"FAIL  {name}: cols {list(g.columns)} != {list(e_.columns)}")
            continue
        if not g.equals(e_):
            diff = (g != e_)
            bad = diff.any(axis=1)
            failures.append((name, "values differ"))
            print(f"FAIL  {name}: values differ; first diffs:")
            print("  got:", g[bad].head(3).to_dict("records"))
            print("  exp:", e_[bad].head(3).to_dict("records"))
            continue
        print(f"ok    {name}: {len(g)} rows match  [{dt:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {[f[0] for f in failures]}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
