"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given SF dir on Spark and, where an oracle
exists, the same-named SQL on DuckDB; compares row count, column names, and
an order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(str(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(sp)} rows, cols={list(sp.columns)} ({dt:.1f}s)")
            if len(sp) == 0:
                failures.append(name)
                print(f"WARN  {name}: zero rows")
            continue
        try:
            dk = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok_rows = len(sp) == len(dk)
        ok_cols = sorted(sp.columns) == sorted(dk.columns)
        ok_hash = ok_cols and value_hash(sp) == value_hash(dk)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(sp)}/{len(dk)} cols_match={ok_cols} "
            f"hash_match={ok_hash} ({dt:.1f}s)"
        )
        if not ok_hash and ok_cols and len(sp) and len(dk):
            s = sp.reindex(sorted(sp.columns), axis=1)
            d = dk.reindex(sorted(dk.columns), axis=1)
            key = [c for c in s.columns]
            m = s.merge(d, how="outer", indicator=True, on=None)
            diff = m[m["_merge"] != "both"]
            print(diff.head(6).to_string())
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
