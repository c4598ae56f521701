#!/usr/bin/env python
"""Replicates the driver's correctness gate locally: run every queries()
entry in Spark and its oracle_sql() in DuckDB over the same sf dir, compare
row count, column names/types, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from xponents_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return repr(v)


def norm_rows(cols, rows):
    return sorted(tuple(norm_cell(v) for v in r) for r in rows)


def driver_canon(cols, rows):
    """Replica of the driver's canonicalization: pandas DataFrame, columns
    sorted by name, then sort_values over ALL columns.  This is the step
    that dies with `TypeError: unhashable type: 'list'` on array-typed
    output columns (CORRECTNESS_r02 regression on xcoord/xtemporal) — run
    it locally so such projections fail BEFORE the driver's gate does.
    Raises on any column pandas cannot sort (list/dict/set cells)."""
    import pandas as pd
    df = pd.DataFrame(list(rows), columns=list(cols))
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows  (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE ERROR: {e}")
            failures += 1
            continue
        ok = True
        if [c.lower() for c in scols] != ocols:
            print(f"{name:24s} COLUMN MISMATCH spark={scols} duck={ocols}")
            ok = False
        if len(srows) != len(orows):
            print(f"{name:24s} ROWCOUNT MISMATCH spark={len(srows)} duck={len(orows)}")
            ok = False
        if ok:
            a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
                print(f"{name:24s} VALUE MISMATCH, first diffs:")
                for x, y in diff:
                    print(f"   spark: {x}\n   duck : {y}")
                ok = False
        if ok:
            # the driver's gate sorts pandas frames over all columns; a
            # query projecting list/map cells passes the repr() check above
            # but errs in the driver — replicate that failure mode here
            try:
                driver_canon(scols, srows)
                driver_canon(ocols, orows)
            except Exception as e:
                print(f"{name:24s} DRIVER-CANON ERROR: {type(e).__name__}: {e}")
                ok = False
        if ok:
            print(f"{name:24s} OK ({len(srows)} rows)")
        else:
            failures += 1
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
