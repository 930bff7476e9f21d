#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive value hash.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

# correctness gate, not a benchmark: skip the session warm-up's pipeline
# pass (PELINKER_WARM_PAGES sizes it for production batches)
os.environ.setdefault("PELINKER_WARM_PAGES", "0")

SF_DIR = "/root/testdata/sf0.01"


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(names):
    from pelinker_spark.operators.relational import ORACLES, QUERIES, TABLES
    from pelinker_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = names or sorted(QUERIES)
    failures = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            # show first diff
            a = sdf[sorted(sdf.columns)].astype(str).apply("|".join, axis=1)
            b = odf[sorted(odf.columns)].astype(str).apply("|".join, axis=1)
            only_a = sorted(set(a) - set(b))[:3]
            only_b = sorted(set(b) - set(a))[:3]
            problems.append(f"spark-only={only_a} duck-only={only_b}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
    print(f"\n{len(names) - len(failures)}/{len(names)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
