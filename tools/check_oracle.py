"""Local replica of the driver's DuckDB-oracle correctness check.

Runs every __spark_entry__ query at a given SF against its oracle SQL:
row count + sorted-column-name schema + order-insensitive value hash.
Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from moonlink_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=16, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = value_hash(sdf) == value_hash(odf) if ok_rows and ok_schema else False
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status}  {name}: rows {len(sdf)}/{len(odf)} schema={ok_schema} hash={ok_hash}"
        )
        if status == "FAIL" and ok_schema and ok_rows:
            merged = _diff(sdf, odf)
            if merged is not None:
                print(merged.head(6).to_string())
    spark.stop()
    sys.exit(1 if failures else 0)


def _diff(sdf: pd.DataFrame, odf: pd.DataFrame):
    try:
        cols = sorted(sdf.columns)
        a = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        b = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        neq = (a != b).any(axis=1)
        if neq.any():
            out = a[neq].head(3).copy()
            out.columns = [f"spark:{c}" for c in cols]
            ob = b[neq].head(3).copy()
            ob.columns = [f"duck:{c}" for c in cols]
            return pd.concat([out.reset_index(drop=True), ob.reset_index(drop=True)], axis=1)
    except Exception:
        return None
    return None


if __name__ == "__main__":
    main()
