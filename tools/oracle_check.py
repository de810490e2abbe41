#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir>: load the Spark-written parquet
THROUGH PANDAS/PYARROW (the driver's read path — reading it through DuckDB
hid the round-3 failure mode where Spark DECIMAL parquet surfaces as
decimal.Decimal objects while DuckDB's .df() renders its DECIMAL results
as float64, so every value matched but any type/repr-sensitive hash
diverged), run the matching oracle SQL from oracle_sql.json in DuckDB
(tables = views over <sf_dir>/*.parquet), sort columns by name and rows by
all columns, and compare row count, column names, python-level VALUE TYPES,
and values. A Decimal-vs-float column is reported as a failure here even
though the numbers agree — because it is one under the driver's hash.
"""
import datetime
import decimal
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    # array-valued cells (numpy arrays / lists) are unhashable, so
    # sort_values would raise before the comparison ever ran; make them
    # tuples (hashable, order-comparable) on BOTH readers identically
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else tuple(v) if isinstance(v, list) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm(x):
    """Canonical python value: collapse numpy scalars and the two readers'
    date representations (pyarrow gives datetime.date objects, duckdb
    datetime64 — the driver's hash treats those as equal), keep everything
    else as its python type so type drift (Decimal vs float) is VISIBLE.
    """
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return None
    # array-valued cells (pyarrow list columns arrive as numpy arrays,
    # duckdb's as lists): normalize elementwise — pd.isna on an ndarray is
    # elementwise and would make the `and` below raise
    if isinstance(x, np.ndarray):
        return [norm(v) for v in x.tolist()]
    if isinstance(x, (list, tuple)):
        return [norm(v) for v in x]
    # pd.NaT passes isinstance(datetime) but raises on .time(); treat every
    # scalar NA (NaT, NA, nan boxed in numpy) as None up front
    if np.ndim(x) == 0 and pd.isna(x):
        return None
    if hasattr(x, "item") and type(x).__module__ == "numpy":
        x = x.item()
    if isinstance(x, pd.Timestamp):
        x = x.to_pydatetime()
    if isinstance(x, datetime.datetime):
        return x.date() if x.time() == datetime.time() else x
    return x


def values_equal(a, b):
    a, b = norm(a), norm(b)
    if a is None or b is None:
        return a is None and b is None
    if type(a) is not type(b):
        return False  # Decimal vs float, int vs str, ... — repr divergence
    if isinstance(a, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if isinstance(a, list):
        # elementwise, through values_equal: plain == would call
        # Decimal('1.0') == 1.0 True and hide repr drift inside arrays
        return len(a) == len(b) and all(
            values_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        # the driver's eyes: pandas/pyarrow, NOT duckdb
        spark_df = pd.read_parquet(qdir)
        if name not in oracles:
            results[name] = {"rows": len(spark_df), "oracle": None}
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = {"error": f"oracle SQL failed: {e}"}
            continue
        s, o = canon(spark_df), canon(ora_df)
        entry = {"rows_spark": len(s), "rows_oracle": len(o),
                 "rows_match": len(s) == len(o),
                 "cols_spark": list(s.columns), "cols_oracle": list(o.columns),
                 "cols_match": list(s.columns) == list(o.columns)}
        # per-column python-type drift (the hash killer): report any column
        # whose first non-null values differ in type across the readers
        drift = []
        if entry["cols_match"]:
            for c in s.columns:
                sv = next((norm(v) for v in s[c] if norm(v) is not None), None)
                ov = next((norm(v) for v in o[c] if norm(v) is not None), None)
                if sv is not None and ov is not None \
                        and type(sv) is not type(ov):
                    entry_drift = {"col": c,
                                   "spark_type": type(sv).__name__,
                                   "oracle_type": type(ov).__name__}
                    if isinstance(sv, decimal.Decimal) or isinstance(ov, decimal.Decimal):
                        entry_drift["note"] = ("DECIMAL output — driver hash "
                                               "will diverge; emit BIGINT cents instead")
                    drift.append(entry_drift)
                elif isinstance(sv, decimal.Decimal) or isinstance(ov, decimal.Decimal):
                    # same type on both sides but still Decimal: the driver
                    # hash may survive, but the repr-trap class remains
                    drift.append({"col": c, "decimal": True,
                                  "note": "DECIMAL output — driver hash will "
                                          "diverge; emit BIGINT cents instead"})
        if drift:
            entry["type_drift"] = drift
        if entry["rows_match"] and entry["cols_match"]:
            mismatches = []
            # per-column tolist(): df.values would cast all columns to ONE
            # common numpy dtype (a single float column floats every int),
            # fabricating type drift that exists in neither reader
            for c in s.columns:
                for i, (x, y) in enumerate(zip(s[c].tolist(), o[c].tolist())):
                    if not values_equal(x, y):
                        mismatches.append(
                            {"row": i, "col": c,
                             "spark": repr(x), "oracle": repr(y)})
                        if len(mismatches) >= 3:
                            break
                if len(mismatches) >= 3:
                    break
            entry["values_match"] = not mismatches and not drift
            if mismatches:
                entry["mismatches"] = mismatches
        results[name] = entry
    ok = sum(1 for v in results.values()
             if v.get("values_match") or (v.get("oracle", "x") is None and v.get("rows", 0) > 0))
    bad = {k: v for k, v in results.items()
           if not (v.get("values_match")
                   or (v.get("oracle", "x") is None and v.get("rows", 0) > 0))}
    print(json.dumps(results, indent=1, default=str)[:6000] if "-v" in sys.argv else "")
    print(f"== {ok}/{len(results)} queries green ==")
    for k, v in bad.items():
        print(f"FAIL {k}: " + json.dumps(
            {kk: vv for kk, vv in v.items() if kk != "cols_spark"}, default=str)[:500])


if __name__ == "__main__":
    main()
