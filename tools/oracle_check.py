#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir>: load the Spark-written parquet,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables = views
over <sf_dir>/*.parquet), sort columns by name and rows by all columns,
and compare row count, column names, and values.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b):
    if a is b:
        return True
    if (a is None) != (b is None):
        return False
    if a is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


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
        spark_df = con.sql(
            f"SELECT * FROM '{qdir}/*.parquet'").df()
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
        if entry["rows_match"] and entry["cols_match"]:
            mismatches = []
            sv, ov = s.values.tolist(), o.values.tolist()
            for i, (rs, ro) in enumerate(zip(sv, ov)):
                for j, (x, y) in enumerate(zip(rs, ro)):
                    if not values_equal(x, y):
                        mismatches.append(
                            {"row": i, "col": s.columns[j],
                             "spark": repr(x), "oracle": repr(y)})
                        if len(mismatches) >= 3:
                            break
                if len(mismatches) >= 3:
                    break
            entry["values_match"] = not mismatches
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
