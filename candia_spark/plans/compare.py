"""Local emulation of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark plan and the oracle SQL on the same
sf directory, sort columns by name, sort rows, and compare values exactly
(the driver hashes; exact equality is the conservative local stand-in).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from candia_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a: Any, b: Any) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return bool(a == b)
    except ValueError:
        return str(a) == str(b)


def compare_query(
    spark: SparkSession, sf_dir: str, name: str
) -> dict[str, Any]:
    from candia_spark.plans.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY[name]
    sdf = spec.spark(spark, sf_dir).toPandas()
    result: dict[str, Any] = {"name": name, "rows": len(sdf)}
    if spec.oracle is None:
        result["status"] = "rows_only"
        result["match"] = len(sdf) >= 0
        return result
    con = duckdb_connection(sf_dir)
    odf = con.sql(spec.oracle).df()
    con.close()
    s, o = _canon(sdf), _canon(odf)
    if list(s.columns) != list(o.columns):
        result["status"] = "schema_mismatch"
        result["spark_cols"] = list(s.columns)
        result["oracle_cols"] = list(o.columns)
        result["match"] = False
        return result
    if len(s) != len(o):
        result["status"] = "rowcount_mismatch"
        result["oracle_rows"] = len(o)
        result["match"] = False
        return result
    mismatches = []
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not _values_equal(x, y):
                mismatches.append((col, i, x, y))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    result["status"] = "ok" if not mismatches else "value_mismatch"
    result["mismatches"] = mismatches
    result["match"] = not mismatches
    return result


def compare_all(spark: SparkSession, sf_dir: str) -> list[dict[str, Any]]:
    from candia_spark.plans.queries import QUERY_REGISTRY

    return [compare_query(spark, sf_dir, n) for n in QUERY_REGISTRY]
