"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count + column names + order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import math

import duckdb

from hse_etl_ochirov_aldar_spark.sources.readers import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    # dates/timestamps/decimals/strings -> canonical string
    return str(v)


def _normalize(rows: list[dict], cols: list[str]) -> list[tuple]:
    out = [tuple(_norm_cell(r[c]) for c in cols) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def assert_matches_oracle(spark_df, con, oracle_sql: str, name: str = "") -> None:
    spark_rows = [r.asDict() for r in spark_df.collect()]
    rel = con.sql(oracle_sql)
    duck_cols = list(rel.columns)
    duck_rows = [dict(zip(duck_cols, row)) for row in rel.fetchall()]

    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, s_cols)
    d_norm = _normalize(duck_rows, s_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
