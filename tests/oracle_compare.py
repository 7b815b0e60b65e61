"""Local mirror of the driver's correctness gate: run the Spark plan
and the DuckDB oracle side by side, compare row count, column names,
and an order-insensitive value comparison (columns sorted by name,
rows sorted by all columns)."""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that differ only in physical representation
    for c in df.columns:
        if df[c].dtype == object:
            # Spark's toPandas renders DateType as datetime.date objects
            # on some paths and datetime64 on others; normalize both
            import datetime

            first = df[c].dropna().head(1)
            if len(first) and isinstance(first.iloc[0], datetime.date) and not isinstance(
                first.iloc[0], datetime.datetime
            ):
                df[c] = pd.to_datetime(df[c])
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)
    return a == b


def compare_query(spark, con, spark_fn, oracle_sql: str, sf_dir: str) -> None:
    got = spark_fn(spark, sf_dir).toPandas()
    want = con.execute(oracle_sql).fetchdf()

    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"

    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            a = None if pd.api.types.is_scalar(a) and pd.isna(a) else a
            b = None if pd.api.types.is_scalar(b) and pd.isna(b) else b
            assert _values_equal(a, b), (
                f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}"
            )
