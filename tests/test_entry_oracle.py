"""Spark-vs-DuckDB oracle parity for every queries() entry — a local
replica of the driver's correctness gate (row count + schema-width +
order-insensitive value comparison at sf0.001).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — the
    order-insensitive compare."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            out[c] = s.astype(str)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("boolean")
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only check (the driver's weaker path): runs + stable schema
        assert spark_pdf.shape[0] >= 0
        assert len(spark_pdf.columns) > 0
        return

    duck_pdf = ddb.execute(oracle).df()

    assert spark_pdf.shape[0] == duck_pdf.shape[0], (
        f"{name}: row count {spark_pdf.shape[0]} != oracle {duck_pdf.shape[0]}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )

    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for col in a.columns:
        sa, sb = a[col], b[col]
        if pd.api.types.is_float_dtype(sa):
            mism = ~(
                (sa.isna() & sb.isna())
                | ((sa - sb).abs() <= 1e-6 + 1e-9 * sb.abs())
            )
        else:
            mism = ~((sa.isna() & sb.isna()) | (sa == sb))
        if mism.any():
            idx = mism[mism].index[:5]
            raise AssertionError(
                f"{name}.{col}: {int(mism.sum())} mismatches, e.g. "
                f"spark={sa[idx].tolist()} oracle={sb[idx].tolist()}"
            )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert "keep" in df.columns and "drop_reason" in df.columns
