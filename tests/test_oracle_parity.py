"""The local twin of the driver's correctness gate: run every registered
query on Spark and its oracle on DuckDB at sf0.001, and require EXACT value
equality (the driver hashes values, so approximate equality is not enough —
any mismatch here is a mismatch there)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from quiver_spark.registry import load_all_operators

from conftest import SF_DIR

SPECS = load_all_operators()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values (stringified key for
    type-stable ordering), mirroring an order-insensitive hash."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return float(a) == float(b)
    return str(a) == str(b)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column names differ: {sorted(spark_pdf.columns)} vs "
        f"{sorted(duck_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _cell_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: {len(bad)} mismatches, first: {bad[:3]}"


ORACLE_SPECS = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_SPECS = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    spark_pdf = spec.spark(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_runs(spark, name):
    spec = SPECS[name]
    df = spec.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25


def test_approx_distinct_error_envelope(spark):
    """approx_count_distinct must land within 5% of the exact count — the
    query itself folds the comparison into the within_5pct boolean so the
    driver's hash-match oracle can check it (oracle side emits TRUE)."""
    df = SPECS["approx_distinct_parts"].spark(spark, SF_DIR).toPandas()
    assert df.within_5pct.all()
    assert (df.exact_parts > 0).all()
