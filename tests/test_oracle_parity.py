"""Differential test: every declared query with an oracle must match
DuckDB at sf0.001 (the driver re-runs the same protocol at sf0.01)."""

from __future__ import annotations

import pytest

from rusty_timeseries_db_spark import queries as Q
from rusty_timeseries_db_spark.oracle import compare
from tests.conftest import SF_DIR

_SPECS = [s for s in Q._REGISTRY if s.oracle is not None]
_ROWS_ONLY = [s for s in Q._REGISTRY if s.oracle is None]


@pytest.mark.parametrize("spec", _SPECS, ids=[s.name for s in _SPECS])
def test_oracle_match(spark, spec):
    ok, msg = compare(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR)
    assert ok, f"{spec.name}: {msg}"


@pytest.mark.parametrize("spec", _ROWS_ONLY, ids=[s.name for s in _ROWS_ONLY])
def test_rows_only_runs(spark, spec):
    # non-SQL-expressible ops must at least run and return a stable schema
    df = spec.fn(spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
