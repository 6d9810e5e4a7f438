"""Regression tests for tools/parity.py — the local twin of the driver gate.

Round-1 driver failure mode: DuckDB SUM(int) returns HUGEINT, which lands in
pandas as float64; Spark's BIGINT lands as int64. Numeric equality let the
old compare() pass locally while the driver's type-sensitive value hash
failed. compare() must now flag the dtype-kind mismatch.
"""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

from tools.parity import compare, dtype_kind, normalize


def test_uncast_hugeint_oracle_fails():
    spark_df = pd.DataFrame({"k": ["a", "b"], "total": pd.array([3, 7], dtype="int64")})
    oracle_df = pd.DataFrame({"k": ["a", "b"], "total": pd.array([3.0, 7.0], dtype="float64")})
    problems = compare("t", spark_df, oracle_df)
    assert problems, "float64 oracle vs int64 spark must fail the type guard"
    assert "dtype kind mismatch" in problems[0]
    assert "total" in problems[0]


def test_matching_int64_passes():
    a = pd.DataFrame({"k": ["a", "b"], "total": pd.array([3, 7], dtype="int64")})
    b = pd.DataFrame({"k": ["b", "a"], "total": pd.array([7, 3], dtype="int64")})
    assert compare("t", a, b) == []


def test_matching_float_passes():
    a = pd.DataFrame({"v": pd.array([1.5, 2.5], dtype="float64")})
    b = pd.DataFrame({"v": pd.array([2.5, 1.5], dtype="float64")})
    assert compare("t", a, b) == []


def test_value_diff_still_caught():
    a = pd.DataFrame({"v": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"v": pd.array([1, 3], dtype="int64")})
    assert any("values differ" in p for p in compare("t", a, b))


def test_dtype_kind_classifier():
    assert dtype_kind(pd.Series([1], dtype="int64")) == "int"
    assert dtype_kind(pd.Series([1.0], dtype="float64")) == "float"
    assert dtype_kind(pd.Series(["x"])) == "object"
    assert dtype_kind(pd.Series(pd.to_datetime(["2024-01-01"]))) == "datetime"
    assert dtype_kind(pd.Series([True])) == "bool"


def test_normalize_sorts_rows_and_columns():
    df = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    out = normalize(df)
    assert list(out.columns) == ["a", "b"]
    assert out["b"].tolist() == [1, 2]
