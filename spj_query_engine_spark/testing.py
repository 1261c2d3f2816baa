"""Order-insensitive result comparison — the discipline SURVEY.md §5 demands
(reference output order is plan-dependent), shared by the pytest suite and
the local driver-style correctness harness (scripts/check_correctness.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, integer dtypes widened to int64, floats to
    float64, rows sorted by all columns."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for col in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[col]):
            pdf[col] = pdf[col].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[col]):
            pdf[col] = pdf[col].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(pdf[col]):
            pdf[col] = pd.to_datetime(pdf[col]).astype("datetime64[us]")
        elif pdf[col].dtype == object:
            # array<...> columns arrive as numpy arrays / lists — make them
            # hashable + comparable
            pdf[col] = pdf[col].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def compare_frames(
    actual: pd.DataFrame, expected: pd.DataFrame, float_tol: float = 0.0
) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    errors: list[str] = []
    actual = normalize(actual)
    expected = normalize(expected)
    if list(actual.columns) != list(expected.columns):
        return [f"schema mismatch: {list(actual.columns)} vs {list(expected.columns)}"]
    if len(actual) != len(expected):
        return [f"row count mismatch: {len(actual)} vs {len(expected)}"]
    for col in actual.columns:
        a, e = actual[col], expected[col]
        if float_tol and pd.api.types.is_float_dtype(a):
            if not np.allclose(
                a.to_numpy(), e.to_numpy(), rtol=float_tol, atol=float_tol, equal_nan=True
            ):
                errors.append(f"column {col!r} differs beyond tol={float_tol}")
        elif not a.equals(e):
            diff = (a != e) & ~(a.isna() & e.isna())
            idx = diff[diff].index[:3].tolist()
            errors.append(
                f"column {col!r} differs at rows {idx}: "
                f"{[ (a[i], e[i]) for i in idx ]}"
            )
    return errors
