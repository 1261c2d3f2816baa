"""Shared test fixtures: one local SparkSession, DuckDB oracle helpers, and
deterministic replicas of the reference's e-commerce fixture database
(schemas transcribed in FIXTURES.md from the reference's .det/.stat files)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from spj_query_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="spj-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _rand_strings(rng: np.random.RandomState, n: int, length: int) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return ["".join(rng.choice(letters, size=length)) for _ in range(n)]


@pytest.fixture(scope="session")
def ecommerce_pdf() -> dict[str, pd.DataFrame]:
    """Deterministic re-synthesis of the reference's e-commerce fixture DB
    (CUSTOMER 200 / CART 200 / CARTDETAILS 100 / BILL 200 — FIXTURES.md).
    Values are random in the reference's generator ranges; seed fixed."""
    rng = np.random.RandomState(42)
    customer = pd.DataFrame(
        {
            "cid": np.arange(200),
            "gender": rng.randint(0, 2, 200),
            "firstname": _rand_strings(rng, 200, 10),
            "lastname": _rand_strings(rng, 200, 10),
            "address": _rand_strings(rng, 200, 26),
        }
    )
    cart = pd.DataFrame(
        {
            "cartid": np.arange(200),
            "cid": rng.randint(0, 200, 200),
            "status": _rand_strings(rng, 200, 8),
            "remarks": _rand_strings(rng, 200, 38),
        }
    )
    cartdetails = pd.DataFrame(
        {
            "iid": rng.choice(200, size=100, replace=False),
            "cartid": rng.randint(0, 200, 100),
            "qty": rng.randint(0, 50, 100),
            "remarks": _rand_strings(rng, 100, 44),
        }
    )
    bill = pd.DataFrame(
        {
            "billid": np.arange(200),
            "iid": rng.randint(0, 200, 200),
            "amount": rng.randint(0, 2500, 200),
            "remarks": _rand_strings(rng, 200, 44),
        }
    )
    return {
        "CUSTOMER": customer,
        "CART": cart,
        "CARTDETAILS": cartdetails,
        "BILL": bill,
    }


@pytest.fixture(scope="session")
def ecommerce(spark, ecommerce_pdf):
    """The fixture DB as Spark DataFrames keyed by table name."""
    return {name: spark.createDataFrame(pdf) for name, pdf in ecommerce_pdf.items()}


@pytest.fixture(scope="session")
def ecommerce_duck(ecommerce_pdf):
    con = duckdb.connect()
    for name, pdf in ecommerce_pdf.items():
        con.register(name, pdf)
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive, type-normalized form: columns sorted by name, rows
    sorted by all columns, integer dtypes widened, float rounding left to the
    caller (queries are designed to be exact)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for col in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[col]):
            pdf[col] = pdf[col].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[col]):
            pdf[col] = pdf[col].astype("float64")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def assert_same_result(spark_df, duck_con, oracle_sql: str, float_tol: float = 0.0):
    """Compare a Spark DataFrame against a DuckDB oracle query, ignoring row
    and column order — the discipline SURVEY.md §5 calls for (reference output
    order is plan-dependent)."""
    actual = normalize(spark_df.toPandas())
    expected = normalize(duck_con.execute(oracle_sql).fetch_df())
    assert list(actual.columns) == list(expected.columns), (
        f"schema mismatch: {list(actual.columns)} vs {list(expected.columns)}"
    )
    assert len(actual) == len(expected), f"row count {len(actual)} vs {len(expected)}"
    for col in actual.columns:
        a, e = actual[col], expected[col]
        if float_tol and pd.api.types.is_float_dtype(a):
            assert np.allclose(a, e, rtol=float_tol, atol=float_tol, equal_nan=True), (
                f"column {col} differs (tol={float_tol})"
            )
        else:
            assert a.equals(e), f"column {col} differs exactly"
