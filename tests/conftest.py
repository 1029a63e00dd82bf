"""Shared fixtures: one local SparkSession + DuckDB oracle helpers."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from gh_archive_clickhouse_spark.session import get_spark
from gh_archive_clickhouse_spark.schemas import FIXTURE_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def cached_rdd_ids(spark) -> set[int]:
    """Ids of every RDD currently holding block-manager storage — the
    storage-lifecycle tests' single way of observing localCheckpoint
    blocks (test_epoch_fold and test_operators share it)."""
    return {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def wait_until(pred, timeout_s: float = 10.0) -> bool:
    """Poll a predicate — the storage-lifecycle tests' answer to
    unpersist(blocking=False) removing blocks asynchronously."""
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.1)
    return bool(pred())


def wait_rdds_gone(spark, ids: set[int], timeout_s: float = 10.0) -> bool:
    """Poll until the given RDD ids have left the block manager."""
    return wait_until(
        lambda: not (ids & cached_rdd_ids(spark)), timeout_s
    )


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by every column (stringified for a stable total order)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).reset_index(drop=True)
    if len(pdf) == 0:
        return pdf
    key = pdf.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    return pdf.loc[key.sort_values(kind="mergesort").index].reset_index(
        drop=True
    )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    # int-vs-float dtype drift (e.g. DuckDB HUGEINT sums fetched as
    # float64) stringifies differently ("3" vs "3.0") and would fail a
    # hash-based comparator even when values are numerically equal.
    for col in a.columns:
        ai = pd.api.types.is_integer_dtype(a[col])
        bi = pd.api.types.is_integer_dtype(b[col])
        af = pd.api.types.is_float_dtype(a[col])
        bf = pd.api.types.is_float_dtype(b[col])
        assert not (ai and bf) and not (af and bi), (
            f"{name}: {col} dtype drift {a[col].dtype} vs {b[col].dtype}"
        )
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                xf = float("nan") if x is None else float(x)
                yf = float("nan") if y is None else float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                assert xf == yf, (
                    f"{name}: {col}[{i}] {x!r} != {y!r} (exact float)"
                )
            else:
                assert x == y, f"{name}: {col}[{i}] {x!r} != {y!r}"
