"""Correctness gate mirror: every declared query vs its DuckDB oracle.

This replicates the driver's t2 comparison locally (row count, column
names, order-insensitive values) at the small SF so regressions are
caught before the per-round gate at sf0.01.
"""

from __future__ import annotations

import pytest

from gh_archive_clickhouse_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR, assert_frames_match

_ORACLE_NAMES = [n for n, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    spark_pdf = q.builder(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_all_queries_have_builders(spark):
    assert len(QUERIES) >= 25
    for name, q in QUERIES.items():
        assert callable(q.builder), name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
