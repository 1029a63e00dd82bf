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


# Short/empty docs never appear in the driver fixtures, so the banding
# sentinel semantics (Spark excludes shingle-less / fingerprint-0 docs;
# the oracle SQL must mirror it) only get exercised here.
_SHORT_DOC_QUERIES = [
    "qx9_lsh_candidates",
    "qx13_simhash_neardup",
    "qx20_chargram_jaccard",
]


@pytest.mark.parametrize("name", _SHORT_DOC_QUERIES)
def test_banding_oracle_parity_on_short_docs(spark, tmp_path, name):
    import duckdb
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": [
                "",
                "",
                "a b",
                "b c",
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",
                "completely different text with several other words",
            ],
        }
    )
    path = tmp_path / "documents.parquet"
    docs.to_parquet(path)
    q = QUERIES[name]
    spark_pdf = q.builder(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    oracle_pdf = con.execute(q.oracle).fetchdf()
    con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name)
    # the duplicate real pair is present; no sentinel doc ever pairs
    assert ((spark_pdf.doc_a == 5) & (spark_pdf.doc_b == 6)).any()
    assert not spark_pdf.doc_a.isin([1, 2, 3, 4]).any()
    assert not spark_pdf.doc_b.isin([1, 2, 3, 4]).any()


def test_batched_bpe_oracle_parity_on_conflict_heavy_corpus(
    spark, tmp_path
):
    """qx63's oracle on an ADVERSARIAL corpus the driver fixture never
    produces: a two-letter alphabet makes nearly every top pair share
    symbols, so rounds under-accept (fewer than k pairs survive the
    greedy disjointness cut), the 4*want+8 over-fetch boundary
    matters, and the unrolled tail rounds (want shrinking to 0) all
    execute. Spark's loop and the unrolled SQL must agree exactly."""
    import duckdb
    import pandas as pd

    from gh_archive_clickhouse_spark.operators.text_analysis import (
        bpe_vocab_build_batched,
    )
    from gh_archive_clickhouse_spark.plans.ext_queries import (
        _bpe_batched_oracle,
    )

    texts = [
        "ab ab ba bb aa ab ba",
        "aab abb bab ab ab aa",
        "bb ba ab aab bba abab",
        "a b ab ba aabb abba baab",
    ]
    docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    path = tmp_path / "documents.parquet"
    docs.to_parquet(path)

    sdf = spark.createDataFrame(docs)
    got = bpe_vocab_build_batched(sdf, merges=10, pairs_per_round=4)
    spark_pdf = got.toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    oracle_pdf = con.execute(_bpe_batched_oracle(10, 4)).fetchdf()
    con.close()
    assert_frames_match(spark_pdf, oracle_pdf, "qx63_adversarial")
    assert len(spark_pdf) == 10  # every merge found eventually
    # conflicts really fired: some accepted pair chains a merged
    # symbol (len > 1 side), i.e. multi-level merges were exercised
    assert ((spark_pdf["left"].str.len() > 1)
            | (spark_pdf["right"].str.len() > 1)).any()
