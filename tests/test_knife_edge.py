"""Regression pins for the rounding knife-edge class (r12/r13).

Three production flips (qe4 at sf1, qx56 at sf1 stress, the r9
rarity_score incident) shared one mechanism: a derived double whose
TRUE value is an integer-ratio rational landing exactly on a
``round(x, 6)`` half-boundary — in lowest terms ``(2j+1)/(2^7·5^t)``
with t >= 1, which is not binary-representable, so the stored double
sits within half an ULP of the boundary where Spark's BigDecimal
HALF_UP and DuckDB's ``x*1e6`` float path can disagree. The r12/r13
fix removes the divergent step entirely: integer-ratio quotients are
emitted UNROUNDED, making the result the same IEEE DAG in every
engine.

These tests pin that contract with adversarial fixtures whose ratios
land exactly ON boundary rationals. The assertions are BIT-EXACT
(``==`` on doubles): the emitted value must equal Python's own IEEE
division of the same integers, and DuckDB's oracle fragment must
emit the identical bits. Reintroducing any rounding on these columns
fails the equality immediately (round(1/3200, 6) != 1/3200), so the
class cannot quietly reopen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.text_analysis import (
    ngram_contamination,
    quality_score,
    token_lang_stats,
)

# 3200 = 2^7 * 5^2: k/3200 with k odd and coprime to 5 is a lowest-
# terms (2j+1)/(2^7 * 5^2) rational — exactly a round-6 half-boundary
# (1/3200 = 0.0003125) and NOT binary-representable: the regime where
# the engines' double-round implementations disagreed in production.
BOUNDARY_DEN = 3200


def _doc(n_stop: int, n_total: int = BOUNDARY_DEN) -> str:
    """A document of n_total single-letter tokens, the first n_stop of
    which are the stopword 'the' — stopword_ratio = n_stop/n_total."""
    return " ".join(["the"] * n_stop + ["zz"] * (n_total - n_stop))


def test_quality_ratios_are_raw_ieee_quotients(spark):
    docs = spark.createDataFrame(
        [(1, _doc(1)), (2, _doc(3)), (3, _doc(4999, 5000))],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in quality_score(docs).collect()}
    # bit-exact vs Python's IEEE division of the same integers
    assert got[1].stopword_ratio == 1 / 3200  # exact boundary rational
    assert got[2].stopword_ratio == 3 / 3200
    assert got[3].stopword_ratio == 4999 / 5000
    # the blend too: same literals, same evaluation order as the
    # operator (left-assoc adds, one division per ratio)
    for doc_id, n_stop, n_tot in ((1, 1, 3200), (2, 3, 3200), (3, 4999, 5000)):
        s = n_stop / n_tot
        n_alpha = 3 * n_stop + 2 * (n_tot - n_stop)  # 'the' + 'zz' letters
        n_chars = n_alpha + (n_tot - 1)  # single spaces
        a = n_alpha / n_chars
        blend = 0.4 * 1.0 + 0.3 * a + 0.2 * (1.0 - abs(s - 0.3)) + 0.1 * 1.0
        assert got[doc_id].quality == blend, doc_id
        assert got[doc_id].alpha_ratio == a, doc_id


def test_quality_boundary_rationals_match_duckdb_bitwise(spark, duck):
    """The exact adversarial shape that flipped qx56: both engines
    must emit the SAME double for a boundary-landing ratio. Uses the
    qx5 oracle fragment verbatim on the same rows."""
    from gh_archive_clickhouse_spark.plans.ext_queries import _ORACLE_QX5

    rows = [(i, _doc(2 * i + 1)) for i in range(8)]  # odd k / 3200
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        quality_score(docs)
        .orderBy("doc_id")
        .toPandas()
        .reset_index(drop=True)
    )
    con = duck.cursor()
    con.register("__edge_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = _ORACLE_QX5.replace("FROM documents", "FROM __edge_docs")
    want = con.execute(
        f"SELECT * FROM ({sql}) ORDER BY doc_id"
    ).fetchdf().reset_index(drop=True)
    for col in ("stopword_ratio", "quality", "mean_token_len",
                "punct_ratio", "alpha_ratio"):
        assert list(got[col]) == list(want[col]), col  # bit-exact


def test_avg_tokens_is_exact_sum_single_division(spark):
    """token_lang_stats.avg_tokens: 2^7·5^t doc counts put the true
    mean exactly on boundary rationals; the emitted value must be the
    one IEEE division of the exact long sum (not avg(double), whose
    partials depend on partitioning)."""
    # 3200 docs (2^7·5^2 — a boundary denominator), one doc with two
    # tokens: sum = 3201 (odd, coprime to 5), so the true mean
    # 3201/3200 = 1.0003125 is exactly a round-6 half-boundary in
    # lowest terms. repartition(13) checks partitioning-invariance of
    # the exact-long-sum shape at the same time.
    rows = [(i, "t t" if i == 0 else "t", "en") for i in range(3200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).withColumn("n_chars", F.length("text"))
    (r,) = token_lang_stats(docs.repartition(13)).collect()
    assert r.n_tokens == 3201 and r.n_docs == 3200
    assert r.avg_tokens == 3201 / 3200


def test_contamination_rate_boundary_rational(spark):
    """rate = n_contaminated/n_grams emitted raw: a doc with 3200
    distinct 2-grams and an odd contaminated count sits exactly on the
    boundary; the value must equal Python's division bit-for-bit."""
    corpus_toks = [f"w{i}" for i in range(3201)]  # 3200 distinct 2-grams
    bench_text = "w0 w1"  # contaminates exactly one 2-gram
    corpus = spark.createDataFrame(
        [(1, " ".join(corpus_toks))], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, bench_text)], "doc_id long, text string"
    )
    (r,) = ngram_contamination(corpus, bench, n=2).collect()
    assert r.n_grams == 3200 and r.n_contaminated == 1
    assert r.rate == 1 / 3200  # the boundary rational, bit-exact
