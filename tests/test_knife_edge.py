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


def test_tpch_ratio_boundary_fixture_dir(spark, duck, tmp_path):
    """r14 extension: the landed qt21/qt23/qt24/qt32 round-drops get
    the same permanent tripwire as the quality columns — a crafted
    mini scale-dir whose revenue sums make every ratio land exactly ON
    a boundary rational (or a non-terminating decimal for /7), checked
    bit-exactly against Python IEEE division AND DuckDB running the
    committed oracle SQL on the identical parquet. Reintroducing any
    round() on these columns fails the equality immediately."""
    import duckdb

    from gh_archive_clickhouse_spark.plans.registry import QUERIES

    d = tmp_path / "sf_edge"
    d.mkdir()
    ts = pd.Timestamp

    def w(name, df, int32=()):
        for c in int32:
            df[c] = df[c].astype("int32")
        for c in df.columns:
            # fixtures store timestamp[us]; pandas defaults to [ns],
            # which read() would surface as bigint under nanosAsLong
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
        df.to_parquet(d / f"{name}.parquet", index=False)

    w("region", pd.DataFrame(
        {"r_regionkey": [1], "r_name": ["ASIA"]}), ["r_regionkey"])
    w("nation", pd.DataFrame(
        {"n_nationkey": [5, 6], "n_name": ["NATION_5", "NATION_6"],
         "n_regionkey": [1, 1]}), ["n_nationkey", "n_regionkey"])
    w("part", pd.DataFrame(
        {"p_partkey": [1, 2, 3, 4],
         "p_name": ["p1", "p2", "p3", "p4"],
         "p_brand": ["Brand#9", "Brand#9", "Brand#1", "Brand#9"],
         "p_type": ["PROMO", "STANDARD", "STANDARD", "PROMO"],
         "p_size": [1, 1, 1, 1],
         "p_retailprice": [1.0, 1.0, 1.0, 1.0]}), ["p_size"])
    w("supplier", pd.DataFrame(
        {"s_suppkey": [5, 6], "s_name": ["s5", "s6"],
         "s_nationkey": [5, 6], "s_acctbal": [10.0, 20.0]}),
      ["s_nationkey"])
    w("customer", pd.DataFrame(
        {"c_custkey": [1], "c_name": ["c1"], "c_nationkey": [5],
         "c_acctbal": [0.0], "c_mktsegment": ["SEG"]}), ["c_nationkey"])
    w("orders", pd.DataFrame(
        {"o_orderkey": [1], "o_custkey": [1], "o_orderstatus": ["O"],
         "o_totalprice": [0.0], "o_orderdate": [ts("1996-06-01")],
         "o_orderpriority": ["P"]}))
    # one lineitem block per query, isolated by orderkey (qt21 joins
    # orders), shipdate (qt23's window), brand (qt24) and p_type
    # (qt32); revenue sums are engineered to the boundary rationals.
    li = pd.DataFrame(
        [
            # qt21: NATION_5 rev 1 vs total 3200 -> mkt_share 1/3200
            (1, 1, 5, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1996-06-01")),
            (1, 1, 6, 2, 1.0, 3199.0, 0.0, 0.0, "N", "O", ts("1996-06-01")),
            # qt23: promo 1 of 320000 -> (100*1)/320000 = 1/3200
            (2, 1, 5, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-03-15")),
            (2, 2, 5, 2, 1.0, 319999.0, 0.0, 0.0, "N", "O", ts("1997-03-15")),
            # qt24: Brand#1 qtys 1/99 -> avg 50, only the qty-1 row is
            # small; total 1 -> avg_yearly = 1/7 (non-terminating)
            (3, 3, 5, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1995-01-01")),
            (3, 3, 5, 2, 99.0, 500.0, 0.0, 0.0, "N", "O", ts("1995-01-01")),
            # qt32: 0.01/32 = 0.0003125 boundary (regime-(a) shape)
            (4, 4, 5, 1, 32.0, 0.01, 0.0, 0.0, "N", "O", ts("1995-01-01")),
        ],
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    w("lineitem", li, ["l_linenumber"])

    con = duckdb.connect()
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{d}/{t}.parquet')"
        )

    expected = {
        "qt21_market_share": ("mkt_share", 1.0 / 3200.0),
        "qt23_promo_revenue": ("promo_revenue_pct", 100.0 * 1.0 / 320000.0),
        "qt24_small_qty_revenue": ("avg_yearly", 1.0 / 7.0),
    }
    for name, (col, want) in expected.items():
        q = QUERIES[name]
        got = q.builder(spark, str(d)).toPandas()
        assert list(got[col]) == [want], name  # bit-exact vs Python
        oracle = con.execute(q.oracle).fetchdf()
        assert list(oracle[col]) == [want], name  # DuckDB identical bits

    q32 = QUERIES["qt32_cheapest_supplier"]
    got = q32.builder(spark, str(d)).toPandas().set_index("p_partkey")
    assert got.loc[4, "unit_cost"] == 0.01 / 32.0
    oracle = con.execute(q32.oracle).fetchdf().set_index("p_partkey")
    assert oracle.loc[4, "unit_cost"] == 0.01 / 32.0
    assert list(got["unit_cost"]) == list(oracle["unit_cost"])
    con.close()


def test_doc_ratio_boundary_fixtures(spark, tmp_path):
    """r14 extension, documents side: qx19.bpe_per_ws and
    qx28.share/source_weight emit raw IEEE quotients — pinned on
    fixtures whose counts produce 3201/3200 (boundary) and 1/3200 /
    1600/3199 (boundary / non-terminating)."""
    import duckdb

    from gh_archive_clickhouse_spark.plans.registry import QUERIES

    d = tmp_path / "sf_docs"
    d.mkdir()
    # doc 0: 3199 'zz' + one 'zz9' => 3200 ws tokens, 3201 bpe tokens
    text = " ".join(["zz"] * 3199 + ["zz9"])
    docs = pd.DataFrame({
        "doc_id": range(3200),
        "text": [text] + ["a"] * 3199,
        "lang": ["en"] * 3200,
        "source": ["B"] + ["A"] * 3199,
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(d / "documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{d}/documents.parquet')"
    )

    q19 = QUERIES["qx19_bpe_token_stats"]
    got = q19.builder(spark, str(d)).toPandas().set_index("doc_id")
    assert got.loc[0, "n_ws_tokens"] == 3200
    assert got.loc[0, "n_bpe_tokens"] == 3201
    assert got.loc[0, "bpe_per_ws"] == 3201.0 / 3200.0
    oracle = con.execute(q19.oracle).fetchdf().set_index("doc_id")
    assert oracle.loc[0, "bpe_per_ws"] == 3201.0 / 3200.0

    q28 = QUERIES["qx28_mixture_weights"]
    got = q28.builder(spark, str(d)).toPandas().set_index("source")
    assert got.loc["B", "share"] == 1.0 / 3200.0  # boundary rational
    assert got.loc["A", "share"] == 3199.0 / 3200.0
    assert got.loc["B", "source_weight"] == 3200.0 / (2.0 * 1.0)
    assert got.loc["A", "source_weight"] == 3200.0 / (2.0 * 3199.0)
    oracle = con.execute(q28.oracle).fetchdf().set_index("source")
    for c in ("share", "source_weight"):
        assert oracle.loc["B", c] == got.loc["B", c], c
        assert oracle.loc["A", c] == got.loc["A", c], c
    con.close()


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


def test_shingle_jaccard_boundary_rational(spark, duck):
    """r15 terminal extension — shingle_jaccard, THE shared LSH
    verification formula (8 consumers: qx9/qx20/qx26/qx31/qx42/qx43/
    qx56/qx57), emits the raw IEEE int/int quotient. Engineered
    shingle unions of 640 = 2^7*5 and 3200 = 2^7*5^2 with odd
    intersections land exactly ON round-6 half-boundary rationals
    (1/640 = 0.0015625, 3/640, 1/3200): the emitted double must equal
    Python's own IEEE division bit-for-bit, and DuckDB running the
    committed oracle fragment shape (list_filter/list_contains) on the
    identical arrays must emit the identical bits. Reintroducing any
    round() on this column fails immediately (round(1/640, 6) !=
    1/640), closing the class tripwire on its last fixed site."""
    from gh_archive_clickhouse_spark.operators.dedup import shingle_jaccard

    def arrays(n_a, n_b, n_inter, tag):
        shared = [f"c{tag}_{i}" for i in range(n_inter)]
        a = shared + [f"a{tag}_{i}" for i in range(n_a - n_inter)]
        b = shared + [f"b{tag}_{i}" for i in range(n_b - n_inter)]
        return a, b

    cases = [
        (1, *arrays(320, 321, 1, 1), 1 / 640),   # boundary: 1/640
        (2, *arrays(340, 303, 3, 2), 3 / 640),   # boundary: 3/640
        (3, *arrays(1600, 1601, 1, 3), 1 / 3200),  # boundary: 1/3200
        (4, [], [], 0.0),                        # empty union -> 0.0
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, a, b, _ in cases],
        "pair_id long, sha_ array<string>, shb_ array<string>",
    )
    got = {
        r.pair_id: r.jaccard
        for r in df.select(
            "pair_id", shingle_jaccard().alias("jaccard")
        ).collect()
    }
    for pair_id, a, b, want in cases:
        assert got[pair_id] == want, pair_id  # bit-exact vs Python

    con = duck.cursor()
    con.register(
        "__edge_pairs",
        pd.DataFrame(
            [(i, a, b) for i, a, b, _ in cases],
            columns=["pair_id", "sha_", "shb_"],
        ),
    )
    want_db = {
        int(pid): v
        for pid, v in con.execute(
            """
            SELECT pair_id,
                   CASE WHEN len(sha_) + len(shb_)
                             - len(list_filter(sha_,
                                   s -> list_contains(shb_, s))) > 0
                        THEN CAST(len(list_filter(sha_,
                                   s -> list_contains(shb_, s))) AS DOUBLE)
                             / (len(sha_) + len(shb_)
                                - len(list_filter(sha_,
                                      s -> list_contains(shb_, s))))
                        ELSE 0.0 END AS jaccard
            FROM __edge_pairs
            """
        ).fetchall()
    }
    for pair_id, _, _, want in cases:
        assert want_db[pair_id] == want, pair_id  # DuckDB identical bits
        assert want_db[pair_id] == got[pair_id], pair_id


def test_decimal_sum_2_53_bound_at_max_verified_sf(spark):
    """Scale scoping for the qt21/qt23/qt24 unrounded decimal-sum ->
    double quotients (r15, per ADVICE): the raw quotient is
    bit-identical across engines ONLY while each DECIMAL(18,6) sum's
    UNSCALED value stays below 2^53 — past it, DuckDB's
    int128 -> double -> /1e6 cast double-rounds while Spark's
    BigDecimal cast rounds once, and the quotient inputs diverge by
    ULPs (the measured qx25 mechanism). sf1/sf2 replicas concatenate
    key-offset copies of sf0.1 with money columns verbatim, so sums
    scale EXACTLY linearly in SF: measuring at sf0.1 pins the
    envelope. Asserts (a) every ratio-feeding dsum stays below the
    bound through sf2, the maximum oracle-verified scale, and (b) the
    documented crossover SFs (qt23 first, ~sf2.4; qt21 ~sf6) so
    SURVEY's ledger numbers stay tied to measurement."""
    import os

    import pytest

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):  # pragma: no cover - env guard
        pytest.skip("sf0.1 fixtures not present")

    from gh_archive_clickhouse_spark.plans.common import read

    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    li = read(spark, sf01, "lineitem")
    # qt23 denominator: one-month window, part join is fkey 1:1
    (d23,) = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .agg(F.sum(rev).cast("double").alias("d"))
        .collect()
    )
    # qt21 denominator: the builder's exact join cuts (PROMO parts,
    # ASIA customers, two-year orders), summed across years — each
    # per-year group den is strictly smaller than this total
    part = read(spark, sf01, "part").filter(F.col("p_type") == "PROMO")
    nation = read(spark, sf01, "nation")
    region = read(spark, sf01, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        read(spark, sf01, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o = read(spark, sf01, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    # the quotient's den is the per-year GROUP sum — bound the largest
    (d21,) = (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.sum(rev).cast("double").alias("d"))
        .agg(F.max("d").alias("d"))
        .collect()
    )
    bound = float(2**53) / 1e6  # max dsum value with exact unscaled
    max_verified_sf = 2.0  # the sf2 replica sweep (r14)
    for name, dsum_sf01 in (("qt23", d23.d), ("qt21", d21.d)):
        at_env = dsum_sf01 * (max_verified_sf / 0.1)
        assert at_env < bound, (
            f"{name}: dsum {at_env:.3e} at sf{max_verified_sf} exceeds "
            f"2^53 unscaled ({bound:.3e}) — the unrounded quotient is "
            f"no longer engine-deterministic inside the verified "
            f"envelope; reinstate a re-synchronizer or shrink the "
            f"envelope claim in SURVEY/registry"
        )
    # crossover pins (ledger numbers): qt23 crosses first, near sf2.4;
    # qt21's largest per-year group den crosses past sf4 (~sf5.9)
    cross23 = bound / (d23.d / 0.1)
    cross21 = bound / (d21.d / 0.1)
    assert 2.0 < cross23 < 3.0, cross23
    assert cross21 > 4.0, cross21
