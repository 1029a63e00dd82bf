"""Physical-plan property tests: the scale contracts of the engine.

Correctness tests prove WHAT each query returns; these pin HOW — the
plan shapes that keep the same code fast at 100 TB. If a refactor
turns a broadcast join into a sort-merge join, drops a parquet filter
pushdown, or reintroduces a nested-loop range join, these fail.
"""

from __future__ import annotations

import re

import pytest

from gh_archive_clickhouse_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name].builder(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_qt2_star_join_all_broadcast(spark):
    """Q5 shape: every dim join must plan as a broadcast JOIN TYPE at
    fixture scale — nation/region by hint, customer/supplier by the
    planner's own size stats (r15: the hint was removed from frames
    whose cardinality scales with the facts, per the qe14 rule, so
    this asserts the chosen join type, not a forced hint)."""
    plan = _plan(spark, "qt2_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_qt1_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "qt1_pricing_summary")
    assert re.search(r"PushedFilters: \[.*l_shipdate", plan), plan[:2000]


def test_qt1_column_pruning(spark):
    """The lineitem scan must read only the columns Q1 touches."""
    plan = _plan(spark, "qt1_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert "l_comment" not in cols and len(cols) <= 7, cols


def test_qe1_dedup_is_aggregate_not_window(spark):
    """ReplacingMergeTree view: aggregate WITH map-side partials
    (partial_max_by before the exchange), never a window over the
    fully-shuffled raw table. (Struct ordering keys make Spark pick
    SortAggregate over HashAggregate; the partial-agg property is the
    one that bounds shuffle volume.)"""
    plan = _plan(spark, "qe1_dedup_latest")
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_range_join_is_equi_join(spark):
    """qe9 must plan as a bucketed equi-join — never nested-loop."""
    plan = _plan(spark, "qe9_range_join_errors")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_candidates_no_cartesian(spark):
    plan = _plan(spark, "qx9_lsh_candidates")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_shuffle(spark):
    """qe8: exactly one Exchange below the window (union both sides,
    shuffle once on the key)."""
    plan = _plan(spark, "qe8_asof_click_before_purchase")
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 2, f"{n_exchange} exchanges:\n{plan[:1500]}"
    assert "Window" in plan


def test_simhash_is_partial_hash_aggregate(spark):
    """qx7's 60-counter vote aggregate must be a HashAggregate with
    map-side partials (one 60-counter row per doc crosses the wire),
    not an interpreted higher-order fold."""
    plan = _plan(spark, "qx7_simhash")
    assert "HashAggregate" in plan
    assert "partial_" in plan


@pytest.mark.parametrize(
    "name", ["qx2_cosine_topk", "qx12_ivf_topk", "qx15_srp_topk"]
)
def test_topk_is_take_ordered(spark, name):
    """orderBy+limit must compile to TakeOrderedAndProject — per-task
    top-k merged at the driver, not a global sort shuffle."""
    plan = _plan(spark, name)
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_qt19_all_predicates_pushed(spark):
    """Q6 shape: every filter (date/discount/quantity) must reach the
    parquet scan as a pushed filter; the plan has no join and no
    wide shuffle beyond the 1-row final aggregate."""
    plan = _plan(spark, "qt19_forecast_revenue")
    assert re.search(r"PushedFilters: \[.*l_shipdate", plan), plan[:2000]
    assert re.search(r"PushedFilters: \[.*l_discount", plan)
    assert re.search(r"PushedFilters: \[.*l_quantity", plan)
    assert "Join" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "qt20_volume_shipping",
        "qt21_market_share",
        "qt22_returned_items",
        "qt23_promo_revenue",
        "qt26_disjunctive_revenue",
    ],
)
def test_tpch2_dims_broadcast(spark, name):
    """Second battery: dim joins plan as broadcast at fixture scale
    (fixed dims by hint, SF-scaling frames by the planner's size
    stats — r15 removed their forced hints per the qe14 rule);
    nothing degenerates to a cartesian/nested-loop."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qt22_topk_is_take_ordered(spark):
    plan = _plan(spark, "qt22_returned_items")
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_qt27_semi_join_keeps_equi_key(spark):
    """The EXISTS with a non-equi date residual must still hash-join on
    the equi key (LeftSemi with join residual), not nested-loop."""
    plan = _plan(spark, "qt27_late_shipment_priority")
    assert "LeftSemi" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_qt28_anti_join_date_pushdown(spark):
    """Q22 shape: the idleness anti-join's orders scan must carry the
    date predicate (pushed filter), shrinking the build side."""
    plan = _plan(spark, "qt28_idle_rich_customers")
    assert re.search(r"PushedFilters: \[.*o_orderdate", plan), plan[:2000]
    assert "LeftAnti" in plan


def test_qx10_scoring_parallelized(spark):
    """The pair-scoring join must not collapse to one task: the probe
    side carries a repartition when the input is under-partitioned."""
    from gh_archive_clickhouse_spark.plans.registry import QUERIES as _Q

    df = _Q["qx10_embedding_neardup"].builder(spark, SF_DIR)
    # physical check: > 1 partition entering the join stage
    assert df.rdd.getNumPartitions() > 1


def test_qx23_benchmark_grams_broadcast(spark):
    """Decontamination: the benchmark gram set must BROADCAST — the
    corpus side (100 TB at scale) must not shuffle for the join."""
    plan = _plan(spark, "qx23_ngram_contamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_qx60_rates_broadcast_corpus_map_only(spark):
    """Mixture resample: the per-source rate table (O(sources) rows)
    must BROADCAST and the keep filter must run map-side — the corpus
    never shuffles to learn its fate (the only corpus shuffle is the
    final small per-(source,lang) aggregate)."""
    plan = _plan(spark, "qx60_mixture_resample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_qx24_quantize_is_map_only(spark):
    """int8 quantization is per-row: the plan must contain NO exchange
    at all (pure scan -> project)."""
    plan = _plan(spark, "qx24_embedding_quantize")
    assert "Exchange" not in plan, plan[:2000]


def test_qm3_frame_sample_no_shuffle(spark):
    """Frame explode is partition-local mapInPandas: no exchange."""
    plan = _plan(spark, "qm3_frame_sample")
    assert "Exchange" not in plan, plan[:2000]
    assert "MapInPandas" in plan


def test_qx22_tfidf_single_doc_window(spark):
    """TF-IDF: tf and df are hash aggregates (map-side partials) and
    the corpus count is a broadcast, not a collected scalar."""
    plan = _plan(spark, "qx22_tfidf_top_terms")
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_qe13_funnel_single_user_shuffle(spark):
    """All funnel steps are windows over the SAME partitionBy(user) and
    the per-user collapse reuses that partitioning: exactly one
    user-keyed exchange plus the tiny final level histogram's."""
    plan = _plan(spark, "qe13_funnel")
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_qx25_kmeans_broadcasts_centroids(spark):
    """k-means assignment must broadcast the centroid side every
    round — the corpus side never shuffles for scoring."""
    plan = _plan(spark, "qx25_kmeans_ivf_build")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_qx29_sketch_rollup_two_level_agg(spark):
    """Sketch rollup: daily partial hash aggregates (map-side HLL
    partials) merged by a second aggregate — no joins over events."""
    plan = _plan(spark, "qx29_sketch_rollup")
    assert "HashAggregate" in plan
    assert "partial_hllsketchagg" in plan.lower().replace("_", "") or \
        "hll_sketch_agg" in plan or "hllsketchagg" in plan.lower()
    assert "SortMergeJoin" not in plan


def test_qe14_cohort_join_unhinted(spark):
    """Cohort retention: the per-user cohort anchor is O(users) —
    unbounded at corpus scale — so the plan must carry NO forced
    broadcast hint; the join strategy is AQE's runtime call (broadcast
    at fixture scale, shuffled join when the anchor is big). The join
    stays an equi-join either way."""
    df = QUERIES["qe14_cohort_retention"].builder(spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()
    plan = _plan(spark, "qe14_cohort_retention")
    assert "CartesianProduct" not in plan
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_qx31_survivors_is_anti_join_no_cartesian(spark):
    """The canonical-corpus cut must be a LeftAnti equi-join on doc_id
    with no cartesian anywhere in the (LSH + CC + cut) pipeline, and
    no forced broadcast of the drop list (a large corpus fraction at
    scale)."""
    df = QUERIES["qx31_dedup_survivors"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qx32_semantic_dedup_blocked_and_anti(spark):
    """SemDeDup: the cosine pair stage must stay a blocked equi-join
    (never all-pairs) and the survivors cut a LeftAnti join — no
    cartesian/BNLJ anywhere in embeddings → pairs → CC → cut."""
    df = QUERIES["qx32_semantic_dedup"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qt30_correlations_are_semi_anti_joins(spark):
    """Q21 shape: the EXISTS/NOT EXISTS double correlation must
    compile to semi + anti hash joins, never nested loops over the
    fact."""
    plan = _plan(spark, "qt30_waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qx38_model_serving_is_map_only(spark):
    """Model-as-data serving: the corpus is never shuffled — the only
    exchanges are the tiny weight-map aggregate and its broadcast."""
    df = QUERIES["qx38_model_scored_filter"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # any hash-partitioned exchange would mean the corpus shuffled
    assert not re.search(r"hashpartitioning\(doc_id", plan), plan[:3000]
    assert "BroadcastExchange" in plan


def test_qx39_vocab_topk_is_take_ordered_with_partial_agg(spark):
    """Heavy hitters: partial (map-side) aggregation before the token
    shuffle, and the top-100 must be TakeOrderedAndProject — never a
    global sort of the vocabulary."""
    df = QUERIES["qx39_vocab_heavy_hitters"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "partial_count" in plan, plan[:2000]
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_qt32_correlated_min_is_aggregate_join_topk(spark):
    """Q2 shape: the correlated min must be an aggregate joined back
    (never a per-row subquery/nested loop); dims broadcast; the top-20
    is TakeOrderedAndProject."""
    df = QUERIES["qt32_cheapest_supplier"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qt33_profit_dims_broadcast(spark):
    """Q9 shape: part/supplier/nation joins broadcast; no cartesian."""
    df = QUERIES["qt33_nation_year_profit"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "CartesianProduct" not in plan


def test_qt35_dominance_is_semi_join(spark):
    """Q20 shape: the supplier membership test compiles to a LEFT SEMI
    join over the aggregated dominance set."""
    df = QUERIES["qt35_dominant_suppliers"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qx40_ivfpq_prune_shortlist_rerank(spark):
    """Composite IVF-PQ: no cartesian/BNLJ anywhere except the
    deliberate broadcast one-row query fan-outs; the ADC shortlist is
    TakeOrderedAndProject (never a global sort of the candidates)."""
    df = QUERIES["qx40_ivfpq_search"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # every nested-loop join must be a broadcast of a ONE-ROW frame
    # (the query row / distance table) — count them and require the
    # big sides joined hash-wise
    assert "BroadcastHashJoin" in plan


def test_qx42_pipeline_artifact_invariants(spark):
    """The composite pre-training pipeline now ends at the VERIFIED
    on-disk shard artifact (write_training_shards +
    verify_training_shards run inside the builder — a divergent
    manifest would have raised before the frame is returned), so the
    output frame is the read-back of the verified tree. Pin BOTH:

    1. the COMPOSED stage plans never go quadratic — the builder's
       ``probe`` stashes each stage's pre-barrier frame (the
       materialization barriers truncate lineage, so the final
       frame's plan alone would say nothing about the join-bearing
       stages: the mixture-gate join, the seeded shuffle, the packing
       slice join-back) and every one must be free of
       CartesianProduct / BroadcastNestedLoopJoin;
    2. the artifact contract: dense 0-based sequence ids, the
       contiguous integer shard formula, full 256-token sequences
       except possibly the last, and a content fingerprint on every
       row."""
    from gh_archive_clickhouse_spark.plans.ext_queries import (
        QX42_SHARDS,
        qx42_preprocess_pipeline,
    )

    probe: dict = {}
    df = qx42_preprocess_pipeline(spark, SF_DIR, probe=probe)
    assert set(probe) == {"kept", "qkept", "clean", "ordered", "seqs"}
    for name, frame in probe.items():
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    rows = df.orderBy("seq_id").collect()
    assert rows, "pipeline produced no sequences at the test SF"
    total = len(rows)
    assert [r["seq_id"] for r in rows] == list(range(total))
    for r in rows:
        assert r["shard"] == r["seq_id"] * QX42_SHARDS // total
        assert r["content_md5"] and len(r["content_md5"]) == 32
        assert r["n_slices"] >= 1
    # every sequence is budget-full except possibly the final one
    assert all(r["n_tokens"] == 256 for r in rows[:-1])
    assert 0 < rows[-1]["n_tokens"] <= 256


def test_qx44_checks_fire_on_planted_violations(spark, tmp_path):
    """The audit's oracle gate only ever sees all-zero fixtures, so
    this plants one violation of every kind in a synthetic warehouse
    and asserts each check actually FIRES — a degenerate always-zero
    check cannot pass."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (1, base, 1, "view", 1.0, "{}"),
            (1, base, 1, "view", 1.0, "{}"),  # dup event_id
            (2, None, 1, "view", 1.0, "{}"),  # null ts
            (3, base, 1, "teleport", 1.0, "{}"),  # bad domain
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    spark.createDataFrame(
        [(1, 99, "O", 10.0, base, "1-URGENT")],  # custkey 99 orphan
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "c", 0)], "c_custkey long, c_name string, c_nationkey long"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [
            # orderkey 7 orphan; negative price; discount 1.5
            (7, 1, 1, 1, 1.0, -5.0, 1.5, 0.0, "N", "O", base),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    out = {
        r.check_name: r.n_violations
        for r in QUERIES["qx44_data_quality_audit"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        "events_unique_id": 1,
        "events_ts_not_null": 1,
        "events_type_domain": 1,
        "orders_customer_fk": 1,
        "lineitem_order_fk": 1,
        "lineitem_price_nonneg": 1,
        "lineitem_discount_range": 1,
    }, out


def test_arrow_kernels_work_from_foreign_cwd():
    """Arrow kernels are pickled by module reference, so executors
    must import the package themselves. A session launched OUTSIDE
    the repo root (the shape of any external driver) must still run
    mapInPandas queries — plans/common.ensure_package_on_workers
    ships the package via addPyFile. Regression guard for the
    ModuleNotFoundError found by soaking from /tmp."""
    import subprocess
    import sys
    from pathlib import Path

    from tests.conftest import SF_DIR

    repo = str(Path(__file__).resolve().parent.parent)
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[2]').getOrCreate()\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "from gh_archive_clickhouse_spark.plans.registry import QUERIES\n"
        "df = QUERIES['qm1_multimodal_meta'].builder(spark, %r)\n"
        "print('ROWS', df.count())\n" % (repo, SF_DIR)
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k != "PYTHONPATH"
        },
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ROWS" in out.stdout, out.stdout


def test_unhinted_frames_carry_no_forced_broadcast(spark):
    """r15 enforcement of the qe14 rule on the TPC-H batteries: with
    spark.sql.autoBroadcastJoinThreshold=-1 the planner can ONLY
    produce a BroadcastHashJoin from an explicit hint (hints override
    the threshold), so a plan with zero broadcast joins under -1
    PROVES no forced broadcast survives anywhere in the query — the
    property that matters at warehouse SF, where a hinted
    customer/supplier/unfiltered-part frame would OOM the executors
    while unhinted AQE degrades to SMJ. The fixed-cardinality
    nation/region hints and one-row scalar crossJoin broadcasts are
    deliberately still present in most of these queries, so the
    assertion is scoped to the frames the r15 change unhinted: the
    join key columns of customer/supplier/big-part sides must not sit
    under a BroadcastExchange. Simplest robust form: these five
    queries join ONLY fact-scaling frames besides nation/region, so
    we assert their nation/region-free siblings plan with no
    broadcast at all under -1."""
    # queries whose EVERY join side is a fact-scaling frame (no
    # nation/region/scalar broadcast in the plan at all)
    pure = ["qt3_semi_join", "qt12_shipping_priority",
            "qt25_large_volume_customers", "qt26_disjunctive_revenue",
            "qt34_important_parts"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in pure:
            df = QUERIES[name].builder(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # qt34's one-row scalar threshold legitimately broadcasts
            # (IdentityBroadcastMode on an aggregate output); equi-join
            # sides must not.
            if name == "qt34_important_parts":
                assert "BroadcastHashJoin" not in plan, plan[:1500]
            else:
                assert "BroadcastExchange" not in plan, (name, plan[:1500])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dedup_verify_semi_joins_carry_no_forced_broadcast(spark):
    """r15 extension of the qe14 rule to the LSH verify stage: the
    candidate-id semi-join in qx9/qx20/qx57 must NOT force-broadcast
    cand_ids — candidates scale with the corpus's near-dup count, so
    a hint OOMs exactly on the corpora dedup exists for. Under
    autoBroadcastJoinThreshold=-1 any BroadcastExchange in the plan
    can only come from a hint, so zero broadcasts proves the hint is
    gone (these three queries have no nation/region or scalar
    broadcasts to exempt)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in (
            "qx9_lsh_candidates",
            "qx20_chargram_jaccard",
            "qx57_split_leakage_cut",
        ):
            df = QUERIES[name].builder(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastExchange" not in plan, (name, plan[:1500])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
