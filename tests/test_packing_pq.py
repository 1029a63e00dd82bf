"""Round-4 operator units: sequence packing, product quantization,
passage-level dedup, containment near-dup pairs.

Semantics against brute-force references on adversarial micro-fixtures
plus the plan-shape contracts that keep each operator linear at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.dedup import (
    containment_pairs,
    passage_dup_stats,
)
from gh_archive_clickhouse_spark.operators.packing import (
    pack_coordinates,
    sequence_fill_stats,
)
from gh_archive_clickhouse_spark.operators.similarity import (
    pq_adc_topk,
    pq_codebook,
    pq_encode,
)
from gh_archive_clickhouse_spark.plans.common import read
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- packing


def test_pack_coordinates_matches_bruteforce(spark):
    """Two-level prefix sum == naive sequential layout, including
    zero-token docs, id gaps, and docs larger than the budget.
    group_size=2 forces many buckets (the hierarchical path)."""
    rows = [
        (0, "a b c"),
        (1, ""),
        (2, "a b c d e"),
        (3, " ".join(["w"] * 300)),  # larger than the whole budget
        (10, "x"),
    ]
    out = {
        r.doc_id: r
        for r in pack_coordinates(
            _docs(spark, rows),
            F.size(F.array_remove(F.split(F.col("text"), " "), "")),
            budget=16,
            group_size=2,
        ).collect()
    }
    running = 0
    for doc_id, text in rows:
        n = len([t for t in text.split(" ") if t])
        r = out[doc_id]
        assert r.n_tokens == n
        assert r.tokens_before == running
        assert r.seq_id == running // 16
        assert r.seq_offset == running % 16
        expect_cross = n > 0 and (running + n - 1) // 16 > running // 16
        assert r.crosses_boundary == expect_cross, doc_id
        running += n
    # the 300-token doc must cross; the empty doc must not
    assert out[3].crosses_boundary and not out[1].crosses_boundary


def test_pack_budget_validation(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_coordinates(
            _docs(spark, [(1, "a")]), F.lit(1), budget=0
        )


def test_sequence_fill_stats(spark):
    rows = [(0, " ".join(["t"] * 10)), (1, " ".join(["t"] * 10))]
    coords = pack_coordinates(
        _docs(spark, rows), F.size(F.split(F.col("text"), " ")), budget=16
    )
    stats = {r.seq_id: r for r in sequence_fill_stats(coords, 16).collect()}
    # doc 0 starts in seq 0; doc 1 starts at offset 10 and crosses
    assert stats[0].n_docs_starting == 2
    assert stats[0].tokens_started == 20
    assert stats[0].n_split_docs == 1
    assert stats[0].fill_frac_started == 1.25  # 20 tokens / 16 budget


def test_pack_no_global_window_over_rows(spark):
    """The scale contract: the only unpartitioned window runs over
    BUCKET TOTALS (post-aggregation), never over the raw rows — the
    raw-row window is partitioned by bucket."""
    import re

    docs = read(spark, SF_DIR, "documents")
    df = pack_coordinates(docs, F.lit(1), budget=256)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-row window: PARTITIONED by the bucket column (parallel scan)
    assert re.search(r"windowspecdefinition\(__g#\d+L, doc_id#", plan), (
        plan[:3000]
    )
    # the only unpartitioned window consumes the BUCKET TOTALS
    unpartitioned = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln
        and not re.search(r"windowspecdefinition\(__g#\d+L, doc_id#", ln)
    ]
    assert len(unpartitioned) == 1 and "__g_tokens" in unpartitioned[0], (
        unpartitioned
    )
    # bucket offsets come back via broadcast, not a shuffle join
    assert "BroadcastExchange" in plan


# ------------------------------------------------------ product quant


def test_pq_encode_codebook_vectors_encode_to_themselves(spark):
    """Every codebook vector's nearest centroid in every subspace is
    itself (distance 0) — the self-consistency invariant of any PQ
    implementation."""
    emb = read(spark, SF_DIR, "embeddings")
    enc = pq_encode(emb, m=8, dim=64)
    rows = enc.filter(F.col("vec_id") < 16).collect()
    assert len(rows) == 16
    for r in rows:
        assert list(r.codes) == [r.vec_id] * 8, r


def test_pq_adc_self_distance_zero(spark):
    """ADC distance of a codebook vector against its own codes is
    exactly 0 — and it wins the top-k."""
    emb = read(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb)
    enc = pq_encode(emb, m=8, dim=64, codebook=cb)
    query = emb.filter(F.col("vec_id") == 5).select(
        F.col("embedding").alias("q")
    )
    top = pq_adc_topk(enc, query, cb, k_top=1, m=8, dim=64).collect()
    assert top[0].vec_id == 5 and top[0].adc_dist == 0.0


def test_pq_encode_is_map_only(spark):
    """Encode must not shuffle the embedding table: the only exchanges
    are the broadcast of the one-row codebook (and the tiny
    single-partition aggregate that builds it) — never a
    hash-partitioned shuffle of the big side."""
    emb = read(spark, SF_DIR, "embeddings")
    df = pq_encode(emb, m=8, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan[:3000]
    assert "BroadcastExchange" in plan


# -------------------------------------------------------- passage dedup


def test_passage_dup_stats_flags_copied_chunk(spark):
    a_chunk = " ".join(f"a{i}" for i in range(16))
    b_chunk = " ".join(f"b{i}" for i in range(16))
    c_chunk = " ".join(f"c{i}" for i in range(16))
    docs = _docs(
        spark,
        [
            (1, f"{a_chunk} {b_chunk}"),  # original
            (2, f"{a_chunk} {c_chunk}"),  # reuses doc 1's first chunk
            (3, "short tail only"),  # single sub-16-token chunk
            (4, ""),  # no tokens -> no row
        ],
    )
    out = {r.doc_id: r for r in passage_dup_stats(docs).collect()}
    assert out[1].n_chunks == 2 and out[1].n_dup_chunks == 0
    assert out[2].n_chunks == 2 and out[2].n_dup_chunks == 1
    assert out[2].dup_frac == 0.5
    assert out[3].n_chunks == 1 and out[3].n_dup_chunks == 0
    assert 4 not in out


def test_passage_dup_first_occurrence_not_flagged(spark):
    """Within one doc, a repeated chunk counts once as original and
    once as duplicate (earlier chunk_idx wins)."""
    chunk = " ".join(f"w{i}" for i in range(16))
    docs = _docs(spark, [(7, f"{chunk} {chunk}")])
    (r,) = passage_dup_stats(docs).collect()
    assert r.n_chunks == 2 and r.n_dup_chunks == 1


# --------------------------------------------------------- containment


def test_containment_catches_subset_copy(spark):
    """A doc fully embedded in a much larger doc: containment = 1.0
    even though Jaccard (|∩|/|∪|) is far below any usable threshold."""
    inner = " ".join(f"t{i}" for i in range(10))
    big = inner + " " + " ".join(f"z{i}" for i in range(80))
    docs = _docs(spark, [(1, big), (2, inner)])
    rows = containment_pairs(docs, threshold=0.9).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment == 1.0
    # Jaccard for the same pair is small — containment is the point
    assert r.shared / (88 + 8 - r.shared) < 0.15


def test_containment_stop_shingle_cap_defuses_hot_key(spark):
    """A boilerplate shingle shared by > max_df docs must NOT create
    pairs: the df cap drops it before the self-join (the quadratic
    hot-bucket guard)."""
    boiler = "all rights reserved"
    docs = _docs(
        spark, [(i, f"u{i} v{i} {boiler}") for i in range(60)]
    )
    rows = containment_pairs(docs, max_df=50, threshold=0.1).collect()
    assert rows == []
    # with the cap lifted the same corpus pairs quadratically
    rows2 = containment_pairs(docs, max_df=100, threshold=0.1).collect()
    assert len(rows2) == 60 * 59 / 2


def test_emit_packed_sequences_reconstructs_token_stream(spark):
    """Ground truth by brute force: concatenate every doc's tokens in
    doc_id order, cut into budget-sized chunks — each chunk must equal
    the tokens reassembled from that sequence's emitted slices."""
    from gh_archive_clickhouse_spark.operators.packing import (
        emit_packed_sequences,
    )

    budget = 7
    rows = [
        (0, "a b c"),
        (1, ""),                       # zero tokens: no slice rows
        (2, " ".join(f"t{i}" for i in range(17))),  # spans 3 seqs
        (3, "x y"),
        (4, " ".join(f"u{i}" for i in range(6))),
    ]
    docs = _docs(spark, rows)
    n_tok = F.size(F.array_remove(F.split(F.col("text"), " "), ""))
    coords = pack_coordinates(docs, n_tok, budget=budget)
    slices = emit_packed_sequences(coords, budget)

    toks = {i: [t for t in s.split(" ") if t] for i, s in rows}
    stream = [t for i in sorted(toks) for t in toks[i]]
    want = {
        s: stream[s * budget : (s + 1) * budget]
        for s in range((len(stream) + budget - 1) // budget)
    }
    got: dict[int, dict[int, list[str]]] = {}
    for r in slices.collect():
        seq = got.setdefault(r.seq_id, {})
        seq[r.seq_pos] = toks[r.doc_id][
            r.slice_start : r.slice_start + r.slice_len
        ]
    rebuilt = {
        s: [t for pos in sorted(parts) for t in parts[pos]]
        for s, parts in got.items()
    }
    assert rebuilt == want
    # zero-token doc emitted nothing
    assert not any(r.doc_id == 1 for r in slices.collect())


def test_densify_hash_sparse_keys_then_pack(spark):
    """densify_order on genuinely sparse keys (md5-derived 60-bit):
    the dense ids are exactly 0..n-1 and order-preserving, packing by
    them matches the brute-force sequential layout, and the bucket
    table is back to ceil(n/group_size) rows (the degradation the
    operator exists to fix: raw sparse keys give ~1 row/bucket)."""
    from gh_archive_clickhouse_spark.operators.packing import (
        densify_order,
    )

    n, group, budget = 300, 64, 16
    base = spark.range(n).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15),
               16, 10).cast("long").alias("k"),
        (F.col("id") % 7 + 1).alias("nt"),
    )
    dense = densify_order(base, "k")
    rows = sorted(
        (r.k, r.dense_id, r.nt) for r in dense.collect()
    )
    assert [d for _, d, _ in rows] == list(range(n))  # bijection + order
    coords = {
        r.dense_id: r
        for r in pack_coordinates(
            dense, F.col("nt"), budget=budget,
            order_col="dense_id", group_size=group,
        ).collect()
    }
    before = 0
    for k, d, nt in rows:
        r = coords[d]
        assert r.tokens_before == before
        assert r.seq_id == before // budget
        assert r.seq_offset == before % budget
        before += nt
    # dense keys restore the two-level scan's bucket bound
    n_buckets = dense.select(
        F.floor(F.col("dense_id") / group)
    ).distinct().count()
    assert n_buckets == -(-n // group)


def test_densify_deterministic_across_runs(spark):
    from gh_archive_clickhouse_spark.operators.packing import (
        densify_order,
    )

    base = spark.range(500).select(
        (F.col("id") * 999_983 % 1_000_003).alias("k")
    )
    a = sorted((r.k, r.dense_id) for r in densify_order(base, "k").collect())
    b = sorted((r.k, r.dense_id) for r in densify_order(base, "k").collect())
    assert a == b


def test_emit_packed_sequences_adds_no_window(spark):
    """Scale contract: emission is a pure map stage — the plan carries
    exactly pack_coordinates' two windows (bucket-partitioned per-row
    + bucket-totals), nothing new."""
    docs = read(spark, SF_DIR, "documents")
    from gh_archive_clickhouse_spark.operators.packing import (
        emit_packed_sequences,
    )

    coords = pack_coordinates(docs, F.lit(3), budget=8)
    base = coords._jdf.queryExecution().executedPlan().toString()
    out = emit_packed_sequences(coords, 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    def count(p: str, token: str) -> int:
        return sum(1 for ln in p.splitlines() if token in ln)

    assert count(plan, "Window [") == count(base, "Window [")
    # ... and no new shuffle either: explode + arithmetic only
    assert count(plan, "Exchange") == count(base, "Exchange")


def _emb(spark, rows):
    """(vec_id, label, embedding[4]) frame."""
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_neardup_hot_block_cap_keeps_volume_additive(spark):
    """The sum(block²) guard: inflate ONE block 10x past the cap and
    the candidate volume must stay additive — the hot block contributes
    ZERO pairs (excluded, to be subdivided upstream) while every
    under-cap block's pairs are untouched."""
    from gh_archive_clickhouse_spark.operators.similarity import (
        near_duplicate_pairs,
    )

    vec = [1.0, 0.0, 0.0, 0.0]
    cold = [
        (100 * b + i, f"cold{b}", vec) for b in range(3) for i in range(4)
    ]
    hot = [(1000 + i, "hot", vec) for i in range(100)]
    cap = 10

    base = near_duplicate_pairs(
        _emb(spark, cold), threshold=0.5, dim=4, max_block_size=cap
    ).collect()
    both = near_duplicate_pairs(
        _emb(spark, cold + hot), threshold=0.5, dim=4, max_block_size=cap
    ).collect()
    # cold blocks are all-identical vectors: 3 blocks x C(4,2) pairs
    assert len(base) == 3 * 6
    # adding a 100-row hot block (10x the cap) adds NOTHING: volume is
    # additive in blocks, never quadratic in the hottest one
    assert sorted((r.vec_a, r.vec_b) for r in both) == sorted(
        (r.vec_a, r.vec_b) for r in base
    )
    # cap lifted -> the hot block pairs quadratically (the defused cost)
    uncapped = near_duplicate_pairs(
        _emb(spark, cold + hot), threshold=0.5, dim=4, max_block_size=None
    ).collect()
    assert len(uncapped) == 3 * 6 + 100 * 99 // 2


def test_neardup_cap_validation(spark):
    from gh_archive_clickhouse_spark.operators.similarity import (
        near_duplicate_pairs,
    )

    with pytest.raises(ValueError, match="max_block_size"):
        near_duplicate_pairs(
            _emb(spark, [(1, "a", [1.0, 0.0, 0.0, 0.0])]),
            dim=4,
            max_block_size=0,
        )


def test_hot_blocks_reports_the_excluded_blocks(spark):
    """The companion detection surface for the cap: hot_blocks with
    the same cap names exactly the blocks near_duplicate_pairs
    skipped, with their sizes — so a caller can subdivide instead of
    silently losing pairs."""
    from gh_archive_clickhouse_spark.operators.similarity import hot_blocks

    vec = [1.0, 0.0, 0.0, 0.0]
    cold = [
        (100 * b + i, f"cold{b}", vec) for b in range(3) for i in range(4)
    ]
    hot = [(1000 + i, "hot", vec) for i in range(100)]
    got = hot_blocks(
        _emb(spark, cold + hot), max_block_size=10
    ).collect()
    assert [(r.label, r.block_size) for r in got] == [("hot", 100)]


def test_pq_adc_topk_rejects_multi_row_query(spark):
    """A multi-row (or empty) query frame is a caller bug — raise,
    never silently score an arbitrary row."""
    from gh_archive_clickhouse_spark.operators.similarity import (
        pq_adc_topk as adc,
    )

    emb = read(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb)
    enc = pq_encode(emb, m=8, dim=64, codebook=cb)
    two = emb.filter(F.col("vec_id") < 2).select(
        F.col("embedding").alias("q")
    )
    with pytest.raises(ValueError, match="exactly one row"):
        adc(enc, two, cb, m=8, dim=64)
    with pytest.raises(ValueError, match="exactly one row"):
        adc(enc, two.limit(0), cb, m=8, dim=64)


# ------------------------------------------------------ persisted IVFPQ


def test_ivfpq_index_probe_pruned_and_codes_only(spark, tmp_path):
    """The persisted IVF-PQ index probe: (1) the ADC scan is
    partition-pruned to the query's cluster AND reads only
    (vec_id, codes) — the float vectors stay on disk; (2) the exact
    re-rank agrees with brute-force cosine restricted to the probed
    cluster ∩ ADC shortlist."""
    import re

    from gh_archive_clickhouse_spark.operators.similarity import (
        build_ivfpq_index,
        pq_codebook,
        probe_ivfpq_index,
    )

    emb = read(spark, SF_DIR, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("c"),
    )
    cb = pq_codebook(emb)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, centroids, path, codebook=cb)

    idx = spark.read.parquet(path)
    qrow = emb.filter(F.col("vec_id") == 3).select(
        F.col("embedding").alias("q")
    )
    qc = idx.filter(F.col("vec_id") == 3).first().cluster_id
    probe = probe_ivfpq_index(spark, path, qrow, cb, cluster_ids=[qc], k=5)
    rows = probe.collect()
    assert rows and rows[0].vec_id == 3  # self is nearest
    assert abs(rows[0].cos_sim - 1.0) < 1e-6
    assert rows[0].adc_dist == 0.0  # codebook-exactness not required;
    # vec 3 < 16 IS a codebook vector, so its ADC self-distance is 0

    plan = probe._jdf.queryExecution().executedPlan().toString()
    # every index scan is partition-pruned on cluster_id
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    idx_scans = [f for f in pf if "cluster_id" in f]
    assert idx_scans, plan[:1500]
    # the ADC-side scan reads codes, never the float vec column
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    adc_schemas = [s for s in schemas if "codes" in s]
    assert adc_schemas and all("vec" not in s.split("codes")[1] for s in adc_schemas)
    assert any("vec:" not in s for s in adc_schemas), schemas


# ---------------------------------------------------- perceptual aHash


def test_perceptual_ahash_known_image(spark):
    """The aHash kernel against a hand-computed signature: encode a
    known 8x8 gradient PNG, decode through the real codec path, and
    check the mean-threshold bits exactly; identical pixel content
    must produce identical hashes across distinct payload rows."""
    import numpy as np
    import pandas as pd

    from gh_archive_clickhouse_spark.operators.multimodal import (
        perceptual_ahash,
    )
    from gh_archive_clickhouse_spark.operators.png_codec import encode_png

    px = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)  # 0..63
    payload = encode_png(px)
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [payload, payload]})
    df = spark.createDataFrame(pdf)
    rows = {r.doc_id: r.ahash for r in perceptual_ahash(df).collect()}
    # mean of 0..63 is 31.5 -> bits 0..31 are '0', 32..63 are '1'
    assert rows[1] == "0" * 32 + "1" * 32
    assert rows[1] == rows[2]


def test_emit_budget_mismatch_never_descends(spark):
    """Coordinates packed at one budget, emitted at another: the
    spanned-sequence range is derived from tokens_before (never from
    coords.seq_id), so the explode can never descend into
    negative-length slices — every emitted slice is positive and
    consistent with the EMISSION budget."""
    from gh_archive_clickhouse_spark.operators.packing import (
        emit_packed_sequences,
    )

    docs = _docs(spark, [(i, " ".join(["t"] * 10)) for i in range(40)])
    n_tok = F.size(F.array_remove(F.split(F.col("text"), " "), ""))
    coords = pack_coordinates(docs, n_tok, budget=128)
    rows = emit_packed_sequences(coords, 256).collect()
    assert rows
    for r in rows:
        assert r.slice_len > 0 and r.seq_pos >= 0 and r.slice_start >= 0
        # the slice's sequence follows the EMISSION budget (each doc
        # holds 10 tokens, so its global offset is doc_id * 10)
        assert r.seq_id == (r.doc_id * 10 + r.slice_start) // 256


def test_densify_validate_distinct(spark):
    from gh_archive_clickhouse_spark.operators.packing import (
        densify_order,
    )

    dup = spark.createDataFrame([(1,), (2,), (2,)], "k long")
    with pytest.raises(ValueError, match="distinct"):
        densify_order(dup, "k", validate_distinct=True)
    ok = densify_order(
        spark.createDataFrame([(5,), (3,)], "k long"),
        "k",
        validate_distinct=True,
    ).collect()
    assert sorted((r.k, r.dense_id) for r in ok) == [(3, 0), (5, 1)]


def test_long_gram_catches_boundary_straddling_span(spark):
    """The motivating case for the sliding-gram pass: a 25-token span
    copied at an offset that straddles the 16-token chunk boundary —
    passage_dup_stats (fixed chunks) sees ZERO duplicate chunks, the
    sliding 20-gram detector finds the pair with exactly
    25-20+1 = 6 shared windows."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        long_gram_overlap_pairs,
    )

    span = " ".join(f"s{i}" for i in range(25))
    # doc 1: span at offset 0; doc 2: span at offset 8 -> chunks of
    # doc 2 slice the span at tokens 8 and 24, matching none of doc
    # 1's chunks (offsets 0/16)
    docs = _docs(
        spark,
        [
            (1, span + " " + " ".join(f"a{i}" for i in range(10))),
            (2, " ".join(f"b{i}" for i in range(8)) + " " + span),
        ],
    )
    rows = passage_dup_stats(docs).collect()
    assert all(r.n_dup_chunks == 0 for r in rows)  # chunk pass blind
    pairs = long_gram_overlap_pairs(docs, gram=20).collect()
    assert len(pairs) == 1
    assert (pairs[0].doc_a, pairs[0].doc_b, pairs[0].shared_grams) == (
        1, 2, 6,
    )


def test_long_gram_df_cap_defuses_hot_window(spark):
    """A boilerplate 20-token window shared by > max_df docs creates
    no pairs (stop-gram guard, same policy as containment's)."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        long_gram_overlap_pairs,
    )

    boiler = " ".join(f"w{i}" for i in range(20))
    docs = _docs(spark, [(i, f"u{i} {boiler}") for i in range(12)])
    assert long_gram_overlap_pairs(docs, gram=20, max_df=10).collect() == []
    quad = long_gram_overlap_pairs(docs, gram=20, max_df=20).collect()
    assert len(quad) == 12 * 11 / 2


def test_long_gram_two_lazy_calls_no_clobber(spark, tmp_path, monkeypatch):
    """Two lazily-composed operator calls under
    SPARK_GRAFT_MATERIALIZE_DIR must not overwrite each other's scratch
    index (per-call-unique names): collecting BOTH only after both are
    built must still honor each call's own df cap."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        long_gram_overlap_pairs,
    )

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_DIR", str(tmp_path))
    boiler = " ".join(f"w{i}" for i in range(20))
    docs = _docs(spark, [(i, f"u{i} {boiler}") for i in range(12)])
    capped = long_gram_overlap_pairs(docs, gram=20, max_df=10)
    uncapped = long_gram_overlap_pairs(docs, gram=20, max_df=20)
    # consume only AFTER both pipelines were constructed+materialized
    assert len(uncapped.collect()) == 12 * 11 / 2
    assert capped.collect() == []


# ------------------------------------------------------ budget select


def test_budget_select_matches_naive_window(spark):
    """Distributed two-level greedy fill == the naive global running
    sum, including the boundary row (selected iff strictly-better
    weight < budget, even when it overflows)."""
    from gh_archive_clickhouse_spark.operators.packing import budget_select

    rows = [(i, (i * 37) % 11 + 1, float((i * 7) % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long, score double")
    got = {
        r.doc_id: r.tokens_before
        for r in budget_select(
            df, "w", 300,
            [F.col("score").desc(), F.col("doc_id").asc()],
        ).collect()
    }
    order = sorted(rows, key=lambda r: (-r[2], r[0]))
    expect, acc = {}, 0
    for doc_id, w, _ in order:
        if acc < 300:
            expect[doc_id] = acc
        acc += w
    assert got == expect
    # boundary row overflows but is kept (greedy fill contract)
    last = max(expect, key=lambda d: expect[d])
    assert expect[last] < 300


def test_seeded_shuffle_invariant_to_input_partitioning(spark):
    """The permutation is a pure function of (id, seed): any input
    partitioning/ordering yields the identical positions, a different
    seed yields a different (but complete) permutation."""
    from gh_archive_clickhouse_spark.operators.packing import (
        seeded_shuffle,
    )

    docs = read(spark, SF_DIR, "documents").select("doc_id")
    base = {
        r.doc_id: r.shuffle_pos
        for r in seeded_shuffle(docs).collect()
    }
    n = len(base)
    assert sorted(base.values()) == list(range(n))  # a true permutation
    for variant in (
        docs.repartition(37),
        docs.repartition(1),
        docs.orderBy(F.desc("doc_id")),
    ):
        got = {
            r.doc_id: r.shuffle_pos
            for r in seeded_shuffle(variant).collect()
        }
        assert got == base
    reseeded = {
        r.doc_id: r.shuffle_pos
        for r in seeded_shuffle(docs, seed="shuffle-v2").collect()
    }
    assert sorted(reseeded.values()) == list(range(n))
    assert reseeded != base
    # duplicated ids make positions ambiguous — opt-in validation
    # turns that into a raise instead of silent non-determinism, and
    # the error names the OFFENDING ID (not the internal hash key the
    # rank pass orders by — useless for finding the row)
    dup = spark.createDataFrame([(1,), (1,), (2,)], "doc_id long")
    with pytest.raises(ValueError, match="duplicate id 1") as exc:
        seeded_shuffle(dup, validate_distinct=True).collect()
    assert "doc_id" in str(exc.value)
    assert "__shuffle_key" not in str(exc.value)


def test_seeded_shuffle_no_global_window(spark):
    """Plan contract: no unpartitioned row_number over the corpus —
    the only unpartitioned window runs over per-partition COUNTS."""
    import re

    from gh_archive_clickhouse_spark.operators.packing import (
        seeded_shuffle,
    )

    docs = read(spark, SF_DIR, "documents").select("doc_id")
    plan = (
        seeded_shuffle(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"windowspecdefinition\(__pid#\d+", plan), plan[:3000]
    unpartitioned = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln
        and not re.search(r"windowspecdefinition\(__pid#\d+,", ln)
    ]
    for ln in unpartitioned:
        assert "__pn" in ln or "__poff" in ln, ln


def test_budget_select_rejects_invalid_weights(spark):
    """Negative or NULL weights break the greedy-prefix contract
    (tokens_before goes non-monotone), so they RAISE at execution
    instead of silently mis-selecting; valid inputs are untouched."""
    from gh_archive_clickhouse_spark.operators.packing import budget_select

    order = [F.col("doc_id").asc()]
    neg = spark.createDataFrame(
        [(1, 5), (2, -3)], "doc_id long, w long"
    )
    with pytest.raises(Exception, match="non-negative"):
        budget_select(neg, "w", 100, order).collect()
    nul = spark.createDataFrame(
        [(1, 5), (2, None)], "doc_id long, w long"
    )
    with pytest.raises(Exception, match="non-negative"):
        budget_select(nul, "w", 100, order).collect()
    ok = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 7)], "doc_id long, w long"
    )
    got = {
        r.doc_id: r.tokens_before
        for r in budget_select(ok, "w", 6, order).collect()
    }
    assert got == {1: 0, 2: 5, 3: 5}


def test_budget_select_assert_not_pushed_into_caller_plan(spark):
    """The weight-contract assert runs on the frame the CALLER handed
    in, never below the caller's own joins: a deterministic filter on
    the raw input would be pushed under an upstream join and raise on
    rows that join ELIMINATES. Here every row of df has a valid
    weight (the inner join drops the orphan NULL-weight row), so the
    selection must succeed."""
    from gh_archive_clickhouse_spark.operators.packing import budget_select

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    weights = spark.createDataFrame(
        [(1, 5), (2, 7), (99, None)], "doc_id long, w long"
    )
    df = docs.join(weights, "doc_id")
    got = {
        r.doc_id: r.tokens_before
        for r in budget_select(
            df, "w", 100, [F.col("doc_id").asc()]
        ).collect()
    }
    assert got == {1: 0, 2: 5}


def test_budget_select_no_global_window_over_rows(spark):
    """The scale contract: the only unpartitioned window runs over
    the PER-PARTITION TOTALS, never the raw rows; offsets come back
    via broadcast."""
    import re

    from gh_archive_clickhouse_spark.operators.packing import budget_select

    docs = read(spark, SF_DIR, "documents")
    df = budget_select(
        docs.select("doc_id", F.lit(1).alias("w")),
        "w",
        100,
        [F.col("doc_id").asc()],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-row running sum: PARTITIONED by __pid
    assert re.search(r"windowspecdefinition\(__pid#\d+", plan), plan[:3000]
    unpartitioned = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln
        and not re.search(r"windowspecdefinition\(__pid#\d+,", ln)
    ]
    assert len(unpartitioned) == 1 and "__pw" in unpartitioned[0], (
        unpartitioned
    )
    assert "BroadcastExchange" in plan


def test_budget_select_validates_budget(spark):
    import pytest as _pytest

    from gh_archive_clickhouse_spark.operators.packing import budget_select

    df = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    with _pytest.raises(ValueError, match="budget"):
        budget_select(df, "w", 0, [F.col("doc_id")])


def test_neardup_subdivision_recovers_hot_block_pairs(spark):
    """The cap's production closure: a hot block's pairs are NOT lost
    — its members re-bucket by SRP and pair within (block, bucket);
    a degenerate sub-block still over the cap stays excluded."""
    from gh_archive_clickhouse_spark.operators.similarity import (
        near_duplicate_pairs,
        near_duplicate_pairs_subdivided,
    )

    e1, e2 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    planes = [[1, -1, 1, -1]]  # e1 -> bucket 1, e2 -> bucket 0
    cold = [(100 + i, "cold", e1) for i in range(4)]
    hot = [(200 + i, "hot", e1) for i in range(8)] + [
        (300 + i, "hot", e2) for i in range(8)
    ]
    df = _emb(spark, cold + hot)  # "hot" has 16 rows, cap is 10

    base = near_duplicate_pairs(
        df, threshold=0.5, dim=4, max_block_size=10
    ).collect()
    assert len(base) == 6  # cold only: C(4,2); hot block dropped

    sub = near_duplicate_pairs_subdivided(
        df, planes, threshold=0.5, dim=4, max_block_size=10
    ).collect()
    pairs = {(r.vec_a, r.vec_b) for r in sub}
    # cold pairs intact + each hot direction pairs within its bucket
    assert len(pairs) == 6 + 28 + 28
    assert (200, 201) in pairs and (300, 301) in pairs
    # no cross-direction pair leaked (different SRP buckets)
    assert not any(a < 300 <= b for a, b in pairs if a >= 200)

    # a degenerate sub-block that still exceeds the cap stays excluded
    degen = [(400 + i, "degen", e1) for i in range(30)]
    out = near_duplicate_pairs_subdivided(
        _emb(spark, cold + degen), planes,
        threshold=0.5, dim=4, max_block_size=10,
    ).collect()
    assert len(out) == 6  # cold pairs only
    assert all(r.vec_a < 200 and r.vec_b < 200 for r in out)


# ------------------------------------------------- training shards


def test_shard_assignments_balanced_contiguous_invariant(spark):
    """Dense positions 0..N-1 over n shards: sizes balanced within
    one row, each shard a contiguous position range in shard order,
    and the assignment identical under a different input
    partitioning (it depends only on pos and the broadcast total)."""
    from gh_archive_clickhouse_spark.operators.packing import (
        shard_assignments,
    )

    n, shards = 23, 4
    df = spark.createDataFrame(
        [(i * 7 % 1000, i) for i in range(n)], "doc_id long, pos long"
    )
    got = {
        r.pos: r.shard
        for r in shard_assignments(df, shards, pos_col="pos").collect()
    }
    sizes = [sum(1 for s in got.values() if s == k) for k in range(shards)]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1
    # contiguity: positions of shard k all precede positions of k+1
    assert [got[p] for p in sorted(got)] == sorted(
        got[p] for p in sorted(got)
    )
    again = {
        r.pos: r.shard
        for r in shard_assignments(
            df.repartition(7), shards, pos_col="pos"
        ).collect()
    }
    assert again == got


def test_shard_assignments_rejects_non_dense_positions(spark):
    """A gapped / non-zero-based position column (raw ids, filtered
    positions) must raise loudly, not produce skewed shards — and the
    check must survive column pruning (it gates the assignment
    expression itself)."""
    from gh_archive_clickhouse_spark.operators.packing import (
        shard_assignments,
    )

    df = spark.createDataFrame(
        [(1,), (2,), (5,)], "pos long"  # not dense, not 0-based
    )
    with pytest.raises(Exception, match="dense 0-based"):
        shard_assignments(df, 2, pos_col="pos").collect()
    # even when only non-position columns are consumed downstream
    df2 = spark.createDataFrame([(10, 3)], "doc_id long, pos long")
    with pytest.raises(Exception, match="dense 0-based"):
        shard_assignments(df2, 2, pos_col="pos").select("shard").collect()


def test_write_training_shards_roundtrip_and_manifest(spark, tmp_path):
    """The written shards tile the corpus exactly (no loss, no
    duplication), each shard directory holds one contiguous order
    range, and the read-back manifest's counts and fingerprints match
    an independent recomputation from the INPUT frame."""
    import json

    from gh_archive_clickhouse_spark.functions.hashing import md5_long
    from gh_archive_clickhouse_spark.operators.packing import (
        seeded_shuffle,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(37)],
        "doc_id long, text string",
    )
    ordered = seeded_shuffle(docs, "doc_id", seed="shard-test")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        ordered, path, n_shards=5, pos_col="shuffle_pos"
    )
    assert [m["shard"] for m in manifest] == [0, 1, 2, 3, 4]
    assert sum(m["n_rows"] for m in manifest) == 37
    assert max(m["n_rows"] for m in manifest) - min(
        m["n_rows"] for m in manifest
    ) <= 1
    on_disk = json.loads((tmp_path / "shards" / "_manifest.json").read_text())
    assert on_disk["shards"] == manifest
    back = spark.read.parquet(path)
    assert back.count() == 37
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(
        range(37)
    )
    # contiguity on disk: shard id is monotone in shuffle position
    rows = back.select("shuffle_pos", "shard").orderBy("shuffle_pos").collect()
    assert [r.shard for r in rows] == sorted(r.shard for r in rows)
    # fingerprints: recompute from the input side, same row hash
    data_cols = sorted(c for c in back.columns if c != "shard")
    from gh_archive_clickhouse_spark.operators.packing import (
        shard_assignments,
    )

    expect = {
        r.shard: (r.n, r.fp)
        for r in shard_assignments(ordered, 5, pos_col="shuffle_pos")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                md5_long(F.to_json(F.struct(*[F.col(c) for c in data_cols])))
            ).alias("fp"),
        )
        .collect()
    }
    assert {
        m["shard"]: (m["n_rows"], m["fingerprint"]) for m in manifest
    } == expect


def test_write_training_shards_empty_corpus_and_mode_protection(
    spark, tmp_path
):
    """Zero rows go through the same parquet writer (mode semantics
    apply identically) and the manifest lists every shard id with
    zero rows — a missing directory is always distinguishable from a
    legitimately empty shard. A second write with the default
    mode='error' must fail WITHOUT touching the existing manifest."""
    import json

    import pytest as _pytest

    from gh_archive_clickhouse_spark.operators.packing import (
        write_training_shards,
    )

    empty = spark.createDataFrame([], "doc_id long, shuffle_pos long")
    path = str(tmp_path / "none")
    got = write_training_shards(empty, path, n_shards=3)
    assert got == [
        {"shard": k, "n_rows": 0, "fingerprint": 0} for k in range(3)
    ]
    on_disk = json.loads((tmp_path / "none" / "_manifest.json").read_text())
    assert on_disk == {"n_shards": 3, "shards": got}
    # mode="error" on an existing path: the writer refuses, and the
    # committed manifest stays exactly as it was
    full = spark.createDataFrame([(1, 0)], "doc_id long, shuffle_pos long")
    with _pytest.raises(Exception):
        write_training_shards(full, path, n_shards=3)
    assert (
        json.loads((tmp_path / "none" / "_manifest.json").read_text())
        == on_disk
    )


def test_shard_assignments_rejects_duplicates_and_nulls(spark):
    """Duplicate positions (a fan-out join) or NULLs must raise: min/
    max alone would pass [0, 0, 2] and silently double shard 0 while
    emptying shard 1."""
    from gh_archive_clickhouse_spark.operators.packing import (
        shard_assignments,
    )

    dup = spark.createDataFrame([(0,), (0,), (2,)], "pos long")
    with pytest.raises(ValueError, match="dense 0-based"):
        shard_assignments(dup, 3, pos_col="pos")
    withnull = spark.createDataFrame(
        [(0,), (None,), (2,)], "pos long"
    )
    with pytest.raises(ValueError, match="dense 0-based"):
        shard_assignments(withnull, 3, pos_col="pos")


def test_shard_assignments_randomized_properties(spark):
    """Random corpus sizes and shard counts: the contiguous-range
    assignment must always tile (every row exactly one shard), keep
    sizes within one row of each other, stay monotone in position,
    and equal the pure-Python formula row for row."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gh_archive_clickhouse_spark.operators.packing import (
        shard_assignments,
    )

    @given(
        n=st.integers(min_value=1, max_value=60),
        shards=st.integers(min_value=1, max_value=9),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(n, shards):
        df = spark.createDataFrame(
            [(i,) for i in range(n)], "pos long"
        )
        got = {
            r.pos: r.shard
            for r in shard_assignments(df, shards, pos_col="pos").collect()
        }
        assert got == {p: p * shards // n for p in range(n)}
        sizes = [
            sum(1 for s in got.values() if s == k) for k in range(shards)
        ]
        assert sum(sizes) == n
        assert max(sizes) - min(sizes) <= 1

    run()


def test_shard_assignment_adds_no_exchange_over_the_order(spark):
    """Plan contract: the shard id is pure arithmetic on the position
    — assigning shards on top of the seeded order must add ZERO
    exchanges (no join, no window, no re-shuffle) beyond what the
    order computation already did."""
    from gh_archive_clickhouse_spark.operators.packing import (
        seeded_shuffle,
        shard_assignments,
    )

    ordered = seeded_shuffle(
        read(spark, SF_DIR, "documents").select("doc_id")
    )
    base = (
        ordered._jdf.queryExecution().executedPlan().toString()
    ).count("Exchange")
    with_shards = (
        shard_assignments(ordered, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert with_shards.count("Exchange") == base, with_shards[:3000]
    # the assignment itself shows up as plain arithmetic, not a join
    assert " DIV " in with_shards or "div" in with_shards.lower()


# ---------------------------------------------------- mixture_resample


def _mix_docs(spark, rows):
    """rows: list of (doc_id, source)."""
    return spark.createDataFrame(
        [(i, s) for i, s in rows], "doc_id long, source string"
    )


def test_mixture_resample_validates_weights(spark):
    """The weights spec is validated eagerly: negative / NULL weights,
    duplicate source rows, a missing weight_ppm column, and an
    out-of-range budget all raise BEFORE any corpus work."""
    from gh_archive_clickhouse_spark.operators.packing import (
        mixture_resample,
    )

    docs = _mix_docs(spark, [(1, "a"), (2, "b")])
    ok = spark.createDataFrame(
        [("a", 500_000), ("b", 500_000)], "source string, weight_ppm long"
    )
    with pytest.raises(ValueError, match="ppm shares"):
        mixture_resample(
            docs,
            spark.createDataFrame(
                [("a", -1)], "source string, weight_ppm long"
            ),
        )
    with pytest.raises(ValueError, match="ppm shares"):
        mixture_resample(
            docs,
            spark.createDataFrame(
                [("a", None)], "source string, weight_ppm long"
            ),
        )
    # > 10^6 voids the documented overflow bound — eager raise, not
    # an ANSI overflow mid-job
    with pytest.raises(ValueError, match="ppm shares"):
        mixture_resample(
            docs,
            spark.createDataFrame(
                [("a", 10**13)], "source string, weight_ppm long"
            ),
        )
    with pytest.raises(ValueError, match="one row per"):
        mixture_resample(
            docs,
            spark.createDataFrame(
                [("a", 1), ("a", 2)], "source string, weight_ppm long"
            ),
        )
    with pytest.raises(ValueError, match="weight_ppm column"):
        mixture_resample(
            docs,
            spark.createDataFrame([("a", 1)], "source string, w long"),
        )
    with pytest.raises(ValueError, match="budget_ppm"):
        mixture_resample(docs, ok, budget_ppm=0)
    with pytest.raises(ValueError, match="budget_ppm"):
        mixture_resample(docs, ok, budget_ppm=2_000_000)
    # A NULL source is a dead spec entry (NULL never equi-joins) —
    # eager raise, mirroring ranked_source_weights.
    with pytest.raises(ValueError, match="NULL source"):
        mixture_resample(
            docs,
            spark.createDataFrame(
                [(None, 500_000), ("a", 500_000)],
                "source string, weight_ppm long",
            ),
        )


def test_mixture_rates_int_typed_weights_no_overflow(spark):
    """An INT-typed weight_ppm column must not overflow: 10^6 *
    weight_ppm as INT*INT wraps 2^31 for perfectly valid ppm values
    (e.g. 500000) — the rate expression casts to BIGINT itself, so
    external callers who build the spec with int32 get the same rates
    as the in-repo long-typed path."""
    from gh_archive_clickhouse_spark.operators.packing import (
        mixture_rates,
    )

    docs = _mix_docs(spark, [(i, "a") for i in range(10)])
    int_weights = spark.createDataFrame(
        [("a", 500_000)], "source string, weight_ppm int"
    )
    long_weights = spark.createDataFrame(
        [("a", 500_000)], "source string, weight_ppm long"
    )
    got_int = {
        r["source"]: r["rate_ppm"]
        for r in mixture_rates(docs, int_weights).collect()
    }
    got_long = {
        r["source"]: r["rate_ppm"]
        for r in mixture_rates(docs, long_weights).collect()
    }
    assert got_int == got_long == {"a": 500_000}


def test_mixture_resample_weights_semantics(spark):
    """Sources absent from the spec are dropped; an over-subscribed
    source hits the least() cap and keeps every row; a zero-weight
    source keeps none; the rate witness matches the integer formula."""
    from gh_archive_clickhouse_spark.operators.packing import (
        PPM,
        mixture_resample,
    )

    # 40 docs in a, 4 in b, 6 in c (c not in the spec).
    rows = (
        [(i, "a") for i in range(40)]
        + [(100 + i, "b") for i in range(4)]
        + [(200 + i, "c") for i in range(6)]
    )
    docs = _mix_docs(spark, rows)
    weights = spark.createDataFrame(
        [("a", 200_000), ("b", 400_000), ("z", 400_000)],
        "source string, weight_ppm long",
    )
    kept = mixture_resample(docs, weights, budget_ppm=1_000_000).collect()
    n_total = len(rows)
    rate_a = min(PPM, (1_000_000 * 200_000 // PPM) * n_total // 40)
    rate_b = min(PPM, (1_000_000 * 400_000 // PPM) * n_total // 4)
    assert rate_b == PPM  # target 20 docs from a 4-doc source: capped
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
        assert r.rate_ppm == {"a": rate_a, "b": rate_b}[r.source]
    # c has no spec row -> dropped entirely; z has no corpus rows
    assert set(by_src) <= {"a", "b"}
    # capped source keeps everything
    assert len(by_src.get("b", [])) == 4
    # zero-weight source keeps nothing
    zero = mixture_resample(
        docs,
        spark.createDataFrame(
            [("a", 0)], "source string, weight_ppm long"
        ),
    ).collect()
    assert zero == []
    # re-gating output that still carries the rate_ppm witness raises
    # eagerly instead of an ambiguous-column plan error
    gated = mixture_resample(docs, weights)
    with pytest.raises(ValueError, match="rate_ppm"):
        mixture_resample(gated, weights)
    mixture_resample(gated.drop("rate_ppm"), weights)  # the remedy


def test_packed_sequence_shards_add_no_exchange(spark):
    """qx62 plan contract: sharding the PACKED-SEQUENCE order adds
    zero exchanges over qx45 + the seeded shuffle — the shard id is
    pure arithmetic on the already-computed position (the qx61
    contract, one level up the composition)."""
    from gh_archive_clickhouse_spark.operators.packing import (
        seeded_shuffle,
        shard_assignments,
    )
    from gh_archive_clickhouse_spark.plans.ext_queries import (
        qx45_packed_sequences,
    )

    ordered = seeded_shuffle(
        qx45_packed_sequences(spark, SF_DIR), id_col="seq_id"
    )
    base = (
        ordered._jdf.queryExecution().executedPlan().toString()
    ).count("Exchange")
    sharded = (
        shard_assignments(ordered, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert sharded.count("Exchange") == base, sharded[:3000]


def test_write_training_shards_over_packed_sequences(spark, tmp_path):
    """The on-disk form of qx62: write_training_shards over the
    seeded-shuffled packed frame produces contiguous-order shards
    whose union is exactly the sequence set, manifest counts
    included."""
    from gh_archive_clickhouse_spark.operators.packing import (
        seeded_shuffle,
        shard_assignments,
        write_training_shards,
    )
    from gh_archive_clickhouse_spark.plans.ext_queries import (
        qx45_packed_sequences,
    )

    seqs = qx45_packed_sequences(spark, SF_DIR)
    ordered = seeded_shuffle(seqs, id_col="seq_id").localCheckpoint()
    n = ordered.count()
    path = str(tmp_path / "seq_shards")
    manifest = write_training_shards(ordered, path, 3)
    assert [m["shard"] for m in manifest] == [0, 1, 2]
    assert sum(m["n_rows"] for m in manifest) == n
    back = spark.read.parquet(path)
    # every shard holds one contiguous run of the shuffle order
    rows = back.select("shard", "shuffle_pos").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shuffle_pos)
    edges = sorted(
        (min(v), max(v), k, len(v)) for k, v in by_shard.items()
    )
    cursor = 0
    for lo, hi, _k, cnt in edges:
        assert lo == cursor and hi == cursor + cnt - 1
        cursor += cnt
    assert cursor == n
    # content fingerprints survive the round trip
    want = {
        (r.seq_id, r.content_md5)
        for r in ordered.select("seq_id", "content_md5").collect()
    }
    got = {
        (r.seq_id, r.content_md5)
        for r in back.select("seq_id", "content_md5").collect()
    }
    assert got == want
    # the matching pure assignment agrees with what landed on disk
    assigned = {
        r.seq_id: r.shard
        for r in shard_assignments(ordered, 3).collect()
    }
    landed = {
        r.seq_id: r.shard
        for r in back.select("seq_id", "shard").collect()
    }
    assert landed == assigned


def test_verify_training_shards_roundtrip_and_tamper(spark, tmp_path):
    """The consumer-side integrity check: a fresh write verifies
    clean; losing a data file, editing a manifest count or
    fingerprint, or an on-disk shard the manifest doesn't know each
    raise naming the shard; an all-empty tree verifies."""
    import json
    import os
    import shutil

    from gh_archive_clickhouse_spark.operators.packing import (
        verify_training_shards,
        write_training_shards,
    )

    df = spark.range(0, 60).select(
        F.col("id").alias("doc_id"), F.col("id").alias("shuffle_pos")
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, 3)
    verified = verify_training_shards(spark, path)
    assert verified == manifest

    # 1) extra on-disk shard the manifest doesn't know
    src_dir = os.path.join(path, "shard=0")
    extra_dir = os.path.join(path, "shard=7")
    shutil.copytree(src_dir, extra_dir)
    with pytest.raises(ValueError, match="shard 7.*not in"):
        verify_training_shards(spark, path)
    shutil.rmtree(extra_dir)
    verify_training_shards(spark, path)  # clean again

    # 2) data loss: drop shard 1's files -> count mismatch
    backup = str(tmp_path / "backup_shard1")
    shutil.move(os.path.join(path, "shard=1"), backup)
    with pytest.raises(ValueError, match="shard 1: manifest n_rows"):
        verify_training_shards(spark, path)
    shutil.move(backup, os.path.join(path, "shard=1"))

    # 3) fingerprint tamper in the manifest
    mpath = os.path.join(path, "_manifest.json")
    m = json.load(open(mpath))
    m["shards"][2]["fingerprint"] ^= 1
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="shard 2: content fingerprint"):
        verify_training_shards(spark, path)
    m["shards"][2]["fingerprint"] ^= 1
    json.dump(m, open(mpath, "w"))

    # 3b) duplicate manifest entries are malformed, not last-wins
    m = json.load(open(mpath))
    m["shards"].append(dict(m["shards"][2]))
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="malformed"):
        verify_training_shards(spark, path)
    m["shards"].pop()
    json.dump(m, open(mpath, "w"))

    # 3c) a manifest row missing a field is malformed, never a KeyError
    m = json.load(open(mpath))
    saved = m["shards"][1].pop("fingerprint")
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="malformed"):
        verify_training_shards(spark, path)
    m["shards"][1]["fingerprint"] = saved
    json.dump(m, open(mpath, "w"))

    # 3d) TOTAL data loss (no parquet anywhere) is still the
    # documented ValueError naming the counts, not an AnalysisException
    lost = str(tmp_path / "all_lost")
    shutil.copytree(path, lost)
    for k in range(3):
        shutil.rmtree(os.path.join(lost, f"shard={k}"))
    with pytest.raises(ValueError, match="manifest n_rows"):
        verify_training_shards(spark, lost)

    # 3e) a tampered n_shards must fail FAST as malformed — a
    # manifest declaring n_shards=10^12 must not allocate a 10^12
    # range list in the verifier whose job is to fail cleanly.
    m = json.load(open(mpath))
    saved_n = m["n_shards"]
    m["n_shards"] = 10**12
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="exactly once"):
        verify_training_shards(spark, path)
    m["n_shards"] = saved_n
    json.dump(m, open(mpath, "w"))
    verify_training_shards(spark, path)  # clean again

    # 4) malformed / missing manifest
    os.remove(mpath)
    with pytest.raises(ValueError, match="unreadable or malformed"):
        verify_training_shards(spark, path)

    # 5) all-empty corpus round trip
    empty = df.filter("doc_id < 0")
    epath = str(tmp_path / "empty_shards")
    write_training_shards(empty, epath, 2)
    assert verify_training_shards(spark, epath) == [
        {"shard": 0, "n_rows": 0, "fingerprint": 0},
        {"shard": 1, "n_rows": 0, "fingerprint": 0},
    ]


def test_mixture_gate_broadcasts_rates_no_corpus_shuffle(spark):
    """qs14's per-micro-batch hot path: the gate must broadcast the
    rate table and keep the corpus side map-only — no hash exchange,
    no sort-merge join (a firehose batch must never shuffle to learn
    its fate)."""
    from gh_archive_clickhouse_spark.operators.packing import (
        mixture_gate,
    )

    docs = read(spark, SF_DIR, "documents")
    rates = spark.createDataFrame(
        [(f"src{i}", 500_000) for i in range(20)],
        "source string, rate_ppm long",
    )
    plan = (
        mixture_gate(docs, rates)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning" not in plan, plan[:3000]


def test_ranked_weights_null_source_and_gate_case_guard(spark):
    """ranked_source_weights raises on a NULL source (unattributed
    rows would silently skew every real source's weight); the gate's
    witness-column guard is case-insensitive (Spark resolution is)."""
    from gh_archive_clickhouse_spark.operators.packing import (
        mixture_gate,
    )
    from gh_archive_clickhouse_spark.plans.ext_queries import (
        ranked_source_weights,
    )

    with_null = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="NULL"):
        ranked_source_weights(with_null)

    rates = spark.createDataFrame(
        [("a", 500_000)], "source string, rate_ppm long"
    )
    cased = spark.createDataFrame(
        [(1, "a", 7)], "doc_id long, source string, Rate_PPM long"
    )
    with pytest.raises(ValueError, match="rate_ppm"):
        mixture_gate(cased, rates)


def test_mixture_resample_empty_weights_and_empty_corpus(spark):
    """Edge semantics pinned: an empty spec keeps nothing (the spec
    defines the mixture); an empty corpus returns empty regardless of
    spec (rates all floor to whatever, no rows to keep) — neither
    raises."""
    from gh_archive_clickhouse_spark.operators.packing import (
        mixture_resample,
    )

    docs = _mix_docs(spark, [(1, "a"), (2, "b")])
    empty_spec = spark.createDataFrame(
        [], "source string, weight_ppm long"
    )
    assert mixture_resample(docs, empty_spec).collect() == []
    spec = spark.createDataFrame(
        [("a", 500_000)], "source string, weight_ppm long"
    )
    empty_corpus = docs.filter("doc_id < 0")
    assert mixture_resample(empty_corpus, spec).collect() == []
