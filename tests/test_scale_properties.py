"""Scale-evidence properties for the dedup/ANN surface (SURVEY §4.3).

A 10×-inflated corpus with seed-deterministic PLANTED near-dup
families provides the evidence the 100 TB mandate asks for: candidate
volume must track TRUE near-dups (additively), never the corpus size
quadratically; LSH buckets must stay bounded; and no operator plan may
degenerate into a cartesian / broadcast-nested-loop join when the
input grows.

Corpus construction (pure column expressions, fully deterministic):
every base doc spawns 10 variants. Variant 0 keeps the original text;
for family docs (doc_id % 5 == 0) variants 1-2 append one distinct
token (word-3-shingle Jaccard ≈ (K-2)/K ≈ 0.95 — guaranteed LSH
catches); every other variant gets filler from a doc/variant-strided
integer token range, so no two filler docs share a single shingle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.dedup import (
    _banded,
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    simhash_candidate_pairs,
)
from gh_archive_clickhouse_spark.plans.common import read
from tests.conftest import SF_DIR

N_VARIANTS = 10
FAMILY_MOD = 5  # doc_id % 5 == 0 → near-dup family of {0, 1, 2}


def _inflated(spark):
    docs = read(spark, SF_DIR, "documents").select("doc_id", "text")
    fam = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0), F.lit(N_VARIANTS - 1))
        ).alias("v"),
    )
    is_near_dup = (F.col("doc_id") % FAMILY_MOD == 0) & F.col("v").isin(1, 2)
    # filler token values strided per (doc, variant): ranges can never
    # overlap, so fillers share no shingles with anything
    filler = F.concat_ws(
        " ",
        F.array(
            *[
                F.concat(
                    F.lit("u"),
                    (
                        F.col("doc_id") * 1000 + F.col("v") * 100 + F.lit(i)
                    ).cast("string"),
                )
                for i in range(12)
            ]
        ),
    )
    text = (
        F.when(F.col("v") == 0, F.col("text"))
        .when(
            is_near_dup,
            F.concat(F.col("text"), F.lit(" tail"), F.col("v").cast("string")),
        )
        .otherwise(filler)
    )
    return fam.select(
        (F.col("doc_id") * N_VARIANTS + F.col("v")).alias("doc_id"),
        text.alias("text"),
    )


def _family(doc_id: int) -> int:
    return doc_id // N_VARIANTS


def _is_family_doc(doc_id: int) -> bool:
    return _family(doc_id) % FAMILY_MOD == 0 and doc_id % N_VARIANTS <= 2


def test_lsh_candidate_volume_tracks_true_neardups(spark):
    """10× the corpus must cost ~(planted pairs) extra candidates —
    additive growth, not the ~45× a quadratic blow-up would give —
    and the planted families must actually be found."""
    base_pairs = lsh_candidate_pairs(
        minhash_signatures(read(spark, SF_DIR, "documents"))
    ).count()

    inflated = _inflated(spark)
    pairs = lsh_candidate_pairs(minhash_signatures(inflated)).collect()

    n_families = read(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % FAMILY_MOD == 0
    ).count()
    # each family plants ≤ C(3,2)=3 true pairs
    planted_max = n_families * 3
    assert len(pairs) <= base_pairs + planted_max + 50, (
        len(pairs), base_pairs, planted_max,
    )

    found_fams = {
        _family(r.doc_a)
        for r in pairs
        if _family(r.doc_a) == _family(r.doc_b)
        and _is_family_doc(r.doc_a)
        and _is_family_doc(r.doc_b)
    }
    assert len(found_fams) >= int(n_families * 0.9), len(found_fams)


def test_lsh_bucket_volume_stays_bounded(spark):
    """No bucket blow-up on the inflated corpus: the largest LSH band
    bucket stays family-sized — the property that keeps the bucket
    join linear at 100 TB (the sentinel exclusion already defuses the
    empty-doc bucket; this pins the rest)."""
    sigs = minhash_signatures(_inflated(spark))
    biggest = (
        _banded(sigs, "doc_id", 4, 4)
        .groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()
        .mx
    )
    assert biggest <= 12, biggest


def test_dedup_plans_never_go_quadratic(spark):
    """Physical plans of the dedup operators over the inflated corpus:
    equi-joins only — no CartesianProduct, no BroadcastNestedLoopJoin
    (either would be a scale-killer the moment the corpus grows)."""
    inflated = _inflated(spark)
    plans = {
        "lsh": lsh_candidate_pairs(minhash_signatures(inflated)),
        "simhash": simhash_candidate_pairs(simhash(inflated)),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_simhash_candidates_ignore_the_inflation(spark):
    """SimHash banding on the inflated corpus: the 7×-volume filler
    contributes ZERO candidate pairs (no shared tokens → Hamming ≫ 3),
    so candidate volume is a function of TRUE near-dup structure only
    — the original-vs-original pair set is bit-identical to the base
    corpus's, and every emitted pair touches only real-text docs
    (originals or planted variants)."""
    base = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(
            simhash(read(spark, SF_DIR, "documents"))
        ).collect()
    }
    inflated_pairs = simhash_candidate_pairs(
        simhash(_inflated(spark))
    ).collect()

    def real_text(doc_id: int) -> bool:
        return doc_id % N_VARIANTS == 0 or _is_family_doc(doc_id)

    assert all(
        real_text(r.doc_a) and real_text(r.doc_b) for r in inflated_pairs
    )
    originals = {
        (r.doc_a // N_VARIANTS, r.doc_b // N_VARIANTS)
        for r in inflated_pairs
        if r.doc_a % N_VARIANTS == 0 and r.doc_b % N_VARIANTS == 0
    }
    assert originals == base and base


def test_planted_families_collapse_to_one_cluster_each(spark):
    """qx26 shape at 10× volume: connected components over the planted
    intra-family pairs elect exactly ONE canonical doc per family (the
    min id), with pointer-jumping convergence well inside the budget."""
    pairs = lsh_candidate_pairs(minhash_signatures(_inflated(spark)))
    intra = pairs.filter(
        (F.col("doc_a").cast("long") / N_VARIANTS).cast("long")
        == (F.col("doc_b").cast("long") / N_VARIANTS).cast("long")
    )
    labels = connected_components(intra).collect()
    by_family: dict[int, set[int]] = {}
    for r in labels:
        assert _family(r.doc_id) == _family(r.cluster_rep)
        by_family.setdefault(_family(r.doc_id), set()).add(r.cluster_rep)
    assert by_family
    for fam, reps in by_family.items():
        assert len(reps) == 1, (fam, reps)
        assert min(reps) % N_VARIANTS == 0  # variant 0 is the min id

def test_containment_ignores_the_inflation(spark):
    """Containment pairs on the 10× corpus: the 7×-volume filler (no
    shared shingles with anything) contributes ZERO pairs, every
    emitted pair touches only real-text docs, and the planted
    append-one-token variants are caught with containment ≈ 1.0 (the
    prefix's shingles are a subset of the variant's)."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        containment_pairs,
    )

    pairs = containment_pairs(
        _inflated(spark), shingle_k=3, max_df=50, threshold=0.9
    ).collect()

    def real_text(doc_id: int) -> bool:
        return doc_id % N_VARIANTS == 0 or _is_family_doc(doc_id)

    assert pairs
    assert all(real_text(r.doc_a) and real_text(r.doc_b) for r in pairs)
    # planted family variants: ≥90% of families yield an intra-family
    # containment-1.0 pair (v0 ⊂ v1 modulo the boundary shingles)
    fams_with_pair = {
        _family(r.doc_a)
        for r in pairs
        if _family(r.doc_a) == _family(r.doc_b) and r.containment >= 0.9
    }
    n_families = read(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % FAMILY_MOD == 0
    ).count()
    assert len(fams_with_pair) >= int(n_families * 0.9), (
        len(fams_with_pair), n_families,
    )


def test_passage_dedup_flags_only_real_duplication(spark):
    """Passage profile on the 10× corpus: every filler doc (globally
    unique strided tokens) has ZERO duplicate chunks, while planted
    variants — which share their prefix chunks with variant 0 —
    carry duplicate chunks. Duplicate mass tracks TRUE duplication,
    not corpus volume."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        passage_dup_stats,
    )

    stats = {
        r.doc_id: r for r in passage_dup_stats(_inflated(spark)).collect()
    }
    fillers = [
        r
        for d, r in stats.items()
        if not (d % N_VARIANTS == 0 or _is_family_doc(d))
    ]
    assert fillers and all(r.n_dup_chunks == 0 for r in fillers)
    # variants 1-2 of each family share all FULL chunks with variant 0
    variant_rows = [
        r
        for d, r in stats.items()
        if _is_family_doc(d) and d % N_VARIANTS in (1, 2)
        and stats[d - d % N_VARIANTS].n_chunks > 1
    ]
    assert variant_rows
    dup_frac_hits = sum(1 for r in variant_rows if r.n_dup_chunks >= 1)
    assert dup_frac_hits >= int(len(variant_rows) * 0.9), (
        dup_frac_hits, len(variant_rows),
    )


def test_packing_prefix_sum_invariants_at_10x(spark):
    """Hierarchical prefix sum on the 10× corpus: the layout is a
    permutation-free exact concatenation — the final boundary equals
    the corpus token total, offsets stay inside the budget, and
    sequence ids are monotone in doc order."""
    from gh_archive_clickhouse_spark.operators.packing import (
        pack_coordinates,
    )
    from gh_archive_clickhouse_spark.functions.text import tokens

    coords = pack_coordinates(
        _inflated(spark), F.size(tokens(F.col("text"))), budget=256
    )
    agg = coords.agg(
        F.sum("n_tokens").alias("total"),
        F.max(F.col("tokens_before") + F.col("n_tokens")).alias("end"),
        F.max("seq_offset").alias("max_off"),
        F.min("tokens_before").alias("min_before"),
    ).first()
    assert agg.total == agg.end
    assert 0 <= agg.max_off < 256 and agg.min_before == 0
    # monotone: tokens_before strictly ordered like doc_id
    rows = coords.orderBy("doc_id").select("tokens_before").collect()
    befores = [r.tokens_before for r in rows]
    assert befores == sorted(befores)


def test_packed_sequence_emission_tiles_exactly_at_10x(spark):
    """Emission over the 10× corpus: the slices are an EXACT tiling of
    the packed token stream — every sequence except the last fills to
    precisely the budget with gapless, non-overlapping slices, and
    every document's slices reassemble [0, n_tokens) without loss.
    This is the invariant that makes the emitted layout safe to feed a
    trainer: any off-by-one here silently corrupts batch contents."""
    from gh_archive_clickhouse_spark.functions.text import tokens
    from gh_archive_clickhouse_spark.operators.packing import (
        emit_packed_sequences,
        pack_coordinates,
    )

    budget = 256
    from gh_archive_clickhouse_spark.plans.common import materialize

    coords = materialize(
        pack_coordinates(
            _inflated(spark), F.size(tokens(F.col("text"))), budget=budget
        ),
        "scale_pack_coords",
    )
    slices = emit_packed_sequences(coords, budget)
    total = coords.agg(F.sum("n_tokens")).first()[0]
    n_seq = -(-total // budget)

    by_seq: dict[int, list] = {}
    by_doc: dict[int, list] = {}
    for r in slices.collect():
        by_seq.setdefault(r.seq_id, []).append((r.seq_pos, r.slice_len))
        by_doc.setdefault(r.doc_id, []).append(
            (r.slice_start, r.slice_len)
        )
    assert set(by_seq) == set(range(n_seq))
    for s, parts in by_seq.items():
        parts.sort()
        pos = 0
        for start, ln in parts:
            assert start == pos, (s, parts)  # gapless, no overlap
            pos += ln
        assert pos == (
            budget if s < n_seq - 1 else total - (n_seq - 1) * budget
        )
    n_toks = {
        r.doc_id: r.n_tokens
        for r in coords.filter(F.col("n_tokens") > 0).collect()
    }
    assert set(by_doc) == set(n_toks)
    for d, parts in by_doc.items():
        parts.sort()
        pos = 0
        for start, ln in parts:
            assert start == pos, (d, parts)
            pos += ln
        assert pos == n_toks[d]


def test_budget_select_invariant_to_partitioning_at_10x(spark):
    """The budget cut on the 10× corpus is a pure function of the
    data: the same rows (and the same tokens_before witnesses) come
    back no matter how the input is partitioned — the property that
    makes the range-partition + offset recurrence safe on any cluster
    layout — and the selection is the exact greedy prefix."""
    from gh_archive_clickhouse_spark.functions.text import tokens
    from gh_archive_clickhouse_spark.operators.packing import budget_select

    base = _inflated(spark).select(
        "doc_id", F.size(tokens(F.col("text"))).alias("w")
    )
    order = [F.col("doc_id").asc()]
    a = {
        (r.doc_id, r.tokens_before)
        for r in budget_select(base, "w", 5_000, order).collect()
    }
    b = {
        (r.doc_id, r.tokens_before)
        for r in budget_select(
            base.repartition(37), "w", 5_000, order
        ).collect()
    }
    c = {
        (r.doc_id, r.tokens_before)
        for r in budget_select(
            base.coalesce(1), "w", 5_000, order
        ).collect()
    }
    assert a == b == c and a
    # exact greedy prefix: max doc_id selected has every smaller id
    # selected too, and the boundary row starts under the budget
    ids = sorted(d for d, _ in a)
    all_ids = sorted(
        r.doc_id for r in base.filter(F.col("doc_id") <= ids[-1]).collect()
    )
    assert ids == all_ids
    assert max(t for _, t in a) < 5_000
