"""The README cookbook, executed: the end-to-end training-corpus
composition over public operators must keep running exactly as
documented (doc-rot guard). Mirrors README.md's 'Cookbook' section."""

from __future__ import annotations

from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.functions.hashing import split_bucket
from gh_archive_clickhouse_spark.functions.text import tokens
from gh_archive_clickhouse_spark.operators import (
    densify_order,
    emit_packed_sequences,
    long_gram_overlap_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    pack_coordinates,
)
from gh_archive_clickhouse_spark.operators.dedup import dedup_survivors
from gh_archive_clickhouse_spark.operators.text_analysis import quality_score
from tests.conftest import SF_DIR


def test_readme_cookbook_composition(spark):
    from gh_archive_clickhouse_spark.plans.common import read

    from gh_archive_clickhouse_spark.plans.common import materialize

    docs = read(spark, SF_DIR, "documents").select("doc_id", "text")
    n0 = docs.count()

    sigs = materialize(minhash_signatures(docs), "cookbook_sigs")
    docs = dedup_survivors(docs, lsh_candidate_pairs(sigs))
    span_pairs = long_gram_overlap_pairs(docs, gram=20)
    docs = dedup_survivors(docs, span_pairs)

    scored = quality_score(docs)
    keep = scored.filter(F.col("quality") >= 0.75)
    docs = docs.join(keep.select("doc_id"), "doc_id", "left_semi")
    n_curated = docs.count()
    assert 0 < n_curated < n0  # both gates really cut something

    # 3b. token-budget cap: best docs first (qx53's operator)
    from gh_archive_clickhouse_spark.operators.packing import budget_select

    sel = budget_select(
        scored.join(docs.select("doc_id"), "doc_id", "left_semi"),
        "n_tokens",
        budget=5_000,
        order_by=[F.col("quality").desc(), F.col("doc_id").asc()],
    )
    docs = docs.join(sel.select("doc_id"), "doc_id", "left_semi")
    n_budgeted = docs.count()
    assert 0 < n_budgeted < n_curated  # the budget really cuts

    # 3c. tokenizer training + pricing on the curated corpus
    from gh_archive_clickhouse_spark.operators.text_analysis import (
        bpe_encode_stats,
        bpe_vocab_build,
    )

    merges = [
        (r.left, r.right, r.merged)
        for r in bpe_vocab_build(docs, rounds=4).collect()
    ]
    assert len(merges) == 4
    token_counts = bpe_encode_stats(docs, merges)
    # BPE merges can only shrink the char-symbol count, never below
    # the word count
    priced = token_counts.join(sel, "doc_id").filter(
        (F.col("n_bpe_tokens") < F.col("n_vocab_words"))
    )
    assert priced.count() == 0

    # 3d. mix to a target source recipe (fixture sources get a
    # non-uniform spec derived from their rank, covering both rate
    # regimes; README shows the literal {web/code/books} form)
    from gh_archive_clickhouse_spark.operators import mixture_resample

    docs_src = read(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    ).join(docs.select("doc_id"), "doc_id", "left_semi")
    srcs = sorted(
        r.source for r in docs_src.select("source").distinct().collect()
    )
    weights = spark.createDataFrame(
        [(s, 1_000_000 * (i + 1) // (len(srcs) * (len(srcs) + 1) // 2))
         for i, s in enumerate(srcs)],
        "source string, weight_ppm long",
    )
    mixed = mixture_resample(
        docs_src, weights, budget_ppm=800_000, salt="mix-2026-08"
    )
    n_mixed = mixed.count()
    assert 0 < n_mixed <= n_budgeted
    docs = docs.join(mixed.select("doc_id"), "doc_id", "left_semi")

    train = docs.filter(split_bucket("doc_id") < 98)
    dense = densify_order(train, "doc_id")
    coords = pack_coordinates(
        dense,
        F.size(tokens(F.col("text"))),
        budget=4096,
        order_col="dense_id",
    )
    layout = emit_packed_sequences(coords, 4096, order_col="dense_id")
    total = coords.agg(F.sum("n_tokens")).first()[0]
    # the layout covers the whole train token stream
    assert layout.agg(F.sum("slice_len")).first()[0] == total

    # 5. reproducible training order, emitted as shards + manifest
    import tempfile

    from gh_archive_clickhouse_spark.operators import (
        seeded_shuffle,
        verify_training_shards,
        write_training_shards,
    )

    ordered = seeded_shuffle(train, "doc_id", seed="run-2026-08")
    with tempfile.TemporaryDirectory() as d:
        manifest = write_training_shards(
            ordered, f"{d}/shards", n_shards=4
        )
        assert sum(m["n_rows"] for m in manifest) == train.count()
        # the pre-training integrity check passes on a fresh write
        assert verify_training_shards(spark, f"{d}/shards") == manifest
