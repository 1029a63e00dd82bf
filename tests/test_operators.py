"""Operator-level unit tests (pieces not covered by the oracle gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.multimodal import (
    _decode_pixels,
    attach_binary_payload,
    extract_image_features,
    sample_frames,
)
from gh_archive_clickhouse_spark.operators.ttl import expire_older_than
from gh_archive_clickhouse_spark.operators._util import ensure_parallelism
from tests.conftest import SF_DIR


def _docs(spark):
    from gh_archive_clickhouse_spark.plans.common import read

    return read(spark, SF_DIR, "documents")


def test_multimodal_payload_and_features(spark):
    docs = _docs(spark)
    payloads = attach_binary_payload(docs)
    assert payloads.schema["payload"].dataType.simpleString() == "binary"
    feats = extract_image_features(payloads)
    rows = feats.limit(5).collect()
    assert rows and all(r.n_bytes > 0 and len(r.sha) == 64 for r in rows)
    # deterministic fake decode is bounded like real frame dims
    assert all(0 <= r.fake_width < 640 and 0 <= r.fake_height < 480 for r in rows)
    # payload bytes round-tripped through Arrow: n_bytes == len(text utf8)
    joined = feats.join(docs, "doc_id").filter(
        F.col("n_bytes") != F.octet_length("text")
    )
    assert joined.count() == 0


def test_decode_stub_declares_missing_codecs():
    with pytest.raises(NotImplementedError):
        _decode_pixels(b"\x89PNG")


def test_sample_frames(spark):
    docs = _docs(spark)
    sampled = sample_frames(docs, every_nth=10)
    assert sampled.count() == docs.filter(F.col("doc_id") % 10 == 0).count()


def test_expire_older_than_view(spark):
    from gh_archive_clickhouse_spark.plans.common import read

    ev = read(spark, SF_DIR, "events")
    kept = expire_older_than(ev, days=3)
    mx = ev.agg(F.max("ts")).first()[0]
    manual = ev.filter(F.col("ts") >= F.lit(mx) - F.expr("INTERVAL 3 DAYS"))
    assert kept.count() == manual.count()
    assert kept.count() < ev.count()  # fixture spans >3 days


def test_ensure_parallelism_fans_out_small_inputs(spark):
    docs = _docs(spark)  # single small file → 1 partition
    assert docs.rdd.getNumPartitions() < 4
    fanned = ensure_parallelism(docs)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # already-partitioned input passes through without a reshuffle
    assert ensure_parallelism(fanned) is fanned
