"""Multimodal columns: opaque binary payloads + typed metadata.

Design (the part that matters at 100 TB):

- Media travel as ``binary`` columns with a typed metadata struct
  (modality, mime, n_bytes, sha) — schema-first, so Catalyst can prune
  the (huge) payload column whenever a query touches only metadata.
- Decode / feature-extract run as ``mapInPandas`` over Arrow batches:
  payload bytes never round-trip through Python row objects, and batch
  size bounds executor memory (`spark.sql.execution.arrow.
  maxRecordsPerBatch`).
- The actual codec calls are STUBBED (no image/audio libs in this
  container): ``decode_image_meta`` parses only deterministic header
  fields; ``_decode_pixels`` raises NotImplementedError and documents
  the real implementation point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema of the decoded-feature output of `extract_image_features`.
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, sha string, fake_width int, fake_height int"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo payload builder: treat the utf-8 bytes of a text column as
    an opaque binary blob plus typed metadata. In production the blob
    comes from `spark.read.format("binaryFile")` or a bytes column in
    parquet; everything downstream only assumes (payload, meta)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.lit("doc").alias("modality"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.sha2(F.col(text_col), 256).alias("sha"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def _decode_pixels(payload: bytes) -> "object":
    """Real image decode would go here (PIL/libvips/ffmpeg). The
    container ships no media libraries, so this is a declared stub —
    the Spark-side contract (signature, batching, schema) is the part
    under test."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; plug PIL/torchvision/ffmpeg in here"
    )


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Uses a deterministic fake 'decode' (byte-length-derived dimensions)
    in place of `_decode_pixels` so the distributed plumbing — Arrow
    batch iteration, schema, partition-parallelism — is real and
    testable without codecs.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "sha": pdf["meta"].map(lambda m: m["sha"]),
                    # deterministic fake decode: pretend square-ish frames
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                }
            )

    return df.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload binary, out_width int, out_height int"
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize plumbing: batch-transform binary payloads to
    a target (width, height).

    The real kernel would decode via `_decode_pixels`, resample, and
    re-encode; with no codecs in this container the stub passes the
    payload through and stamps the target dimensions — keeping the
    Spark-side contract (binary-in/binary-out schema, Arrow batching,
    partition-local, no shuffle) real and testable. At scale this is a
    pure map stage: co-partitioned with the source read, bounded by
    `spark.sql.execution.arrow.maxRecordsPerBatch`.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real path: _decode_pixels(payload) -> resample -> encode
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "out_width": width,
                    "out_height": height,
                }
            ).astype({"out_width": "int32", "out_height": "int32"})

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    frame_chars: int = 64,
    every_nth: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-style frame sampling over binary payloads: one row in →
    one row per sampled frame out, via ``mapInPandas``.

    The real kernel would hand the payload to ffmpeg and emit every
    n-th decoded frame; with no codecs in this container the fake
    'decode' treats the payload as a sequence of fixed-size
    ``frame_chars`` chunks and fingerprints each sampled chunk —
    keeping the Spark-side contract real: Arrow-batched row-exploding
    map (no shuffle, no driver), output bounded by
    ceil(len/frame_chars)/every_nth rows per input, schema typed
    up-front. At 100 TB this shape is a pure scan stage whose output
    feeds the usual dedup/similarity operators frame-wise.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids: list = []
            idxs: list = []
            md5s: list = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                text = bytes(payload).decode("utf-8")  # fake 'decode'
                n_frames = -(-len(text) // frame_chars)
                for i in range(0, n_frames, every_nth):
                    chunk = text[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_md5": pd.array(md5s, dtype="object"),
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, win int, n_samples int, mean_code double, rms double"
)


def audio_frame_features(
    df: DataFrame, window: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """Audio-style windowed feature extraction over binary payloads:
    per fixed-size sample window, mean amplitude and RMS energy — the
    silence-trim / loudness-normalize precursor of any audio pipeline.

    Real ffmpeg/soundfile decode would produce PCM samples; the fake
    'decode' reads the payload's unicode code points as the sample
    stream, keeping the contract real: Arrow-batched mapInPandas
    row-explode (one row per window), partition-local, typed schema,
    deterministic — and therefore oracle-checkable.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def round6(x: float) -> float:
            # Half-AWAY-from-zero at 6 dp (SQL round semantics). Python's
            # round() is half-even, and window=256 makes exact halves
            # routine: sum(int)/256 is dyadic, so its decimal expansion
            # regularly terminates in ...5 at the 7th digit.
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            ids: list = []
            wins: list = []
            ns: list = []
            means: list = []
            rmss: list = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                codes = [ord(ch) for ch in bytes(payload).decode("utf-8")]
                n_win = -(-len(codes) // window)
                for w in range(n_win):
                    chunk = codes[w * window : (w + 1) * window]
                    n = len(chunk)
                    ids.append(doc_id)
                    wins.append(w)
                    ns.append(n)
                    means.append(round6(sum(chunk) / n))
                    rmss.append(
                        round6(math.sqrt(sum(c * c for c in chunk) / n))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "win": pd.array(wins, dtype="int32"),
                    "n_samples": pd.array(ns, dtype="int32"),
                    "mean_code": pd.array(means, dtype="float64"),
                    "rms": pd.array(rmss, dtype="float64"),
                }
            )

    return df.mapInPandas(_features, schema=AUDIO_FEATURES_SCHEMA)
