"""Multimodal columns: opaque binary payloads + typed metadata.

Design (the part that matters at 100 TB):

- Media travel as ``binary`` columns with a typed metadata struct
  (modality, mime, n_bytes, sha) — schema-first, so Catalyst can prune
  the (huge) payload column whenever a query touches only metadata.
- Decode / feature-extract run as ``mapInPandas`` over Arrow batches:
  payload bytes never round-trip through Python row objects, and batch
  size bounds executor memory (`spark.sql.execution.arrow.
  maxRecordsPerBatch`).
- Image decode is REAL for PNG: ``_decode_pixels`` tries Pillow when
  installed (any format), and falls back to the pure-stdlib PNG codec
  (operators/png_codec.py) otherwise.
- Audio decode is REAL for RIFF/WAV PCM: ``_decode_pcm`` tries
  soundfile when installed (any format it knows) and falls back to the
  stdlib ``wave`` module otherwise — genuine bytes→samples with zero
  dependencies.
- Video decode is REAL for Y4M (yuv4mpeg2): ``_decode_y4m`` tries
  PyAV when installed (any container/codec it knows) and falls back
  to a pure-stdlib parser of the Y4M stream format (ASCII header +
  raw planar frames — no entropy coding, so a codec-free parse is a
  genuine decode). Only formats no path can handle raise
  NotImplementedError (plug ffmpeg in there).
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
    """Image bytes → uint8 pixel array (height, width, channels).

    Tries Pillow first (any format it knows) behind an optional
    import; without it, PNG payloads decode through the pure-stdlib
    codec in operators/png_codec.py. Formats neither path can handle
    raise NotImplementedError (plug libvips/ffmpeg in here)."""
    data = bytes(payload)
    try:
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        img.load()
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr
    except ImportError:
        pass
    from gh_archive_clickhouse_spark.operators.png_codec import (
        PNG_SIG,
        decode_png,
    )

    if data[:8] == PNG_SIG:
        return decode_png(data)
    raise NotImplementedError(
        "no decoder for this format in this environment: Pillow is not "
        "installed and the payload is not a PNG; plug "
        "PIL/torchvision/ffmpeg in here"
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
    """mapInPandas resize: batch-transform binary payloads to a target
    (width, height).

    PNG payloads take the REAL kernel: decode via ``_decode_pixels``,
    nearest-neighbor resample, re-encode. Non-image payloads (the
    fixture attaches text bytes) pass through with the target
    dimensions stamped — preserving the plumbing contract
    (binary-in/binary-out schema, Arrow batching, partition-local, no
    shuffle) for corpora without media columns. At scale this is a
    pure map stage: co-partitioned with the source read, bounded by
    `spark.sql.execution.arrow.maxRecordsPerBatch`.
    """
    import numpy as np

    from gh_archive_clickhouse_spark.operators.png_codec import (
        PNG_SIG,
        encode_png,
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                data = bytes(payload)
                if data[:8] == PNG_SIG:
                    arr = _decode_pixels(data)
                    h, w = arr.shape[:2]
                    ys = (np.arange(height) * h) // height
                    xs = (np.arange(width) * w) // width
                    out.append(encode_png(arr[ys][:, xs]))
                else:
                    out.append(data)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
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

    Dispatch is on CONTAINER MAGIC BYTES, not on decodability:
    payloads whose leading bytes identify a known video container
    (Y4M, mp4/mov ``ftyp``, Matroska/WebM EBML, RIFF-AVI, Ogg) take
    the REAL kernel — ``_decode_y4m`` decodes the container (exact
    stdlib parse for Y4M, PyAV for the rest, the declared
    NotImplementedError without it) and every n-th DECODED luma plane
    is fingerprinted — so a real container whose bytes happen to be
    valid UTF-8 can never be silently fingerprinted as text. Only
    unrecognized payloads that decode as UTF-8 fall back to the
    FIXTURE-ONLY degenerate "codec": fixed-size ``frame_chars``
    character chunks under the same sampling contract (the synthetic
    documents fixture attaches utf-8 payloads; a production pipeline
    would instead register its container's magic in
    ``_VIDEO_MAGIC`` / plug a decoder into ``_decode_y4m``).
    Unrecognized non-UTF-8 binary goes to ``_decode_y4m`` too (PyAV
    probe or the declared raise). Either way the Spark-side shape is
    the one that matters at 100 TB: Arrow-batched row-exploding map
    (no shuffle, no driver), output bounded by
    ceil(n_frames/every_nth) rows per input, schema typed up-front,
    feeding the usual dedup/similarity operators frame-wise.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids: list = []
            idxs: list = []
            md5s: list = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                text = None
                if not _is_video_container(data):
                    try:
                        text = data.decode("utf-8")
                    except UnicodeDecodeError:
                        text = None
                if text is None:
                    # real container path: Y4M signature, or opaque
                    # binary routed to PyAV / the declared raise
                    _w, _h, frames = _decode_y4m(data)
                    for i in range(0, len(frames), every_nth):
                        ids.append(doc_id)
                        idxs.append(i)
                        md5s.append(hashlib.md5(frames[i]).hexdigest())
                    continue
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


# ------------------------------------------------------------- audio

WAV_RATE = 8_000
WAV_BASE_SAMPLES = 64

RIFF_SIG = b"RIFF"


def _wav_n_samples(doc_id: int) -> int:
    """Closed-form per-doc sample count (varies so the decoder's frame
    accounting is actually exercised)."""
    return WAV_BASE_SAMPLES + (doc_id % 4) * 32


def _wav_sample(doc_id: int, i: int) -> int:
    """Closed-form 16-bit PCM sample: ((doc_id*31 + i*7) % 4096) - 2048
    — SQL-expressible, covers both signs, fits int16 with headroom."""
    return (doc_id * 31 + i * 7) % 4096 - 2048


def _decode_pcm(payload: bytes) -> tuple[int, int, list[int]]:
    """Audio bytes → (sample_rate, n_channels, interleaved samples).

    Tries soundfile (libsndfile — any format it knows) behind an
    optional import; without it, RIFF/WAV PCM payloads decode through
    the pure-stdlib ``wave`` module (genuine header parse + int16
    frame decode, zero dependencies — the audio twin of the PNG
    fallback). Formats neither path can handle raise
    NotImplementedError (plug ffmpeg in here)."""
    data = bytes(payload)
    try:
        import io

        import numpy as np
        import soundfile as sf
    except ImportError:
        pass
    else:
        try:
            samples, rate = sf.read(io.BytesIO(data), dtype="int16")
            arr = np.atleast_2d(samples.T)
            return rate, arr.shape[0], [int(x) for x in arr.T.reshape(-1)]
        except Exception:
            # soundfile present but can't decode this payload — fall
            # through to the stdlib path (mirrors _decode_pixels'
            # Pillow→stdlib chain), so the NotImplementedError
            # contract below holds with or without the library.
            pass
    if data[:4] != RIFF_SIG:
        raise NotImplementedError(
            "no decoder for this format in this environment: soundfile "
            "is not installed and the payload is not RIFF/WAV; plug "
            "soundfile/ffmpeg in here"
        )
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if width != 2:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is supported here, got width {width}"
        )
    samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    return rate, n_ch, samples


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL audio payloads: a mono 16-bit PCM RIFF/WAV
    blob per row (stdlib ``wave`` writer) whose sample i is
    ``((doc_id*31 + i*7) % 4096) - 2048`` over a per-doc frame count of
    ``64 + (doc_id % 4)*32`` — so downstream decode operators exercise
    genuine bytes→samples work with an arithmetically closed-form
    oracle. Pure Arrow-batched map stage, no shuffle."""
    import io
    import struct
    import wave

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = _wav_n_samples(d)
                pcm = struct.pack(
                    f"<{n}h", *[_wav_sample(d, i) for i in range(n)]
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_RATE)
                    w.writeframes(pcm)
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": payloads}
            )

    return df.select(id_col).mapInPandas(
        _make, schema=f"{id_col} long, payload binary"
    )


DECODED_AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples int, "
    "sum_code bigint, sum_sq bigint, min_code int, max_code int"
)


def decode_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode under Spark: each binary payload runs through
    ``_decode_pcm`` (soundfile when installed, stdlib ``wave`` PCM
    parse otherwise) and emits the decoded header fields plus
    INTEGER-EXACT sample checksums (sum, sum of squares, min, max) —
    no floating-point ambiguity between engines, same convention as
    quantize_int8. Arrow-batched mapInPandas, partition-local, no
    shuffle — the standard multimodal scan-stage shape with a genuine
    bytes→samples kernel inside."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "sum_code", "sum_sq", "min_code", "max_code",
                )
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                rate, n_ch, samples = _decode_pcm(payload)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["n_samples"].append(len(samples) // n_ch)
                out["sum_code"].append(sum(samples))
                out["sum_sq"].append(sum(s * s for s in samples))
                # zero-frame WAV is legal: NULL extrema, zero sums
                out["min_code"].append(min(samples) if samples else None)
                out["max_code"].append(max(samples) if samples else None)
            yield pd.DataFrame(
                {
                    id_col: pd.array(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.array(
                        out["sample_rate"], dtype="int32"
                    ),
                    "n_channels": pd.array(
                        out["n_channels"], dtype="int32"
                    ),
                    "n_samples": pd.array(out["n_samples"], dtype="int32"),
                    "sum_code": pd.array(out["sum_code"], dtype="int64"),
                    "sum_sq": pd.array(out["sum_sq"], dtype="int64"),
                    # nullable Int32: zero-frame payloads carry NULLs
                    "min_code": pd.array(out["min_code"], dtype="Int32"),
                    "max_code": pd.array(out["max_code"], dtype="Int32"),
                }
            )

    # Output schema follows id_col (same contract as perceptual_ahash).
    schema = DECODED_AUDIO_SCHEMA.replace("doc_id", id_col, 1)
    return df.mapInPandas(_decode, schema=schema)


PNG_SIDE = 8


def attach_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image payloads: an 8×8 grayscale PNG per row
    whose pixel i is ``(doc_id*31 + i) % 256`` — encoded with the
    pure-stdlib codec, so downstream decode operators exercise genuine
    bytes→pixels work with an arithmetically closed-form oracle. Pure
    Arrow-batched map stage, no shuffle."""
    import numpy as np

    from gh_archive_clickhouse_spark.operators.png_codec import encode_png

    n_px = PNG_SIDE * PNG_SIDE

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                px = (
                    (int(doc_id) * 31 + np.arange(n_px)) % 256
                ).astype(np.uint8).reshape(PNG_SIDE, PNG_SIDE, 1)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads}
            )

    return df.select(id_col).mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


DECODED_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, mean_px double"
)


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode under Spark: each binary payload runs through
    ``_decode_pixels`` (Pillow when installed, pure-stdlib PNG codec
    otherwise) and emits actual decoded dimensions + mean pixel value.
    Arrow-batched mapInPandas, partition-local, no shuffle — the same
    100 TB scan-stage shape as the other multimodal kernels, but with
    a genuine bytes→pixels kernel inside."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, means = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = _decode_pixels(payload)
                h, w, ch = arr.shape
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                chs.append(ch)
                # mean of h*w*ch uint8s: n is a power of two for the
                # built-in payloads, so 6-dp rounding is mode-exact
                means.append(round(float(arr.mean()), 6))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_channels": pd.array(chs, dtype="int32"),
                    "mean_px": pd.array(means, dtype="float64"),
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_FEATURES_SCHEMA)


AHASH_SCHEMA = "doc_id long, ahash string"


def perceptual_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual AVERAGE-HASH over REAL decoded pixels: decode each
    binary payload (Pillow / stdlib PNG codec), threshold every pixel
    against the image mean, and emit the 64-bit signature as a
    '0'/'1' string (portable across engines — no int64 sign games).

    This is the image twin of SimHash: identical images collapse to
    one hash; near-identical images land within small Hamming
    distance, so the same banding machinery (operators/dedup.py)
    generates candidate pairs. Arrow-batched mapInPandas, no shuffle —
    a pure scan-stage kernel like the other multimodal ops.

    The mean of an 8x8 single-channel image is sum/64 — a divide by a
    power of two, exact in binary floating point, so the >= mean
    threshold is bit-identical to any closed-form oracle.
    """

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = _decode_pixels(payload)
                flat = arr.reshape(-1).astype("float64")
                mean = float(flat.mean())
                bits = "".join(
                    "1" if float(p) >= mean else "0" for p in flat
                )
                ids.append(doc_id)
                hashes.append(bits)
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="int64"),
                    "ahash": hashes,
                }
            )

    # Output schema follows id_col — a non-default id column keeps its
    # name instead of being silently renamed to doc_id.
    return df.mapInPandas(
        _hash, schema=AHASH_SCHEMA.replace("doc_id", id_col, 1)
    )


# ------------------------------------------------------------- video

Y4M_SIG = b"YUV4MPEG2 "

# Magic-byte signatures of video containers routed to the decode
# kernel (a production deployment registers its formats here). Each
# entry: (offset, signature bytes).
_VIDEO_MAGIC: tuple[tuple[int, bytes], ...] = (
    (0, Y4M_SIG),               # yuv4mpeg2
    (0, b"\x1a\x45\xdf\xa3"),   # Matroska EBML: mkv / webm
    (0, b"OggS"),               # Ogg (theora)
)


def _is_video_container(data: bytes) -> bool:
    """True when the payload's leading bytes identify a known video
    container — the dispatch test sample_frames uses instead of
    'decodes as UTF-8' (container bytes can accidentally be valid
    UTF-8; magic bytes cannot be accidentally text)."""
    for off, sig in _VIDEO_MAGIC:
        if data[off : off + len(sig)] == sig:
            return True
    # ISO BMFF (mp4/mov/3gp): 'ftyp' at offset 4 — but ONLY when the
    # preceding 4 bytes form a plausible big-endian box size, else
    # ordinary text whose characters 5-8 spell 'ftyp' would be
    # rerouted off the text fallback. The bound is a small CONSTANT,
    # not len(data): ftyp is always the first box and a real one is
    # tiny (a brand list — tens of bytes), so a truncated container
    # still probes as video, while text in front of 'ftyp' would
    # need NUL-leading bytes to spell a size this small (any 4
    # printable characters decode to >= 0x20202020).
    if data[4:8] == b"ftyp" and 8 <= int.from_bytes(
        data[:4], "big"
    ) <= 4096:
        return True
    # RIFF-AVI needs two probes (RIFF alone is also WAV).
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "
Y4M_WIDTH = 8
Y4M_HEIGHT = 4

# Frame byte count per W*H for each supported 8-BIT colorspace tag
# (chroma planes for the subsampled spaces follow the luma plane and
# are skipped for stats). Exact tags only: high-bit-depth variants
# (Cmono16, C420p10, ...) pack 2 bytes/sample and MUST raise rather
# than be silently misparsed as their 8-bit namesakes.
_Y4M_FRAME_FACTOR = {
    "Cmono": 1.0,
    "C420": 1.5,
    "C420jpeg": 1.5,
    "C420paldv": 1.5,
    "C420mpeg2": 1.5,
    "C422": 2.0,
    "C444": 3.0,
}


def _y4m_n_frames(doc_id: int) -> int:
    """Closed-form per-doc frame count (varies so the decoder's frame
    loop is actually exercised)."""
    return 2 + (doc_id % 3)


def _y4m_pixel(doc_id: int, frame: int, i: int) -> int:
    """Closed-form luma byte: (doc_id*31 + frame*17 + i) % 256 —
    SQL-expressible, distinct per (doc, frame), full byte range."""
    return (doc_id * 31 + frame * 17 + i) % 256


def _decode_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Video bytes → (width, height, [luma plane per frame]).

    Y4M (yuv4mpeg2) payloads decode through a pure-stdlib parse of
    the stream format FIRST — Y4M stores frames uncompressed, so the
    parse IS the exact decode (plane-0 bytes verbatim), the video
    twin of the WAV/PNG stdlib codecs. This ordering is deliberate:
    with PyAV installed, swscale's ``gray8`` reformat may apply
    limited/full-range conversion for C420-family streams, silently
    shifting luma values away from the byte-exact plane — routing
    Y4M through PyAV would make the decode environment-dependent.
    Y4M variants the stdlib parser DECLARES unsupported (high bit
    depth / unknown colorspace) do fall through to PyAV, so no
    previously-decodable stream is lost. Other containers
    (mp4/webm/...) go to PyAV (ffmpeg bindings) behind an optional
    import; formats neither path can handle raise
    NotImplementedError (plug ffmpeg in here).
    """
    data = bytes(payload)
    stdlib_reason = None
    if data.startswith(Y4M_SIG):
        try:
            return _parse_y4m(data)
        except NotImplementedError as ex:
            # A Y4M variant the stdlib parser DECLARES unsupported
            # (e.g. 10-bit C420p10): fall through to PyAV, which can
            # decode it — only the exactly-parseable 8-bit streams
            # bypass PyAV. Parse ERRORS (ValueError: truncated frame,
            # missing marker) still raise: the stream is corrupt, not
            # merely unsupported.
            stdlib_reason = str(ex)
    try:
        import io

        import av  # noqa: F401 (optional, not in this container)
    except ImportError:
        pass
    else:
        try:
            with av.open(io.BytesIO(data)) as container:
                stream = container.streams.video[0]
                frames = [
                    bytes(
                        f.reformat(format="gray8")
                        .to_ndarray()
                        .tobytes()
                    )
                    for f in container.decode(stream)
                ]
                return stream.width, stream.height, frames
        except Exception:
            # PyAV present but can't read this payload — fall through
            # to the declared raise (mirrors _decode_pcm's chain).
            pass
    raise NotImplementedError(
        (
            f"{stdlib_reason}; and PyAV is not installed or cannot "
            "read it either"
            if stdlib_reason
            else "no decoder for this payload in this environment: "
            "the payload is not Y4M (yuv4mpeg2), and PyAV is not "
            "installed or cannot read it"
        )
        + "; plug PyAV/ffmpeg in here"
    )


def _parse_y4m(data: bytes) -> tuple[int, int, list[bytes]]:
    """Exact stdlib yuv4mpeg2 parse: ASCII stream header
    (``YUV4MPEG2 W.. H.. F.. C..\\n``), then per frame an ASCII
    ``FRAME...\\n`` marker followed by raw planar YUV bytes."""
    nl = data.index(b"\n")
    width = height = None
    cspace = "C420"  # the Y4M default when no C tag is present
    for tok in data[len(Y4M_SIG) : nl].split(b" "):
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("C"):
            cspace = t
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    factor = _Y4M_FRAME_FACTOR.get(cspace)
    if factor is None:
        raise NotImplementedError(
            f"unsupported Y4M colorspace {cspace!r} (8-bit "
            f"{sorted(_Y4M_FRAME_FACTOR)} only)"
        )
    luma = width * height
    frame_bytes = int(luma * factor)
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(
                f"Y4M frame marker missing at offset {pos}"
            )
        pos = data.index(b"\n", pos) + 1
        plane = data[pos : pos + frame_bytes]
        if len(plane) < frame_bytes:
            raise ValueError("Y4M truncated frame")
        frames.append(plane[:luma])
        pos += frame_bytes
    return width, height, frames


def attach_y4m_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL video payloads: a mono 8×4 Y4M (yuv4mpeg2)
    stream per row with ``2 + (doc_id % 3)`` frames whose frame-f
    luma byte i is ``(doc_id*31 + f*17 + i) % 256`` — genuine
    container bytes with an arithmetically closed-form oracle, the
    video twin of attach_wav_payload / attach_png_payload. Pure
    Arrow-batched map stage, no shuffle."""
    n_px = Y4M_WIDTH * Y4M_HEIGHT
    header = (
        Y4M_SIG
        + f"W{Y4M_WIDTH} H{Y4M_HEIGHT} F25:1 Ip A1:1 Cmono\n".encode()
    )

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                buf = bytearray(header)
                for f in range(_y4m_n_frames(d)):
                    buf += b"FRAME\n"
                    buf += bytes(
                        _y4m_pixel(d, f, i) for i in range(n_px)
                    )
                payloads.append(bytes(buf))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": payloads}
            )

    return df.select(id_col).mapInPandas(
        _make, schema=f"{id_col} long, payload binary"
    )


DECODED_VIDEO_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "sum_px bigint, min_px int, max_px int"
)


def decode_video_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL video decode under Spark: each binary payload runs through
    ``_decode_y4m`` (PyAV when installed, pure-stdlib Y4M parse
    otherwise) and emits one row per decoded frame with the stream
    dimensions plus INTEGER-EXACT luma checksums (sum, min, max) — no
    floating-point ambiguity between engines. Arrow-batched
    row-exploding mapInPandas, partition-local, no shuffle — the same
    100 TB scan-stage shape as the audio/image kernels, with a genuine
    bytes→frames kernel inside."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "frame_idx", "width", "height",
                    "sum_px", "min_px", "max_px",
                )
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, frames = _decode_y4m(payload)
                for idx, plane in enumerate(frames):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_px"].append(sum(plane))
                    out["min_px"].append(min(plane) if plane else None)
                    out["max_px"].append(max(plane) if plane else None)
            yield pd.DataFrame(
                {
                    id_col: pd.array(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                    "width": pd.array(out["width"], dtype="int32"),
                    "height": pd.array(out["height"], dtype="int32"),
                    "sum_px": pd.array(out["sum_px"], dtype="int64"),
                    "min_px": pd.array(out["min_px"], dtype="Int32"),
                    "max_px": pd.array(out["max_px"], dtype="Int32"),
                }
            )

    schema = DECODED_VIDEO_SCHEMA.replace("doc_id", id_col, 1)
    return df.mapInPandas(_decode, schema=schema)
