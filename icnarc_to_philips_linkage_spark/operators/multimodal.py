"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing here is real and tested — schemas, Arrow-batched
``mapInPandas`` signatures, partition behavior. The *metadata* decode is
real and dependency-free for the two most common container formats:
PNG dimensions (IHDR parse) and WAV duration (fmt/data chunk walk) in
pure Python inside the ``mapInPandas`` batches. PIXEL/PCM decode beyond
that is the optional-library upgrade (Pillow for other image formats,
PyAV for audio/video), resolved at decode time on the executor;
``decode_media`` raises ``NotImplementedError`` where the needed
library is absent, and ``fake=True`` substitutes a deterministic
md5-derived fake decode for tests. Swapping in a codec changes ONE
function body and nothing about the distributed plan.

Scale design: media payloads travel as Arrow binary batches; per-batch
Python cost is amortized via ``mapInPandas`` (never row-at-a-time UDFs);
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory so a
partition of 100 MB videos cannot OOM an executor. Feature extraction
keys nothing — zero shuffles; downstream joins use ``media_id``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("content_hash", StringType(), True),
        StructField("duration_s", DoubleType(), True),  # audio/video only
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads, the
    shape every real media table has (used by tests and the
    multimodal_meta query)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """DETERMINISTIC FAKE decode — stands in for PIL/ffmpeg, which are not
    in this container. Derives plausible dimensions from the content
    digest so results are stable across runs and partitionings."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:4], 16) % 1024
    height = 64 + int(digest[4:8], 16) % 1024
    n_frames = 1 + int(digest[8:12], 16) % 64
    return width, height, n_frames, digest


def _parse_png_ihdr(payload: bytes) -> tuple[int, int] | None:
    """Pure-Python PNG metadata: the 8-byte signature is immediately
    followed by the IHDR chunk (length, 'IHDR', width, height as
    big-endian u32 — PNG spec mandates IHDR first). Returns
    (width, height) or None if the payload is not a PNG."""
    if (
        len(payload) >= 24
        and payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[12:16] == b"IHDR"
    ):
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        if width > 0 and height > 0:
            return width, height
    return None


def _parse_wav_header(payload: bytes) -> tuple[int, float] | None:
    """Pure-Python RIFF/WAVE metadata: walk the chunk list for 'fmt '
    (sample rate, block align) and 'data' (payload size); duration =
    data_size / block_align / sample_rate. Returns
    (n_sample_frames, duration_s) or None if not a parseable WAV."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, sample_rate, block_align, data_size = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            sample_rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if sample_rate and block_align and data_size is not None:
        n_frames = data_size // block_align
        return n_frames, n_frames / sample_rate
    return None


def _real_decode(payload: bytes, media_type: str):
    """Real codec step. Container-format metadata (PNG IHDR dimensions,
    WAV fmt/data duration) is parsed in dependency-free pure Python —
    testable anywhere — and the general-codec upgrade resolves by
    optional import AT DECODE TIME (on the executor): Pillow for
    non-PNG images when installed; audio beyond WAV / video would take
    PyAV the same way. Raises NotImplementedError when the library a
    payload needs is absent — so the same code runs real decodes
    wherever the executor image ships the libs, and degrades to the
    explicit stub error here (no image/audio libs in this container).
    Returns (width, height, n_frames, digest, duration_s) or None for
    an undecodable payload (quarantine row, NULL metadata)."""
    digest = hashlib.md5(payload).hexdigest()
    if media_type == "image":
        png = _parse_png_ihdr(payload)
        if png is not None:
            return png[0], png[1], 1, digest, None
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            # PNG by signature but malformed IHDR: quarantine, don't
            # crash the job on one bad row (matches the Pillow path's
            # undecodable-payload handling below)
            return None
        try:
            import io

            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "real non-PNG image decode requires Pillow; not installed "
                "in this container — pass fake=True for the deterministic "
                "stub"
            ) from e
        try:
            with Image.open(io.BytesIO(payload)) as img:
                width, height = img.size
                n_frames = int(getattr(img, "n_frames", 1))
        except Exception:
            return None  # undecodable payload -> NULL-metadata row
        return width, height, n_frames, digest, None
    if media_type == "audio":
        wav = _parse_wav_header(payload)
        if wav is not None:
            return None, None, wav[0], digest, wav[1]
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            # IS a WAV by signature but malformed past the header:
            # quarantine (NULL metadata), don't crash the decode job
            return None
        raise NotImplementedError(
            "real non-WAV audio decode requires an av/ffmpeg binding; "
            "not installed in this container — pass fake=True for the "
            "deterministic stub"
        )
    raise NotImplementedError(
        f"real {media_type} decode requires an av/ffmpeg binding; not "
        "installed in this container — pass fake=True for the "
        "deterministic stub"
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to typed metadata via Arrow-batched
    mapInPandas. ``fake=False`` runs the real codec where the optional
    library is installed (Pillow for images) and raises
    NotImplementedError where it isn't; ``fake=True`` is the
    deterministic md5-derived stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, media_type, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:
                    rows.append(
                        (media_id, media_type, None, None, None, None, None, None)
                    )
                    continue
                if fake:
                    w, h, nf, digest = _fake_decode(bytes(payload))
                    decoded = (w, h, nf, digest, None)
                else:
                    decoded = _real_decode(bytes(payload), media_type)
                if decoded is None:
                    rows.append(
                        (media_id, media_type, len(payload), None, None, None, None, None)
                    )
                    continue
                w, h, nf, digest, dur = decoded
                rows.append(
                    (media_id, media_type, len(payload), w, h, nf, digest, dur)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction (embedding) over media payloads — same batched
    contract as decode_media; the fake derives FEATURE_DIM floats from
    the digest."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a vision/audio model"
                )
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    out.append((media_id, None))
                    continue
                digest = hashlib.md5(bytes(payload)).digest()
                feats = [
                    (digest[i] - 128) / 128.0 for i in range(FEATURE_DIM)
                ]
                out.append((media_id, feats))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return df.mapInPandas(batches, FEATURES_SCHEMA)


def resize_plan(df: DataFrame, max_dim: int = 224) -> DataFrame:
    """Resize planning on decoded metadata — pure Catalyst (no payload
    touch): compute target dims preserving aspect ratio. The actual pixel
    resample belongs in the (stubbed) codec step; planning it relationally
    means the expensive decode only runs for rows that need it."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest(F.col("width"), F.col("height")),
    )
    return df.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )


def sample_frames(df: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per kept frame
    index — an explode over a generated sequence, no payload touch until
    the codec step consumes (media_id, frame_idx)."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
    ]
)


def decode_audio_samples(df: DataFrame) -> DataFrame:
    """REAL audio decode, dependency-free: stdlib ``wave`` reads PCM
    WAV payloads inside the Arrow batches and numpy computes waveform
    statistics (RMS loudness, peak) — the silence/clipping screens an
    audio-training pipeline filters on. This is the step past
    ``_parse_wav_header``'s metadata: actual sample values flow, not
    just chunk lengths, proving the batched-decode plumbing end-to-end
    without any optional codec library (16/8-bit PCM; compressed
    formats remain the PyAV upgrade path and yield NULL stats here).

    Output: (media_id, n_samples, sample_rate, duration_s, rms, peak)
    with amplitudes normalized to [-1, 1]; non-WAV / malformed payloads
    yield NULL stats.
    """
    import io
    import wave

    import numpy as np

    def stats(payload: bytes):
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                rate = w.getframerate()
                n = w.getnframes()
                width = w.getsampwidth()
                nch = max(1, w.getnchannels())
                raw = w.readframes(n)
        except (wave.Error, EOFError):
            return None
        # a truncated data chunk can return a buffer that is not a
        # multiple of the sample width — trim instead of letting
        # np.frombuffer raise and kill the task (contract: malformed
        # payloads yield NULL stats, never job failures)
        raw = raw[: len(raw) - (len(raw) % max(1, width))]
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:
            x = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        else:
            return None  # 24/32-bit: PyAV upgrade path
        if x.size == 0 or rate <= 0:
            return None
        return (
            int(x.size),
            int(rate),
            float(x.size / rate / nch),
            float(np.sqrt(np.mean(x * x))),
            float(np.max(np.abs(x))),
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                s = stats(bytes(payload)) if payload is not None else None
                if s is None:
                    rows.append((media_id, None, None, None, None, None))
                else:
                    rows.append((media_id, *s))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return df.mapInPandas(batches, AUDIO_STATS_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("std_luma", DoubleType(), True),
    ]
)


def _png_pixels(payload: bytes):
    """Minimal dependency-free PNG decode (stdlib zlib): 8-bit
    greyscale/RGB/RGBA, non-interlaced — parse chunks, inflate IDAT,
    undo the per-row filters (None/Sub/Up/Average/Paeth). Returns
    (width, height, channels, flat uint8 ndarray) or None."""
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, w = 8, None
    idat = b""
    try:
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos : pos + 4], "big")
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                depth, ct, _comp, _filt, interlace = data[8:13]
                if depth != 8 or interlace != 0 or ct not in (0, 2, 6):
                    return None
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
        if w is None or not idat:
            return None
        ch = {0: 1, 2: 3, 6: 4}[ct]
        # cap BEFORE inflating: a zlib bomb (or an IHDR declaring
        # absurd dimensions) would otherwise expand to gigabytes in
        # executor memory before any sanity check ran
        if w <= 0 or h <= 0 or w * h * ch > 64_000_000:
            return None
        need = h * (w * ch + 1)
        raw = zlib.decompressobj().decompress(idat, need)
    except Exception:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            out = row
        elif ft == 2:  # Up
            out = (row + prev) & 0xFF
        elif ft == 1:  # Sub = per-channel-lane cumulative sum (mod 256)
            out = (
                np.cumsum(row.reshape(-1, ch), axis=0, dtype=np.int64) & 0xFF
            ).reshape(-1).astype(np.int32)
        else:  # Average/Paeth carry left-pixel state: scan serially
            out = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = out[i - ch] if i >= ch else 0
                b = prev[i]
                if ft == 3:
                    out[i] = (row[i] + (a + b) // 2) & 0xFF
                elif ft == 4:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    out[i] = (row[i] + pred) & 0xFF
                else:
                    return None
        recon[y] = out.astype(np.uint8)
        prev = out
    return w, h, ch, recon.reshape(-1)


def decode_image_pixels(df: DataFrame) -> DataFrame:
    """REAL image decode, dependency-free: the stdlib-zlib PNG decoder
    runs inside the Arrow batches and numpy computes luma statistics —
    the all-black/all-white/low-contrast screens an image-training
    pipeline filters on. The pixel-value twin of
    ``decode_audio_samples`` (metadata parsing is ``_parse_png_ihdr``;
    JPEG and friends remain the Pillow upgrade path and yield NULL
    stats here).

    Luma = mean over color channels (alpha excluded), normalized to
    [0, 1]. Output: (media_id, width, height, channels, mean_luma,
    std_luma); undecodable payloads yield NULL stats.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                d = _png_pixels(bytes(payload)) if payload is not None else None
                if d is None:
                    rows.append((media_id, None, None, None, None, None))
                    continue
                w, h, ch, flat = d
                px = flat.reshape(h * w, ch).astype(np.float64) / 255.0
                luma = px[:, : min(ch, 3)].mean(axis=1)
                rows.append(
                    (
                        media_id,
                        int(w),
                        int(h),
                        int(ch),
                        float(luma.mean()),
                        float(luma.std()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return df.mapInPandas(batches, IMAGE_STATS_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("phash", LongType(), True),
    ]
)


def _dhash64(flat, w: int, h: int, ch: int) -> int | None:
    """64-bit difference hash of a decoded image: block-mean the luma
    down to a 9x8 grid, then bit r*8+c = grid[r,c] < grid[r,c+1]. The
    standard perceptual fingerprint — stable under re-encoding, mild
    noise, and resizing, which content (md5) hashing is not."""
    import numpy as np

    if w < 9 or h < 8:
        return None
    px = flat.reshape(h, w, ch).astype(np.float64)
    luma = px[:, :, : min(ch, 3)].mean(axis=2)
    rb = (np.arange(9) * h) // 8
    cb = (np.arange(10) * w) // 9
    grid = np.empty((8, 9))
    for r in range(8):
        for c in range(9):
            grid[r, c] = luma[rb[r] : rb[r + 1], cb[c] : cb[c + 1]].mean()
    bits = 0
    for r in range(8):
        for c in range(8):
            if grid[r, c] < grid[r, c + 1]:
                bits |= 1 << (r * 8 + c)
    # Python int -> signed int64 (top bit set wraps negative)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def perceptual_dhash(df: DataFrame) -> DataFrame:
    """Per-image 64-bit dHash over the dependency-free PNG pixel decode
    (``_png_pixels``) — same Arrow-batched ``mapInPandas`` shape as
    ``decode_image_pixels``; undecodable or sub-9x8 payloads yield NULL.
    Output: (media_id, phash long)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                d = _png_pixels(bytes(payload)) if payload is not None else None
                if d is None:
                    rows.append((media_id, None))
                    continue
                w, h, ch, flat = d
                rows.append((media_id, _dhash64(flat, w, h, ch)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PHASH_SCHEMA.fields]
            )

    return df.mapInPandas(batches, PHASH_SCHEMA)


def phash_neardup(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Image near-duplicate pairs by Hamming distance on the perceptual
    hash — banded, never all-pairs: the 64-bit hash splits into
    ``max_hamming + 1`` disjoint bands, and by pigeonhole any pair
    within the distance budget agrees EXACTLY on at least one band, so
    candidate generation is an equi-join on (band_idx, band_bits) —
    the same bucket-then-verify shape as the MinHash LSH and SimHash
    dedup paths, shuffling once on band keys. Verification is
    ``bit_count(a XOR b)`` on the candidate set only.
    Output: (id_a, id_b, hamming), id_a < id_b."""
    if not 0 <= max_hamming <= 15:
        # nb > 16 makes bands narrower than 4 bits — bucket collisions
        # degenerate toward all-pairs; a negative budget is meaningless
        raise ValueError(f"max_hamming must be in [0, 15], got {max_hamming}")
    nb = max_hamming + 1
    width = 64 // nb
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    bands = []
    for i in range(nb):
        w = width if i < nb - 1 else 64 - width * (nb - 1)
        mask = (1 << w) - 1
        bands.append(
            h.select(
                "__id",
                "__h",
                F.lit(i).alias("__band"),
                F.shiftrightunsigned(F.col("__h"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("__bits"),
            )
        )
    b = bands[0]
    for extra in bands[1:]:
        b = b.unionByName(extra)
    a = b.select(
        "__band", "__bits", F.col("__id").alias("id_a"), F.col("__h").alias("__ha")
    )
    c = b.select(
        "__band", "__bits", F.col("__id").alias("id_b"), F.col("__h").alias("__hb")
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        a.join(c, ["__band", "__bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def synth_png_media(
    ids: DataFrame,
    id_col: str = "media_id",
    size: int = 16,
    near_dup_mod: int = 13,
) -> DataFrame:
    """Deterministic synthetic PNG payloads for pipeline tests/benches
    when no real image corpus exists: each id renders a greyscale
    gradient whose parameters derive from the id, and every
    ``near_dup_mod``-th id re-renders its PREDECESSOR group's gradient
    with one-level noise — planted near-duplicates the perceptual-hash
    path must find. Pure-Python PNG encode (stdlib zlib, filter 0)
    inside Arrow batches — the generation twin of ``_png_pixels``."""
    import struct
    import zlib

    def encode(mid: int) -> bytes:
        base = mid - (mid % near_dup_mod == 0)
        noise = 1 if mid % near_dup_mod == 0 else 0
        raw = bytearray()
        for y in range(size):
            raw.append(0)
            for x in range(size):
                # per-image md5 texture: a LINEAR position hash only
                # shifts luma by a constant between bases (dHash is
                # shift-invariant, so everything would collide); md5
                # mixing makes distinct bases genuinely far apart while
                # the near-dup copy differs by ±1-level checker noise
                v = hashlib.md5(
                    f"{base}:{x}:{y}".encode()
                ).digest()[0]
                raw.append(min(255, v + ((x + y) % 2) * noise))

        def chunk(typ: bytes, data: bytes) -> bytes:
            body = typ + data
            return (
                struct.pack(">I", len(data))
                + body
                + struct.pack(">I", zlib.crc32(body))
            )

        ihdr = struct.pack(">IIBBBBB", size, size, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": [
                        encode(int(i)) for i in pdf[id_col]
                    ],
                    "meta": [
                        {"codec": "png", "synthetic": "true"}
                        for _ in range(len(pdf))
                    ],
                }
            )

    return ids.mapInPandas(batches, MEDIA_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("afp", LongType(), True),
    ]
)


def synth_wav_media(
    ids: DataFrame,
    id_col: str = "media_id",
    frames: int = 64,
    frame_len: int = 25,
    near_dup_mod: int = 13,
) -> DataFrame:
    """Deterministic synthetic WAV payloads (8-bit PCM mono, stdlib
    ``wave`` encode) — the audio twin of ``synth_png_media``: each id's
    per-frame amplitude derives from md5, every ``near_dup_mod``-th id
    re-renders its predecessor's amplitudes with a +9 perturbation on
    frames ``f % 29 == 3`` (3 of 64 frames → at most 6 fingerprint
    bits move, within the near-dup join's Hamming budget), and within
    a frame samples alternate ``128 ± h`` so the frame's energy is a
    CLOSED-FORM function of the md5 byte — which is what lets a SQL
    engine that cannot decode WAVs oracle the whole pipeline."""
    import io
    import struct as _struct
    import wave

    def encode(mid: int) -> bytes:
        base = mid - (mid % near_dup_mod == 0)
        body = bytearray()
        for f in range(frames):
            a = hashlib.md5(f"{base}:{f}".encode()).digest()[0]
            h = a // 2
            if mid % near_dup_mod == 0 and f % 29 == 3:
                h = min(127, h + 9)
            for s in range(frame_len):
                body.append(128 + h if s % 2 == 0 else 128 - h)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes(body))
        return buf.getvalue()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": "audio",
                    "payload": [encode(int(i)) for i in pdf[id_col]],
                    "meta": [
                        {"codec": "pcm_u8", "synthetic": "true"}
                        for _ in range(len(pdf))
                    ],
                }
            )

    return ids.mapInPandas(batches, MEDIA_SCHEMA)


def audio_energy_fingerprint(
    df: DataFrame, frames: int = 64
) -> DataFrame:
    """64-frame energy-delta fingerprint over the REAL WAV decode: split
    the PCM signal into ``frames`` equal frames, per-frame energy
    ``Σx²``, bit ``f`` set iff ``E[f+1] > E[f]`` — the
    loudness-contour analogue of dHash's luma gradient, robust to
    uniform gain exactly as dHash is to uniform brightness. 63 bits
    pack into one non-negative long for the banded Hamming join
    (``phash_neardup`` with ``hash_col='afp'``).

    Undecodable payloads or signals not divisible into ``frames``
    equal frames yield NULL. The energies of the synthetic corpus are
    dyadic rationals (±h/128 samples), so the float comparisons are
    exact — the differential oracle reproduces them in integers.
    Output: (media_id, afp long)."""
    import io
    import wave

    import numpy as np

    def fp(payload: bytes):
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                width = w.getsampwidth()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError):
            return None
        raw = raw[: len(raw) - (len(raw) % max(1, width))]
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:
            x = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        else:
            return None
        if x.size == 0 or x.size % frames != 0:
            return None
        e = (x.reshape(frames, -1) ** 2).sum(axis=1)
        bits = e[1:] > e[:-1]
        out = 0
        for i, b in enumerate(bits):
            if b:
                out |= 1 << i
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                h = fp(bytes(payload)) if payload is not None else None
                rows.append((media_id, h))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FP_SCHEMA.fields]
            )

    return df.mapInPandas(batches, AUDIO_FP_SCHEMA)
