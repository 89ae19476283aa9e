"""Multimodal (image/audio/video) column handling (extension surface).

Convention: media travel as opaque ``binary`` payload columns plus a typed
metadata struct (``mime``, ``width``, ``height``, ``n_frames``, ``n_bytes``)
— the path-reference/bytes pattern of ``spark.read.format("binaryFile")``.
Heavy per-item work (decode, feature extraction, resize, frame sampling)
runs as Arrow-batched ``mapInPandas`` operators.

Decode is REAL: payloads are genuine self-describing media formats parsed
with pure numpy —

- ``image/x-portable-pixmap``: binary PPM (P6), full header grammar
  (whitespace runs, ``#`` comments, maxval).
- ``image/bmp``: uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER,
  BGR byte order, 4-byte row padding).
- ``video/x-ppm-stream``: concatenated P6 frames (the trivial-but-real
  container; frame sampling genuinely seeks by parsing frame headers).
- ``audio/wav``: RIFF/WAVE PCM 16-bit mono (chunk walk to ``data``).

Because the container ships no media files, fixture *content* is
synthesized deterministically (sha256-tiled pixels/samples in
:func:`binarize_documents`) — but it is encoded into the real formats
above and every downstream operator round-trips through the real parsers.

At 100 TB: payloads should be stored in their own column (parquet columnar
pruning keeps metadata-only queries from reading bytes); ``mapInPandas``
processes Arrow record batches so decode parallelism = partition count ×
executor cores, and ``spark.sql.files.maxPartitionBytes`` bounds per-task
memory (payload column dominates row size — size partitions accordingly).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", METADATA_TYPE),
    ]
)


# --------------------------------------------------------------------------
# Real codecs (pure numpy / struct — no external media libraries)
# --------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6) image."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"encode_ppm wants (h, w, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _ppm_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Read one whitespace-delimited PPM header token, skipping ``#``
    comments (which run to end-of-line), returning (token, next_pos)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            while pos < n and buf[pos : pos + 1] not in b"\r\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and buf[pos : pos + 1] not in b" \t\r\n":
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def decode_ppm(payload: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Parse one binary P6 image starting at ``offset``.

    Returns ``(pixels, end_offset)`` where pixels is (h, w, 3) uint8 and
    ``end_offset`` points just past the raster — which is what lets a
    concatenated-P6 stream act as a seekable multi-frame container.
    """
    if payload[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = offset + 2
    w_tok, pos = _ppm_token(payload, pos)
    h_tok, pos = _ppm_token(payload, pos)
    maxval_tok, pos = _ppm_token(payload, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(maxval_tok)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval, per spec
    end = pos + w * h * 3
    if end > len(payload):
        raise ValueError("truncated PPM raster")
    pixels = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(h, w, 3)
    return pixels, end


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Parse a concatenated-P6 stream into its frames (real seek: each
    frame's raster length comes from its own parsed header)."""
    frames, pos = [], 0
    while pos < len(payload):
        frame, pos = decode_ppm(payload, pos)
        frames.append(frame)
    return frames


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row padding)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"encode_bmp wants (h, w, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    raster = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse an uncompressed 24-bit BMP into (h, w, 3) uint8 RGB. Handles
    the on-disk realities: pixel-array offset from the file header, padded
    strides, bottom-up vs top-down (negative height) row order, BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    header_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    bitcount, compression = struct.unpack_from("<HI", payload, 28)
    if bitcount != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported, got {bitcount}/{compression}")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up (the common case)
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


_WAV_FMT = "<HHIIHH"  # audio_format, channels, sample_rate, byte_rate, block_align, bits


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode an int16 mono sample array as RIFF/WAVE PCM."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(f"encode_wav wants 1-D int16, got {samples.shape} {samples.dtype}")
    data = samples.tobytes()
    fmt = struct.pack(_WAV_FMT, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE PCM 16-bit mono: walk chunks to ``fmt `` and
    ``data`` (real chunk traversal — tolerates extra chunks in between).
    Returns (int16 samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            audio_format, channels, sample_rate, _, _, bits = struct.unpack_from(_WAV_FMT, body)
            if (audio_format, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM 16-bit mono supported")
        elif chunk_id == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sample_rate


#: compressed-format magics routed to the OPTIONAL decoder hook
_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG"

#: memoized optional decoder; sentinel distinguishes "not probed yet"
_OPTIONAL_DECODER: list = []


def _optional_image_decoder():
    """Best-effort pillow / imageio import, memoized per process (the
    probe runs once per executor worker, not per row). Returns a
    ``payload -> (h, w, 3) uint8`` callable, or None when neither
    library is installed — the optional-dependency boundary: this
    container ships neither, real deployments pip-install one and the
    SAME mapInPandas plumbing decodes JPEG/PNG with zero code change."""
    if _OPTIONAL_DECODER:
        return _OPTIONAL_DECODER[0]
    dec = None
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        def dec(payload: bytes) -> np.ndarray:
            with Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8)

    except ImportError:
        try:
            import imageio.v3 as iio  # type: ignore[import-not-found]

            def dec(payload: bytes) -> np.ndarray:
                a = np.asarray(iio.imread(payload))
                if a.ndim == 2:  # grayscale -> RGB
                    a = np.stack([a] * 3, axis=-1)
                return a[..., :3].astype(np.uint8)

        except ImportError:
            dec = None
    _OPTIONAL_DECODER.append(dec)
    return dec


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to the right image parser; for a P6 stream
    (video container) this yields the first frame. JPEG/PNG route to the
    optional pillow/imageio hook and FAIL LOUDLY (with the install hint)
    when absent — never a silent skip or a garbage decode."""
    if payload[:2] == b"P6":
        frame, _ = decode_ppm(payload)
        return frame
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:3] == _JPEG_MAGIC or payload[:4] == _PNG_MAGIC:
        dec = _optional_image_decoder()
        if dec is None:
            kind = "JPEG" if payload[:3] == _JPEG_MAGIC else "PNG"
            raise ValueError(
                f"{kind} payload needs an optional image library: "
                f"pip install pillow (or imageio); the built-in "
                f"pure-numpy codecs cover PPM/BMP/WAV only"
            )
        return dec(payload)
    raise ValueError(f"unrecognized media magic {payload[:4]!r}")


def _decoded_uint8(payload: bytes, mime: str) -> np.ndarray:
    """Decode any supported payload to a uint8 array for feature stats:
    images/video-frames as pixels, WAV as int16 samples mapped onto the
    0..255 amplitude scale (high byte, offset-binary)."""
    if mime.startswith("audio"):
        samples, _ = decode_wav(payload)
        return ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
    return decode_image(payload)


# --------------------------------------------------------------------------
# Fixture synthesis (content is deterministic-fake; encoding is real)
# --------------------------------------------------------------------------


def _synth_bytes(seed: bytes, n: int) -> np.ndarray:
    """sha256-tiled deterministic content — stands in for real media bytes,
    which this container cannot ship. Everything downstream of the ENCODE
    step is real parsing."""
    digest = hashlib.sha256(seed).digest()
    base = np.frombuffer(digest, dtype=np.uint8)
    return np.tile(base, n // len(base) + 1)[:n]


def _synth_payload(doc_id: int, text: str) -> tuple[bytes, str, int, int, int]:
    """Build one real-format payload for a document. Returns
    (payload, mime, width, height, n_frames)."""
    seed = text.encode("utf-8", errors="ignore") or str(doc_id).encode()
    w = (doc_id % 16 + 1) * 2  # 2..32 — keeps sf0.1 payload volume sane
    h = (doc_id % 9 + 1) * 2  # 2..18
    kind = doc_id % 3
    if kind == 0:  # still image: PPM or BMP, alternating
        img = _synth_bytes(seed, w * h * 3).reshape(h, w, 3)
        if doc_id % 2 == 0:
            return encode_ppm(img), "image/x-portable-pixmap", w, h, 1
        return encode_bmp(img), "image/bmp", w, h, 1
    if kind == 1:  # video: concatenated-P6 stream, per-frame content
        n_frames = doc_id % 4 + 1
        frames = [
            _synth_bytes(seed + i.to_bytes(4, "little"), w * h * 3).reshape(h, w, 3)
            for i in range(n_frames)
        ]
        return b"".join(encode_ppm(f) for f in frames), "video/x-ppm-stream", w, h, n_frames
    n_samples = (doc_id % 64 + 1) * 32  # audio: PCM WAV
    samples = _synth_bytes(seed, n_samples * 2).view(np.int16)
    return encode_wav(samples), "audio/wav", n_samples, 1, 1


def binarize_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a synthetic multimodal table from the documents fixture: each
    document becomes a REAL encoded media payload (PPM/BMP image, P6-stream
    video, or PCM WAV — cycling by doc_id) with typed metadata. Stands in
    for a real ingest of media files; see module docstring."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                payload, mime, w, h, n_frames = _synth_payload(int(doc_id), str(text))
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "payload": payload,
                        "metadata": {
                            "mime": mime,
                            "width": w,
                            "height": h,
                            "n_frames": n_frames,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(op, MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# Operators (Arrow-batched mapInPandas over real decoded media)
# --------------------------------------------------------------------------

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("std_pixel", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_features(media: DataFrame, bins: int = 8) -> DataFrame:
    """Per-item features via Arrow-batched ``mapInPandas`` over genuinely
    decoded media: pixel stats for images (first frame for videos), sample-
    amplitude stats for audio. One feature row per media item."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # zip over columns, not iterrows: per-row Series construction would
        # dominate the batch loop
        for pdf in batches:
            rows = []
            for media_id, payload, metadata in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                raw = bytes(payload)
                arr = _decoded_uint8(raw, metadata["mime"])
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                rows.append(
                    {
                        "media_id": media_id,
                        "mean_pixel": float(arr.mean()),
                        "std_pixel": float(arr.std()),
                        "histogram": hist.astype("int64").tolist(),
                        "n_bytes": len(raw),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, FEATURE_SCHEMA)


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize every IMAGE to (out_w, out_h): real decode (PPM or BMP),
    nearest-neighbor subsample, re-encode as PPM. Non-image rows are
    filtered out (a real resize stage routes by modality the same way)."""
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                img = decode_image(bytes(payload))
                ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                resized = np.ascontiguousarray(img[np.ix_(ys, xs)])
                out = encode_ppm(resized)
                rows.append(
                    {
                        "media_id": media_id,
                        "payload": out,
                        "metadata": {
                            "mime": "image/x-portable-pixmap",
                            "width": out_w,
                            "height": out_h,
                            "n_frames": 1,
                            "n_bytes": len(out),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("metadata.mime").startswith("image")).mapInPandas(
        op, MEDIA_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_samples: int = 4) -> DataFrame:
    """Uniform frame sampling from video payloads: REAL container seek —
    each concatenated-P6 frame is located by parsing its own header — then
    up to ``n_samples`` frames re-emitted as standalone PPM payloads
    (a 1->N mapInPandas, the row-exploding batch shape a real ffmpeg
    sampler would use)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                frames = decode_ppm_stream(bytes(payload))
                take = min(n_samples, len(frames))
                idxs = np.linspace(0, len(frames) - 1, take).astype(int)
                for i in idxs:
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": int(i),
                            "frame_payload": encode_ppm(frames[i]),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.filter(F.col("metadata.mime").startswith("video")).mapInPandas(
        op, FRAME_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("spectral_rolloff_hz", T.DoubleType()),
        T.StructField("spectral_bandwidth_hz", T.DoubleType()),
    ]
)


def audio_spectral_features(media: DataFrame) -> DataFrame:
    """Real signal-processing features over decoded WAV audio — RMS,
    zero-crossing rate, and FFT-magnitude spectral centroid / 85% rolloff
    / bandwidth (the standard librosa-style definitions, pure numpy
    ``rfft`` — no external audio lib needed). Non-audio rows are filtered
    by mime, the modality-routing shape a real pipeline uses.

    100 TB shape: Arrow-batched ``mapInPandas``; per-item O(n log n) FFT,
    embarrassingly parallel, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                if not str(meta["mime"]).startswith("audio"):
                    continue
                samples, sr = decode_wav(bytes(payload))
                x = samples.astype(np.float64) / 32768.0
                n = len(x)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                zcr = (
                    float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
                )
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                total = mag.sum()
                if total > 0:
                    centroid = float((freqs * mag).sum() / total)
                    cum = np.cumsum(mag)
                    rolloff = float(freqs[np.searchsorted(cum, 0.85 * total)])
                    bandwidth = float(
                        np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total)
                    )
                else:
                    centroid = rolloff = bandwidth = 0.0
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": sr,
                        "n_samples": n,
                        "rms": rms,
                        "zero_crossing_rate": zcr,
                        "spectral_centroid_hz": centroid,
                        "spectral_rolloff_hz": rolloff,
                        "spectral_bandwidth_hz": bandwidth,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields],
            )

    return media.filter(
        F.col("metadata.mime").startswith("audio")
    ).mapInPandas(op, AUDIO_FEATURE_SCHEMA)
