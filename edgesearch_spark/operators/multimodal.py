"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video ride as opaque ``binary`` columns with metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas``.

Decode is REAL for the library-free formats: PPM (P6) and uncompressed
24-bit BMP images, and 16-bit PCM WAV audio are parsed in pure numpy (no
PIL/opencv/soundfile needed — none ship in this container). Compressed
formats (JPEG/PNG/FLAC/…) dispatch to PIL when importable and otherwise
raise NotImplementedError; ``fake=True`` remains for plumbing tests with
arbitrary payloads. Either way the Spark side — schema, partitioning, UDF
signature, Arrow batch shape, 1→N fan-out — is the part that must be right
at 100 TB, and it is identical for every codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, feature long"
IMAGE_SCHEMA = "doc_id long, width int, height int, channels int, mean_pixel double"
AUDIO_SCHEMA = "doc_id long, n_samples long, sample_rate int, channels int, rms double"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def extract_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Cheap metadata pass over binary payloads: byte length + a
    deterministic feature (n_bytes mod 251 — stands in for a real content
    feature; keeps the stage oracle-checkable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            yield pd.DataFrame({"doc_id": pdf[id_col], "n_bytes": n, "feature": n % 251})

    return df.mapInPandas(run, schema=META_SCHEMA)


def _ppm_decode(b: bytes) -> np.ndarray:
    """P6 binary PPM → HxWx3 uint8 (header comments handled)."""
    i, vals = 2, []
    while len(vals) < 3:
        if i >= len(b):
            raise ValueError("truncated PPM header")
        c = b[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            nl = b.find(b"\n", i)
            i = len(b) if nl == -1 else nl + 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            vals.append(int(b[i:j]))
            i = j
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    i += 1  # exactly one whitespace byte after maxval
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3).copy()


def _bmp_decode(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → HxWx3 uint8 (RGB; bottom-up rows flipped)."""
    if int.from_bytes(b[28:30], "little") != 24 or int.from_bytes(b[30:34], "little") != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    flip = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWxC uint8. PPM(P6) and 24-bit BMP decode
    in pure numpy; other formats dispatch to PIL when importable."""
    if fake:
        h = (sum(payload[:16]) % 32) + 1 if payload else 1
        w = (len(payload) % 32) + 1
        arr = np.frombuffer((payload * ((h * w * 3) // max(len(payload), 1) + 1))[: h * w * 3], dtype=np.uint8)
        return arr.reshape(h, w, 3)
    if payload[:2] == b"P6":
        return _ppm_decode(payload)
    if payload[:2] == b"BM":
        return _bmp_decode(payload)
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "compressed image decode requires PIL (absent here); PPM/BMP decode natively"
        ) from e
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV → (samples[n, channels] int16, sample_rate). Pure
    numpy RIFF chunk walk; compressed codecs are out of scope here."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if int.from_bytes(fmt[0:2], "little") != 1 or int.from_bytes(fmt[14:16], "little") != 16:
        raise ValueError("only 16-bit PCM supported")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels), rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing (the preprocessing step
    a vision pipeline runs before feature extraction)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri][:, ci]


def image_features(df: DataFrame, id_col: str, payload_col: str, fake: bool = False) -> DataFrame:
    """Decode → (width, height, channels, mean_pixel) per image, Arrow-batched.
    PPM/BMP payloads decode for real; fake=True keeps the plumbing testable
    with arbitrary bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload), fake=fake)
                rows.append((i, img.shape[1], img.shape[0], img.shape[2], float(img.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "channels", "mean_pixel"])

    return df.mapInPandas(run, schema=IMAGE_SCHEMA)


def audio_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """WAV decode → (n_samples, sample_rate, channels, rms) per payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_audio(bytes(payload))
                rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if samples.size else 0.0
                rows.append((i, samples.shape[0], rate, samples.shape[1], rms))
            yield pd.DataFrame(rows, columns=["doc_id", "n_samples", "sample_rate", "channels", "rms"])

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame sampling stand-in: emit one 'frame' (byte slice) per
    every_n_bytes — demonstrates the 1→N mapInPandas fan-out shape a real
    frame sampler has (one input row → many output rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                for k in range(max(1, len(data) // every_n_bytes)):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(data[k * every_n_bytes : (k + 1) * every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def frame_sample_ppm(df: DataFrame, id_col: str, payload_col: str, every_n: int = 1) -> DataFrame:
    """REAL video-frame sampling over a concatenated-P6-PPM stream (the
    library-free stand-in for a video container): split the payload into
    frames by parsing each PPM header, keep every ``every_n``-th frame —
    the 1→N mapInPandas fan-out a real frame sampler has."""

    def _split(data: bytes) -> list[bytes]:
        frames, pos = [], 0
        while pos < len(data) and data[pos : pos + 2] == b"P6":
            img = _ppm_decode(data[pos:])
            h, w = img.shape[:2]
            # re-find the pixel offset to compute the frame's byte length
            i, vals = pos + 2, []
            while len(vals) < 3:
                c = data[i : i + 1]
                if c.isspace():
                    i += 1
                elif c == b"#":
                    nl = data.find(b"\n", i)
                    i = len(data) if nl == -1 else nl + 1
                else:
                    j = i
                    while j < len(data) and not data[j : j + 1].isspace():
                        j += 1
                    vals.append(int(data[i:j]))
                    i = j
            end = i + 1 + w * h * 3
            frames.append(data[pos:end])
            pos = end
        return frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                for k, fr in enumerate(_split(bytes(payload))):
                    if k % every_n == 0:
                        ids.append(i)
                        idxs.append(k)
                        frames.append(fr)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
