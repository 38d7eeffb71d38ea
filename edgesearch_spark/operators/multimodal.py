"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video ride as opaque ``binary`` columns with metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas``. The decode step itself is STUBBED
(no image/audio libs in this container): ``decode_image``/``decode_audio``
raise NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder exercises the full Spark plumbing — schema,
partitioning, UDF signature, Arrow batch shape — which is the part that
must be right at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, feature long"
IMAGE_SCHEMA = "doc_id long, width int, height int, channels int, mean_pixel double"
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


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWxC uint8. STUB: real decode needs
    PIL/opencv (absent here)."""
    if not fake:
        raise NotImplementedError("image decode requires PIL/opencv; run with fake=True for plumbing tests")
    h = (sum(payload[:16]) % 32) + 1 if payload else 1
    w = (len(payload) % 32) + 1
    arr = np.frombuffer((payload * ((h * w * 3) // max(len(payload), 1) + 1))[: h * w * 3], dtype=np.uint8)
    return arr.reshape(h, w, 3)


def image_features(df: DataFrame, id_col: str, payload_col: str, fake: bool = True) -> DataFrame:
    """Decode → (width, height, channels, mean_pixel) per image, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload), fake=fake)
                rows.append((i, img.shape[1], img.shape[0], img.shape[2], float(img.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "channels", "mean_pixel"])

    return df.mapInPandas(run, schema=IMAGE_SCHEMA)


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
