"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas iterators.

The decode step itself (image decode, audio resample, video frame-sample)
requires codec libraries that are NOT in this container — it is stubbed
behind ``decoder=None`` -> deterministic fake features (documented below).
Everything Spark-side is real and tested: schema, batch iteration shape,
partitioning, and the metadata fast path.

Scale: ``mapInPandas`` streams Arrow record batches — binary payloads never
materialize as Python row objects; per-batch numpy work amortizes UDF
overhead. Partition sizing: binary columns dominate bytes, so set
``spark.sql.files.maxPartitionBytes`` (or repartition by byte budget) so a
batch of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def binary_metadata(
    df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Typed metadata for an opaque binary column — pure built-ins, no UDF:
    (id, n_bytes, digest). The cheap pre-filter stage before any decode."""
    return df.select(
        F.col(id_col),
        F.length(F.col(binary_col)).cast("bigint").alias("n_bytes"),
        F.md5(F.col(binary_col)).alias("digest"),
    )


def _fake_decode(payload: bytes, feature_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features are byte-window
    means — stable across runs/machines, no codec dependency."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(feature_dim)
    chunks = np.array_split(arr, feature_dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def extract_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    decoder: Callable[[bytes, int], np.ndarray] | None = None,
    batch_note: str = "image",
) -> DataFrame:
    """Decode/feature-extract a binary column via ``mapInPandas``.

    ``decoder(payload_bytes, feature_dim) -> np.ndarray[feature_dim]`` is
    the pluggable real decode (PIL/librosa/ffmpeg...); ``None`` uses the
    deterministic fake so the distributed plumbing is testable here.

    Output: (id, n_bytes, modality, features: array<double>).
    """
    decode = decoder or _fake_decode
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("modality", StringType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    narrowed = df.select(id_col, binary_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "modality": batch_note,
                    "features": [
                        list(decode(bytes(p), feature_dim)) for p in payloads
                    ],
                }
            )

    return narrowed.mapInPandas(run, out_schema)


def resize_plumbing(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    target_h: int = 8,
    target_w: int = 8,
) -> DataFrame:
    """Image-style resize: decode-stub the binary payload to a square
    grayscale grid (side = floor(sqrt(n_bytes)), row-major uint8 — the
    deterministic no-codec stand-in, same stance as ``_fake_decode``),
    area-average down to (target_h, target_w), and re-encode the resized
    pixels as a binary payload. A real pipeline swaps the two marked lines
    for PIL decode/encode; batch shape, schema, and the binary-in /
    binary-out contract are the real, tested part.

    Output: (id, src_side, height, width, resized: binary).
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("src_side", LongType()),
            StructField("height", LongType()),
            StructField("width", LongType()),
            StructField("resized", BinaryType()),
        ]
    )
    narrowed = df.select(id_col, binary_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"ids": [], "side": [], "out": []}
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                side = int(np.sqrt(raw.size))
                if side == 0:
                    img = np.zeros((1, 1), dtype=np.float64)
                    side = 1
                else:
                    # decode stub: square crop of the byte stream
                    img = raw[: side * side].reshape(side, side).astype(np.float64)
                # area-average resize: mean over each target cell's source
                # box (edges by rounded proportional split — exact for
                # integer ratios, deterministic always)
                ys = np.linspace(0, img.shape[0], target_h + 1).round().astype(int)
                xs = np.linspace(0, img.shape[1], target_w + 1).round().astype(int)
                out = np.zeros((target_h, target_w), dtype=np.float64)
                for r in range(target_h):
                    for c in range(target_w):
                        cell = img[ys[r] : max(ys[r + 1], ys[r] + 1),
                                   xs[c] : max(xs[c + 1], xs[c] + 1)]
                        out[r, c] = cell.mean()
                rows["ids"].append(int(i))
                rows["side"].append(side)
                # encode stub: row-major uint8 bytes
                rows["out"].append(out.round().clip(0, 255).astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(rows["ids"], dtype="int64"),
                    "src_side": pd.Series(rows["side"], dtype="int64"),
                    "height": pd.Series([target_h] * len(rows["ids"]), dtype="int64"),
                    "width": pd.Series([target_w] * len(rows["ids"]), dtype="int64"),
                    "resized": rows["out"],
                }
            )

    return narrowed.mapInPandas(run, out_schema)


def frame_sample_plumbing(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame with a
    per-frame feature stub (byte-slice digest). Real codecs would replace
    the slicing; the fan-out shape (explode to frames) is the real part.

    Output: (id, frame_idx, frame_bytes, frame_digest).
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame_bytes", LongType()),
            StructField("frame_digest", DoubleType()),
        ]
    )
    narrowed = df.select(id_col, binary_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"ids": [], "idx": [], "nb": [], "dg": []}
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                for j, chunk in enumerate(np.array_split(arr, n_frames)):
                    rows["ids"].append(int(i))
                    rows["idx"].append(j)
                    rows["nb"].append(int(chunk.size))
                    rows["dg"].append(float(chunk.sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(rows["ids"], dtype="int64"),
                    "frame_idx": pd.Series(rows["idx"], dtype="int64"),
                    "frame_bytes": pd.Series(rows["nb"], dtype="int64"),
                    "frame_digest": pd.Series(rows["dg"], dtype="float64"),
                }
            )

    return narrowed.mapInPandas(run, out_schema)
