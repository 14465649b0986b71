"""Multimodal column plumbing (training-data pipeline surface).

Images/audio/video are carried as opaque `binary` columns with typed
metadata, processed via `mapInPandas` so each Arrow batch of blobs is
decoded/featurized in one vectorized call. The decode kernels themselves
are STUBBED in this container (no image/audio libs): `decode_image_stub`
raises NotImplementedError unless `deterministic_fake=True`, which derives
a fake fixed-shape feature vector from the blob bytes — the Spark-side
plumbing (schema, batch iteration, partitioning, output shape) is real and
tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, width int, height int, content binary"
)
FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, feature array<float>"
)

FEATURE_DIM = 8


def decode_image_stub(blob: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """Placeholder for a real image decode (PIL/libvips not installed).
    With deterministic_fake, derives an 8-dim unit-norm feature from the
    sha256 of the bytes — stable across runs and executors."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; pass deterministic_fake=True for the test path"
        )
    digest = hashlib.sha256(blob).digest()
    vec = np.frombuffer(digest[: FEATURE_DIM * 4], dtype=np.uint32).astype(
        np.float64
    )
    norm = np.linalg.norm(vec)
    return (vec / norm if norm else vec).astype(np.float32)


FEATURE_RAW_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, feature array<bigint>"
)


def feature_basis_u32(blob: bytes) -> list[int]:
    """The exact-integer basis of the fake feature: 8 little-endian uint32
    words of sha256(blob). Integer-exact, so the DuckDB oracle can compute
    it bit-identically (the normalized float form cannot be reproduced
    bit-exactly in SQL: numpy's norm uses pairwise summation)."""
    import struct

    digest = hashlib.sha256(blob).digest()
    return list(struct.unpack("<8I", digest[: FEATURE_DIM * 4]))


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, raw_u32: bool = False
) -> DataFrame:
    """mapInPandas featurization: one pandas batch of blobs per call, one
    fixed-dim feature vector per blob. Partitioning passes through — at
    scale, repartition upstream so blob batches fit executor memory
    (binary columns dominate `spark.sql.files.maxPartitionBytes` math).
    With raw_u32, emits the exact-integer feature basis instead of the
    normalized float vector (the oracle-checkable form)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if raw_u32:
                feats = [feature_basis_u32(b) for b in pdf["content"]]
            else:
                feats = [
                    decode_image_stub(
                        b, deterministic_fake=deterministic_fake
                    ).tolist()
                    for b in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].str.len().astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(
        featurize, FEATURE_RAW_SCHEMA if raw_u32 else FEATURE_SCHEMA
    )


FRAME_SCHEMA = (
    "media_id bigint, kind string, frame_idx int, frame_off int, "
    "frame_len int, frame binary"
)


def sample_frames(
    media: DataFrame,
    frame_size: int = 32,
    stride: int = 64,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling over opaque media blobs: 1 blob row -> up to
    `max_frames` frame rows, each a `frame_size`-byte slice taken every
    `stride` bytes from offset 0 (the video frame-sample / image tile
    analog; a real container demuxer would replace the byte slicing, the
    Spark plumbing is identical). Runs as mapInPandas so each Arrow batch
    of blobs explodes in one vectorized call and never round-trips the
    full blob per frame through a join. The final frame truncates at the
    blob end; a blob shorter than one stride still yields its (possibly
    short) frame 0; an empty blob yields no rows.

    At 100 TB scale this is a narrow map-side explode: output rows carry
    only the sliced bytes (≤ frame_size each), not the parent blob, so
    downstream shuffle volume is bounded by frames × frame_size rather
    than blob size. Partitioning passes through from the media scan.
    """
    if frame_size <= 0 or stride <= 0 or max_frames <= 0:
        raise ValueError("frame_size, stride, max_frames must be positive")

    def slice_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            kinds: list = []
            idxs: list = []
            offs: list = []
            lens: list = []
            frames: list = []
            for mid, kind, blob in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                n = len(blob)
                for i in range(max_frames):
                    off = i * stride
                    if off >= n:
                        break
                    chunk = bytes(blob[off : off + frame_size])
                    ids.append(mid)
                    kinds.append(kind)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(len(chunk))
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(kinds, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    # prune to the consumed columns so only they cross the Arrow boundary
    return media.select("media_id", "kind", "content").mapInPandas(
        slice_frames, FRAME_SCHEMA
    )


RESIZE_SCHEMA = (
    "media_id bigint, kind string, out_w int, out_h int, resized binary"
)


def resize_media(
    media: DataFrame, src_w: int = 16, src_h: int = 16, factor: int = 2
) -> DataFrame:
    """2D block-average downsample (the image-resize analog): the blob is
    interpreted as a row-major src_h x src_w grid of unsigned bytes
    (padded with 0x20 / truncated to fit — a real decoder would supply the
    grid), pooled `factor` x `factor` with integer floor-division, and
    re-emitted as a (src_h/factor) x (src_w/factor) byte blob. Integer
    arithmetic end to end, so the DuckDB oracle reproduces it bit-exactly.

    Vectorized: one numpy reshape + strided adds per Arrow batch, no
    per-pixel Python. Output rows shrink by factor^2, so this is a
    map-side reducer of data volume — the shape you want upstream of a
    shuffle at 100 TB.
    """
    if src_w % factor or src_h % factor:
        raise ValueError("src dims must be divisible by factor")
    npix = src_w * src_h

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list = []
            for blob in pdf["content"]:
                b = bytes(blob)[:npix].ljust(npix, b"\x20")
                a = np.frombuffer(b, dtype=np.uint8).reshape(src_h, src_w)
                a = a.astype(np.int32)
                pooled = sum(
                    a[r::factor, c::factor]
                    for r in range(factor)
                    for c in range(factor)
                ) // (factor * factor)
                out.append(pooled.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_w": np.int32(src_w // factor),
                    "out_h": np.int32(src_h // factor),
                    "resized": pd.Series(out, dtype="object"),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        pool, RESIZE_SCHEMA
    )


def synthetic_media(spark, sf_dir: str, limit: int = 64) -> DataFrame:
    """Deterministic fake media table: blob = utf-8 bytes of document text
    (an opaque byte payload as far as the pipeline is concerned). Selected
    by doc_id predicate, NOT .limit(): limit over a multi-split scan picks
    arbitrary rows, a predicate is deterministic at any scale."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < limit
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.col("text").cast("binary").alias("content"),
    )
