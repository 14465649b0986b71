"""Frame-sampling operator (multimodal plumbing): blob -> frame rows.

Mirrors the reference's treatment of opaque payloads (scan in bounded
chunks, reference /root/reference/src/filesystem_scan.rs chunked-read
semantics): the frame sampler slices fixed-size windows at a stride and
never re-materializes the parent blob downstream.
"""

from __future__ import annotations

import hashlib

from loki_rs_spark.operators.multimodal import (
    FRAME_SCHEMA,
    sample_frames,
    synthetic_media,
)

from .conftest import SF_SMALL


def _media_df(spark, blobs):
    rows = [
        (i, "image" if i % 2 == 0 else "audio", 64, 64, blob)
        for i, blob in enumerate(blobs)
    ]
    return spark.createDataFrame(
        rows, "media_id bigint, kind string, width int, height int, content binary"
    )


def test_frames_match_python_slicing(spark):
    blobs = [bytes(range(200)), b"x" * 300, b"abc"]
    out = sample_frames(
        _media_df(spark, blobs), frame_size=32, stride=64, max_frames=4
    ).collect()
    got = {
        (r.media_id, r.frame_idx): (r.frame_off, r.frame_len, bytes(r.frame))
        for r in out
    }
    expect = {}
    for mid, blob in enumerate(blobs):
        for i in range(4):
            off = i * 64
            if off >= len(blob):
                break
            chunk = blob[off : off + 32]
            expect[(mid, i)] = (off, len(chunk), chunk)
    assert got == expect


def test_empty_blob_yields_no_rows(spark):
    out = sample_frames(_media_df(spark, [b""]), frame_size=8, stride=8).collect()
    assert out == []


def test_short_blob_truncates_final_frame(spark):
    out = sample_frames(
        _media_df(spark, [b"0123456789"]), frame_size=8, stride=8, max_frames=4
    ).collect()
    by_idx = {r.frame_idx: r for r in out}
    assert set(by_idx) == {0, 1}
    assert (by_idx[0].frame_len, bytes(by_idx[0].frame)) == (8, b"01234567")
    assert (by_idx[1].frame_len, bytes(by_idx[1].frame)) == (2, b"89")


def test_max_frames_caps_long_blob(spark):
    out = sample_frames(
        _media_df(spark, [b"z" * 10_000]), frame_size=4, stride=16, max_frames=3
    ).collect()
    assert sorted(r.frame_idx for r in out) == [0, 1, 2]


def test_invalid_params_raise(spark):
    import pytest

    df = _media_df(spark, [b"abc"])
    for kw in ({"frame_size": 0}, {"stride": -1}, {"max_frames": 0}):
        with pytest.raises(ValueError):
            sample_frames(df, **kw)


def test_resize_matches_numpy_reference(spark):
    import numpy as np

    from loki_rs_spark.operators.multimodal import resize_media

    blob = bytes((i * 7 + 13) % 95 + 32 for i in range(256))
    out = resize_media(
        _media_df(spark, [blob]), src_w=16, src_h=16, factor=2
    ).collect()
    assert len(out) == 1 and (out[0].out_w, out[0].out_h) == (8, 8)
    a = np.frombuffer(blob, dtype=np.uint8).reshape(16, 16).astype(int)
    want = (
        (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]) // 4
    ).astype(np.uint8).tobytes()
    assert bytes(out[0].resized) == want


def test_resize_pads_and_truncates(spark):
    from loki_rs_spark.operators.multimodal import resize_media

    short, long = b"A" * 10, b"B" * 500
    out = {
        r.media_id: bytes(r.resized)
        for r in resize_media(
            _media_df(spark, [short, long]), src_w=16, src_h=16, factor=2
        ).collect()
    }
    # short blob: rows beyond the padded 'A's pool to the 0x20 pad value
    assert len(out[0]) == 64 and out[0][-1] == 0x20
    # truncation: only the first 256 'B's participate, all pools = ord('B')
    assert out[1] == bytes([ord("B")]) * 64


def test_resize_rejects_indivisible_dims(spark):
    import pytest

    from loki_rs_spark.operators.multimodal import resize_media

    with pytest.raises(ValueError):
        resize_media(_media_df(spark, [b"x"]), src_w=15, src_h=16, factor=2)


def test_frames_over_synthetic_media_digests(spark):
    """End-to-end over the parquet-backed synthetic media table: sha256 of
    each emitted frame equals sha256 of the corresponding blob slice."""
    media = synthetic_media(spark, SF_SMALL, limit=8)
    blobs = {r.media_id: bytes(r.content) for r in media.collect()}
    frames = sample_frames(media, frame_size=32, stride=64, max_frames=4)
    assert frames.schema.simpleString() == (
        "struct<" + FRAME_SCHEMA.replace(" bigint", ":bigint")
        .replace(" string", ":string")
        .replace(" int", ":int")
        .replace(" binary", ":binary")
        .replace(", ", ",") + ">"
    )
    for r in frames.collect():
        want = blobs[r.media_id][r.frame_off : r.frame_off + 32]
        assert bytes(r.frame) == want
        assert hashlib.sha256(bytes(r.frame)).hexdigest() == hashlib.sha256(want).hexdigest()
