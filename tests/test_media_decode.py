"""Real BMP/WAV container decode (operators/multimodal.py,
decode_media_features): header parsing pinned against hand-built
containers — the DuckDB oracle for `media_decode` checks the payload
stats from text, so THIS file is what pins the struct parsing itself
(offsets, padding, row order, chunk walking, alignment) and the honest
NotImplementedError boundary for codec formats."""

from __future__ import annotations

import struct

import pytest

from loki_rs_spark.operators.multimodal import (
    build_bmp,
    build_wav,
    decode_media_features,
)


def test_bmp_roundtrip_basic():
    px = bytes(range(256)) * 3  # 16x16 24bpp
    got = decode_media_features(build_bmp(16, 16, px))
    assert got == {
        "format": "bmp",
        "dim_a": 16,
        "dim_b": 16,
        "bits": 24,
        "n_units": 768,
        "unit_sum": sum(px),
        "unit_min": 0,
        "unit_max": 255,
    }


def test_bmp_row_padding_excluded_from_stats():
    # width 3 at 8bpp: row stride pads 3 -> 4; pad bytes are 0x00 and must
    # NOT appear in the stats (min would drop to 0 if they leaked)
    px = bytes([10, 20, 30, 40, 50, 60])  # 3x2
    got = decode_media_features(build_bmp(3, 2, px, bpp=8))
    assert got["n_units"] == 6
    assert got["unit_min"] == 10 and got["unit_max"] == 60
    assert got["unit_sum"] == 210


def test_bmp_top_down_negative_height():
    px = bytes([1, 2, 3, 4] * 3)  # 2x2 24bpp
    down = decode_media_features(build_bmp(2, 2, px, top_down=True))
    up = decode_media_features(build_bmp(2, 2, px, top_down=False))
    # stats are row-order-free; the parser must handle both sign forms
    assert down["dim_b"] == up["dim_b"] == 2
    assert down["unit_sum"] == up["unit_sum"]


def test_bmp_truncated_pixels_raises():
    blob = build_bmp(4, 4, bytes(48))[:-8]
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        decode_media_features(blob)


def test_bmp_compressed_is_honest_stub():
    blob = bytearray(build_bmp(4, 4, bytes(48)))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compressed BMP"):
        decode_media_features(bytes(blob))


def test_wav_8bit_and_16bit():
    got8 = decode_media_features(build_wav(bytes([0, 128, 255])))
    assert (got8["bits"], got8["n_units"], got8["unit_sum"]) == (8, 3, 383)
    assert (got8["dim_a"], got8["dim_b"]) == (8000, 1)
    s16 = struct.pack("<4h", -32768, -1, 1, 32767)
    got16 = decode_media_features(
        build_wav(s16, sample_rate=44100, channels=2, bits=16)
    )
    assert (got16["bits"], got16["n_units"]) == (16, 4)
    assert got16["unit_min"] == -32768 and got16["unit_max"] == 32767
    assert got16["unit_sum"] == -1
    assert (got16["dim_a"], got16["dim_b"]) == (44100, 2)


def test_wav_chunk_walk_skips_unknown_and_handles_alignment():
    # LIST chunk with ODD length before fmt/data: the walker must skip it
    # via the word-alignment rule or fmt/data are misread
    base = build_wav(bytes([7, 9, 11]))
    fmt_and_data = base[12:]
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    body = extra + fmt_and_data
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got = decode_media_features(blob)
    assert got["n_units"] == 3 and got["unit_sum"] == 27


def test_wav_missing_data_chunk_raises():
    base = build_wav(bytes([1]))
    # keep RIFF/WAVE + fmt only
    fmt_end = 12 + 8 + 16
    blob = base[:4] + struct.pack("<I", fmt_end - 8) + base[8:fmt_end]
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_media_features(blob)


def test_wav_non_pcm_is_honest_stub():
    blob = bytearray(build_wav(bytes([1, 2])))
    struct.pack_into("<H", blob, 20, 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_media_features(bytes(blob))


def test_codec_magics_are_honest_stubs():
    with pytest.raises(NotImplementedError, match="PNG"):
        decode_media_features(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_media_features(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_media_features(b"????????" + b"\x00" * 32)


def test_media_decode_query_shape(spark):
    from .conftest import SF_SMALL
    from loki_rs_spark.queries import QUERIES

    rows = QUERIES["media_decode"](spark, SF_SMALL).collect()
    assert len(rows) == 64
    by_fmt = {r.format for r in rows}
    assert by_fmt == {"bmp", "wav"}
    for r in rows:
        if r.format == "bmp":
            assert (r.dim_a, r.dim_b, r.bits, r.n_units) == (16, 16, 24, 768)
        else:
            assert (r.dim_a, r.dim_b, r.bits) == (8000, 1, 8)
            assert 1 <= r.n_units <= 256
