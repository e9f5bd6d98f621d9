"""Unit tests for the pure-stdlib PNG codec (functions/codecs.py) — the
first COMPRESSED codec the multimodal tier decodes for real (r16; the
Spark query it backs, q_multimodal_png, is banked for the r18 window and
oracle-compared every session in tests/test_preregistered.py).

Coverage: exact round-trip across geometries (including 1x1 and wide
rows), every scanline filter individually and mixed, multi-IDAT
reassembly, a hand-computed filtered-stream check (so the filter
arithmetic is pinned independently of the decoder), the strict error
paths (bad signature, truncation, CRC corruption, unsupported IHDR,
interlace, trailing bytes, bad filter byte, stream/geometry mismatch),
and — where the environment provides one — a real libpng-encoded file
decoded end-to-end (external-encoder cross-validation)."""

from __future__ import annotations

import glob
import struct
import zlib

import numpy as np
import pytest

from real_time_flight_data_pipeline_spark.functions.codecs import (
    png_decode,
    png_encode,
)


def _pseudo(seed: int, w: int, h: int) -> np.ndarray:
    j = np.arange(w * h * 3, dtype=np.int64)
    return ((seed * 13 + j * 17) % 256).astype(np.uint8).reshape(h, w, 3)


def test_roundtrip_geometries_and_default_filters():
    for seed in range(45):
        w, h = 8 + seed % 9, 5 + seed % 5
        px = _pseudo(seed, w, h)
        out, filters, n_idat = png_decode(png_encode(px))
        assert (out == px).all()
        # default filter schedule is y % 5 — h >= 5 means every payload
        # exercises all five reversals, read back from the wire
        assert filters == [y % 5 for y in range(h)]
        assert sorted(set(filters)) == [0, 1, 2, 3, 4]
        assert n_idat >= 2  # multi-IDAT reassembly always exercised


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_alone(f):
    px = _pseudo(7, 40, 7)
    out, filters, _ = png_decode(png_encode(px, row_filters=[f] * 7))
    assert (out == px).all()
    assert filters == [f] * 7


def test_roundtrip_degenerate_1x1():
    px = np.array([[[250, 3, 128]]], dtype=np.uint8)
    for f in range(5):
        out, filters, _ = png_decode(png_encode(px, row_filters=[f]))
        assert (out == px).all() and filters == [f]


def test_idat_split_granularity():
    px = _pseudo(3, 16, 9)
    one = png_encode(px, idat_split=1 << 20)
    tiny = png_encode(px, idat_split=7)
    out1, _, n1 = png_decode(one)
    out2, _, n2 = png_decode(tiny)
    assert n1 == 1 and n2 > n1
    assert (out1 == px).all() and (out2 == px).all()


def test_filtered_stream_hand_computed():
    """Pin the filter arithmetic independently of our own decoder: inflate
    the IDAT of a 2x2 image and compare against by-hand Sub/Up filtering
    per the PNG spec."""
    px = np.array(
        [[[10, 20, 30], [40, 60, 90]], [[15, 25, 35], [55, 85, 125]]],
        dtype=np.uint8,
    )
    data = png_encode(px, row_filters=[1, 2], idat_split=1 << 20)
    # chunk walk by hand: skip signature, IHDR (25 bytes), read IDAT body
    assert data[12:16] == b"IHDR"
    (idat_len,) = struct.unpack(">I", data[33:37])
    assert data[37:41] == b"IDAT"
    stream = zlib.decompress(data[41 : 41 + idat_len])
    # row 0, Sub: first pixel literal, second minus first (mod 256)
    row0 = bytes([1, 10, 20, 30, (40 - 10) % 256, (60 - 20) % 256, (90 - 30) % 256])
    # row 1, Up: each byte minus the byte above
    row1 = bytes([2, 5, 5, 5, 15, 25, 35])
    assert stream == row0 + row1


def test_error_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"notapng" + b"\x00" * 64)


def test_error_truncated():
    good = png_encode(_pseudo(1, 9, 6))
    with pytest.raises(ValueError, match="truncated"):
        png_decode(good[:-1])


def test_error_crc_corruption():
    good = bytearray(png_encode(_pseudo(2, 9, 6)))
    # flip a byte inside the first IDAT body (offset 41 = after sig+IHDR+len+tag)
    good[45] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(good))


def _patched_ihdr(good: bytes, field: int, value: int) -> bytes:
    """Rewrite one IHDR byte WITH a recomputed CRC (so the failure under
    test is the validation, not the checksum)."""
    body = bytearray(good[16:29])
    body[field] = value
    chunk = (
        struct.pack(">I", 13)
        + b"IHDR"
        + bytes(body)
        + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
    )
    return good[:8] + chunk + good[33:]


def test_error_unsupported_ihdr():
    good = png_encode(_pseudo(4, 9, 6))
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(_patched_ihdr(good, 12, 1))
    with pytest.raises(ValueError, match="color type 6"):
        png_decode(_patched_ihdr(good, 9, 6))
    with pytest.raises(ValueError, match="bit depth 16"):
        png_decode(_patched_ihdr(good, 8, 16))


def test_error_trailing_bytes():
    with pytest.raises(ValueError, match="trailing"):
        png_decode(png_encode(_pseudo(5, 9, 6)) + b"x")


def test_error_bad_filter_byte():
    px = _pseudo(6, 4, 2)
    h, w = 2, 4
    stream = bytearray(b"".join(
        bytes([0]) + px[y].tobytes() for y in range(h)
    ))
    stream[0] = 9  # invalid filter type on row 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    data = (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(stream)))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="filter 9"):
        png_decode(data)


def test_error_stream_geometry_mismatch():
    """A valid DEFLATE stream whose length disagrees with IHDR geometry
    must raise, not mis-reshape."""
    px = _pseudo(8, 4, 2)
    h = 2
    full = b"".join(bytes([0]) + px[y].tobytes() for y in range(h))
    short = zlib.compress(full[:-3])  # valid DEFLATE, 3 bytes shy of geometry
    ihdr = png_encode(px)[16:29]
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", short) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="filtered stream"):
        png_decode(data)


def test_decode_real_libpng_file_when_available():
    """External-encoder cross-validation: decode a PNG produced by a real
    encoder (libpng) if the environment ships one in our supported subset
    (8-bit RGB color type 2, non-interlaced). Every chunk CRC must verify,
    the inflated stream must match the IHDR geometry exactly, and the
    encoder-chosen filter schedule (libpng's per-row heuristic, not our
    y % 5) must reverse cleanly. Skipped when no such file exists."""
    candidates = []
    for root in (
        "/usr/share", "/usr/lib", "/opt",
        "/mnt/sandboxing/model_tools_env/v1/python/install",
    ):
        candidates += glob.glob(f"{root}/**/*.png", recursive=True)
        if len(candidates) > 3000:
            break
    for path in candidates:
        try:
            raw = open(path, "rb").read()
        except OSError:
            continue
        if raw[:8] != b"\x89PNG\r\n\x1a\n" or len(raw) < 33:
            continue
        w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", raw[16:29])
        if (depth, color, interlace) != (8, 2, 0):
            continue
        # Ancillary chunks after IEND (or nonstandard layouts) would trip
        # the strict trailing-bytes check; accept the file only if it
        # decodes, else keep scanning.
        try:
            px, filters, n_idat = png_decode(raw)
        except ValueError:
            continue
        assert px.shape == (h, w, 3)
        assert set(filters) <= {0, 1, 2, 3, 4}
        # a real encoder picked per-row filters; at least one adaptive
        # (non-None) filter should appear in any nontrivial photo
        assert n_idat >= 1
        return
    pytest.skip("no 8-bit RGB non-interlaced PNG found in the environment")


# ---------------------------------------------------------------------------
# Property-based (hypothesis): the codec must be the identity on ARBITRARY
# pixel content under ARBITRARY filter schedules and IDAT granularities —
# not just the structured pseudo-images the catalog query synthesizes.
# Pure-Python properties (no Spark), so examples are cheap.
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None, derandomize=True)
@given(data=st.data())
def test_roundtrip_arbitrary_content_property(data):
    w = data.draw(st.integers(1, 32), label="w")
    h = data.draw(st.integers(1, 24), label="h")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    split = data.draw(st.integers(1, 4096), label="idat_split")
    out, echoed, n_idat = png_decode(png_encode(px, row_filters=filters,
                                                idat_split=split))
    assert (out == px).all()
    assert echoed == filters
    assert n_idat >= 1


# ---------------------------------------------------------------------------
# Grayscale (color type 0) — bpp=1 through the same filter machinery.
# ---------------------------------------------------------------------------
def test_grayscale_roundtrip_all_filters():
    px = ((np.arange(9 * 13) * 31) % 256).astype(np.uint8).reshape(9, 13)
    for f in range(5):
        out, filters, _ = png_decode(png_encode(px, row_filters=[f] * 9))
        assert out.shape == (9, 13)
        assert (out == px).all() and filters == [f] * 9
    out, filters, _ = png_decode(png_encode(px))  # mixed y % 5 schedule
    assert (out == px).all() and filters == [y % 5 for y in range(9)]


def test_grayscale_external_file_when_available():
    """A real grayscale PNG from an external encoder, if the environment
    ships one (same opportunistic contract as the RGB cross-check)."""
    for root in (
        "/usr/share", "/usr/lib", "/opt",
        "/mnt/sandboxing/model_tools_env/v1/python/install",
    ):
        for path in glob.glob(f"{root}/**/*.png", recursive=True)[:3000]:
            try:
                raw = open(path, "rb").read()
            except OSError:
                continue
            if raw[:8] != b"\x89PNG\r\n\x1a\n" or len(raw) < 33:
                continue
            w, h, depth, color, _, _, inter = struct.unpack(">IIBBBBB", raw[16:29])
            if (depth, color, inter) != (8, 0, 0):
                continue
            try:
                px, filters, _ = png_decode(raw)
            except ValueError:
                continue
            assert px.shape == (h, w)
            assert set(filters) <= {0, 1, 2, 3, 4}
            return
    pytest.skip("no 8-bit grayscale non-interlaced PNG in the environment")


@settings(max_examples=25, deadline=None, derandomize=True)
@given(data=st.data())
def test_grayscale_roundtrip_arbitrary_content_property(data):
    w = data.draw(st.integers(1, 40), label="w")
    h = data.draw(st.integers(1, 20), label="h")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    out, echoed, _ = png_decode(png_encode(px, row_filters=filters))
    assert out.shape == (h, w) and (out == px).all()
    assert echoed == filters
