"""Pure-Python PNG codec tests (no Ray needed except the stage test):
roundtrip across shapes/filters, CRC/truncation failure modes, planted
payload parity with the closed form the SQL oracle mirrors."""

import numpy as np
import pytest

from fetch_engines_ray.ops.png import (
    PngFormatError,
    decode_png,
    decode_png_header,
    encode_png,
    planted_pixels,
    planted_png,
    planted_png_for_ref,
)


def test_roundtrip_grey_all_filters():
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (5, 7), (9, 4), (13, 13), (3, 64)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for filters in [None, [0], [1], [2], [3], [4], [4, 3, 2, 1, 0]]:
            dec = decode_png(encode_png(px, row_filters=filters))
            assert dec["bit_depth"] == 8 and dec["color_type"] == 0
            assert np.array_equal(dec["pixels"], px), (shape, filters)


def test_roundtrip_rgb():
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    dec = decode_png(encode_png(px))
    assert dec["color_type"] == 2
    assert np.array_equal(dec["pixels"], px)


def test_header_only_path():
    px = np.zeros((9, 13), dtype=np.uint8)
    h = decode_png_header(encode_png(px))
    assert (h["width"], h["height"], h["bit_depth"], h["color_type"]) == (13, 9, 8, 0)


def test_crc_corruption_raises():
    data = bytearray(encode_png(np.arange(20, dtype=np.uint8).reshape(4, 5)))
    data[-5] ^= 0xFF  # flip a bit in the IEND CRC
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(data))
    data2 = bytearray(encode_png(np.arange(20, dtype=np.uint8).reshape(4, 5)))
    data2[40] ^= 0x01  # flip a bit inside IDAT payload
    with pytest.raises(PngFormatError):
        decode_png(bytes(data2))


def test_truncation_and_bad_signature_raise():
    data = encode_png(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(PngFormatError):
        decode_png(data[: len(data) // 2])
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"not a png at all...." + data)


def test_planted_matches_closed_form():
    for key in [0, 1, 5, 77, 499, 12345, 2**31 - 1]:
        px = planted_pixels(key)
        assert px.shape == (3 + key % 7, 4 + key % 13)
        dec = decode_png(planted_png(key))
        assert np.array_equal(dec["pixels"], px)


def test_planted_ref_resolver_deterministic():
    a = planted_png_for_ref("media://doc0000000001/2")
    b = planted_png_for_ref("media://doc0000000001/2")
    c = planted_png_for_ref("media://doc0000000001/3")
    assert a == b and a != c
    decode_png(a)  # valid PNG


def test_png_decoder_stage(ray_session):
    import pyarrow as pa

    import ray.data

    from fetch_engines_ray.ops.multimodal import PngDecoder, letterbox, resample_nearest

    ids = [0, 7, 123]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array([planted_png(i) for i in ids], type=pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(PngDecoder, batch_format="pyarrow", batch_size=8, concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in out.iterrows():
        px = planted_pixels(int(r["doc_id"]))
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["pixel_sum"] == int(px.astype(np.int64).sum())
        rw, rh = letterbox(px.shape[1], px.shape[0], 224, 224)
        assert (r["resized_width"], r["resized_height"]) == (rw, rh)
        resized = resample_nearest(px, rw, rh)
        assert resized.shape == (rh, rw)
        assert r["resized_pixel_sum"] == int(resized.astype(np.int64).sum())


def test_resample_nearest_kernel():
    from fetch_engines_ray.ops.multimodal import resample_nearest

    # identity: same-size resample returns the image unchanged
    px = planted_pixels(42)
    h, w = px.shape
    assert np.array_equal(resample_nearest(px, w, h), px)
    # known 2x upscale of a 2x2: pixel-center mapping picks
    # src = ((2*dst+1)*2)//(2*2) = dst//... -> [0,0,1,1] per axis
    small = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    up = resample_nearest(small, 4, 4)
    assert np.array_equal(
        up,
        np.array(
            [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
            dtype=np.uint8,
        ),
    )
    # downscale 4x4 -> 2x2 picks the pixel-center sources (indices 1,3)
    grid = np.arange(16, dtype=np.uint8).reshape(4, 4)
    down = resample_nearest(grid, 2, 2)
    assert np.array_equal(down, np.array([[5, 7], [13, 15]], dtype=np.uint8))
    # RGB (h, w, 3) shape passes through the same gather
    rgb = np.stack([grid, grid + 100, grid + 200], axis=-1)
    down_rgb = resample_nearest(rgb, 2, 2)
    assert down_rgb.shape == (2, 2, 3)
    assert np.array_equal(down_rgb[..., 0], down)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        rgb=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    )
    def test_roundtrip_fuzz(w, h, rgb, seed, filters):
        rng = np.random.RandomState(seed)
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        dec = decode_png(encode_png(px, row_filters=filters))
        assert np.array_equal(dec["pixels"], px)

    @settings(max_examples=40, deadline=None)
    @given(data=st.binary(min_size=0, max_size=400))
    def test_decode_garbage_never_crashes_unpredictably(data):
        """Arbitrary bytes either raise PngFormatError or decode cleanly
        — no other exception type escapes the codec."""
        try:
            decode_png(data)
        except PngFormatError:
            pass

except ImportError:  # pragma: no cover - hypothesis is present in this env
    pass


def test_ancillary_chunks_are_skipped():
    """Real-world PNGs carry tEXt/pHYs/etc. — the chunk walk must skip
    unknown (CRC-valid) chunks and still decode the pixel data."""
    import struct
    import zlib as _zlib

    px = np.arange(30, dtype=np.uint8).reshape(5, 6)
    data = encode_png(px)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 8 + 13 + 4
    payload = b"Comment\x00synthetic"
    text_chunk = (
        struct.pack(">I", len(payload))
        + b"tEXt"
        + payload
        + struct.pack(">I", _zlib.crc32(b"tEXt" + payload) & 0xFFFFFFFF)
    )
    spliced = data[:ihdr_end] + text_chunk + data[ihdr_end:]
    dec = decode_png(spliced)
    assert np.array_equal(dec["pixels"], px)
    # but a CORRUPT ancillary chunk still fails the CRC wall
    bad = bytearray(spliced)
    bad[ihdr_end + 9] ^= 0xFF
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(bad))
