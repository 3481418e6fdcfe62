"""Property-based codec tests (hypothesis): random-image roundtrips for
every stdlib codec — BMP and PNG (exact for all inputs), GIF (exact
whenever <=256 distinct colors), JPEG (exact on the block-constant
lossless domain; bounded error elsewhere with the all-ones quant table).
Complements the golden-byte/spec tests in test_media_codec.py with
adversarial shapes: 1-pixel images, single-row/column strips, palette
edge sizes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cliner_spark.multimodal import (
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    encode_bmp,
    encode_gif,
    encode_jpeg,
    encode_png,
)

_dims = st.tuples(st.integers(1, 17), st.integers(1, 13))


def _pixels(seed: int, w: int, h: int, n_colors: int) -> bytes:
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=w * h)
    return pal[idx].tobytes()


@settings(max_examples=25, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(dims, seed):
    w, h = dims
    rgb = _pixels(seed, w, h, 200)
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1), st.integers(0, 4))
def test_png_roundtrip_property(dims, seed, filt):
    w, h = dims
    rgb = _pixels(seed, w, h, 200)
    assert decode_png(encode_png(w, h, rgb, filter_type=filt)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1), st.sampled_from([1, 2, 3, 17, 255, 256]))
def test_gif_roundtrip_property(dims, seed, n_colors):
    w, h = dims
    rgb = _pixels(seed, w, h, n_colors)
    assert decode_gif(encode_gif(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=15, deadline=None)
@given(
    st.tuples(st.integers(1, 3), st.integers(1, 3)),
    st.integers(0, 2**31 - 1),
)
def test_jpeg_exact_on_block_constant_property(dims, seed):
    wb, hb = dims
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(hb, wb, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    w, h = wb * 8, hb * 8
    rgb = img.tobytes()
    assert decode_jpeg(encode_jpeg(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=10, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1))
def test_jpeg_bounded_error_property(dims, seed):
    """All-ones quant: decoded pixels within +-2 of the original for ANY
    image (float DCT/IDCT rounding is the only loss in RGB mode)."""
    w, h = dims
    rgb = _pixels(seed, w, h, 256)
    w2, h2, dec = decode_jpeg(encode_jpeg(w, h, rgb))
    assert (w2, h2) == (w, h)
    err = np.abs(
        np.frombuffer(dec, dtype=np.uint8).astype(int)
        - np.frombuffer(rgb, dtype=np.uint8).astype(int)
    )
    assert err.max() <= 2, err.max()
