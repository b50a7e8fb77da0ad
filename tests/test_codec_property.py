"""Property-based roundtrip tests for the native codecs: ANY image /
sample array / frame stack must survive encode -> decode bit-exactly.
Pure Python+numpy — no SparkSession needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from node_gedcom_graph_spark.operators.multimodal import (
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_ppm,
    encode_wav,
    encode_y4m,
)


@st.composite
def images(draw):
    h = draw(st.integers(1, 16))
    w = draw(st.integers(1, 16))
    data = draw(
        st.lists(st.integers(0, 255), min_size=h * w * 3, max_size=h * w * 3)
    )
    return np.array(data, dtype=np.uint8).reshape(h, w, 3)


@settings(max_examples=50, deadline=None)
@given(images())
def test_ppm_roundtrip(img):
    assert (decode_ppm(encode_ppm(img)) == img).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=2000),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, sr):
    v = np.array(samples, dtype=np.int16)
    out, got_sr, n_ch = decode_wav(encode_wav(v, sr))
    assert got_sr == sr and n_ch == 1
    assert (out == v).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 8),  # h
    st.integers(1, 8),  # w
    st.integers(1, 5),  # n frames
    st.integers(0, 255),  # seed value
)
def test_y4m_roundtrip(h, w, n, v0):
    frames = [
        ((np.arange(3 * h * w, dtype=np.int64) * (i + 1) + v0) % 256)
        .astype(np.uint8)
        .reshape(3, h, w)
        for i in range(n)
    ]
    back, gw, gh, (fn, fd) = decode_y4m(encode_y4m(frames, 25, 2))
    assert (gw, gh, fn, fd) == (w, h, 25, 2)
    assert len(back) == n
    assert all((a == b).all() for a, b in zip(back, frames))


def test_ppm_header_comments_and_whitespace():
    """Hand-built header with comments and multi-whitespace still
    parses (the header grammar, not just our own encoder's output)."""
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = b"P6\n# a comment\n  2  2\n# another\n255\n" + img.tobytes()
    assert (decode_ppm(payload) == img).all()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    ftype=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_all_filters(w, h, ftype, seed):
    """encode_png -> decode_png is the identity for arbitrary 8-bit
    truecolor rasters under EVERY PNG filter type (None/Sub/Up/
    Average/Paeth) — the unfilter math is exercised against its own
    inverse, not just against crafted fixtures."""
    import numpy as np

    from node_gedcom_graph_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img, ftype)) == img).all()


def test_png_rejects_unsupported_profiles():
    import numpy as np
    import pytest as _pytest

    from node_gedcom_graph_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img, 0))
    # corrupt a chunk CRC -> hard error, not silent wrong pixels
    payload[-5] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_png(bytes(payload))


@settings(deadline=None, max_examples=20)
@given(
    w8=st.integers(1, 3),
    h8=st.integers(1, 3),
    seed=st.integers(0, 10_000),
)
def test_jpeg_ones_quant_bounded_error(w8, h8, seed):
    """All-ones quant tables: the only losses are the YCbCr integer
    transform and DCT-coefficient rounding (±0.5 per coefficient →
    ≤4 per pixel); assert the decoded image sits within that bound of
    the pure color-transform roundtrip."""
    from node_gedcom_graph_spark.operators.multimodal import (
        JPEG_QUANT_ONES,
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h8 * 8, w8 * 8, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, JPEG_QUANT_ONES, JPEG_QUANT_ONES))
    ref = _ycbcr_to_rgb(_rgb_to_ycbcr(img))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - ref.astype(int)).max()) <= 4


@settings(deadline=None, max_examples=10)
@given(doc_id=st.integers(0, 100_000))
def test_jpeg_block_constant_exact(doc_id):
    """Constant 8x8 blocks have a DC-only DCT: with all-ones quant the
    decode must equal the YCbCr roundtrip EXACTLY (the invariant the
    multimodal_jpeg_features oracle relies on)."""
    from node_gedcom_graph_spark.operators.multimodal import (
        JPEG_QUANT_ONES,
        _block_constant_raster,
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
        decode_jpeg,
        encode_jpeg,
    )

    img = _block_constant_raster(doc_id)
    dec = decode_jpeg(encode_jpeg(img, JPEG_QUANT_ONES, JPEG_QUANT_ONES))
    assert np.array_equal(dec, _ycbcr_to_rgb(_rgb_to_ycbcr(img)))


def test_jpeg_annexk_smooth_image_low_error():
    """Annex-K (quality ~50) tables on a genuinely smooth image: the
    classic-JPEG regime, where error should stay small (this is NOT
    true for wrapping sawtooth gradients, whose discontinuities ring)."""
    from node_gedcom_graph_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    x, y = np.meshgrid(np.arange(16), np.arange(16))
    img = np.stack(
        [
            (64 + 4 * x).astype(np.uint8),
            (32 + 3 * y).astype(np.uint8),
            (100 + 2 * x + y).astype(np.uint8),
        ],
        axis=2,
    )
    dec = decode_jpeg(encode_jpeg(img))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 12


def test_jpeg_rejects_unsupported_profiles():
    from node_gedcom_graph_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        _block_constant_raster,
    )
    import pytest as _pytest

    enc = bytearray(encode_jpeg(_block_constant_raster(1)))
    # rewrite SOF0 (0xFFC0) to SOF2 (progressive) and expect the honest error
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with _pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(enc))
    with _pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(b"\x00\x01\x02")
