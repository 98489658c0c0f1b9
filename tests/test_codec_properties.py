"""Property-based tests (hypothesis) for the pure-Python codec helpers:
encode→decode roundtrips hold for arbitrary shapes/widths/channels, and
the decoders never misdispatch or read past a declared raster."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from chicago_crime_spark_ml_spark.operators.multimodal import (
    decode_netpbm,
    decode_wav,
)
from tests.test_real_codecs import make_pgm, make_ppm, make_wav


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    nch=st.integers(min_value=1, max_value=4),
    width=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, nch, width, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.95, 0.95, size=(n, nch))
    got = decode_wav(make_wav(x, width=width, nch=nch))
    assert got.shape == (n,)
    # truncating quantizer at scale 2^(8w-1)-1, decoder divides 2^(8w-1)
    assert np.abs(got - x.mean(axis=1)).max() < 2.0 / 2 ** (8 * width - 1)


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    maxval=st.sampled_from([255, 1023, 65535]),
    rgb=st.booleans(),
    comment=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_netpbm_roundtrip_property(h, w, maxval, rgb, comment, seed):
    rng = np.random.default_rng(seed)
    if rgb:
        pix = rng.integers(0, maxval + 1, size=(h, w, 3))
        blob = make_ppm(pix, maxval=maxval)
        expect = pix / maxval
    else:
        pix = rng.integers(0, maxval + 1, size=(h, w))
        blob = make_pgm(pix, maxval=maxval, comment=comment)
        expect = (pix / maxval)[:, :, None]
    got = decode_netpbm(blob)
    assert got.shape == (h, w, 3 if rgb else 1)
    assert np.allclose(got, expect)
    # trailing junk after a complete raster must not change the decode
    assert np.allclose(decode_netpbm(blob + b"junk"), expect)


@settings(max_examples=100, deadline=None)
@given(prefix=st.binary(min_size=0, max_size=16))
def test_decoders_dispatch_none_on_foreign_magic(prefix):
    # anything not starting with the exact magic returns None (dispatch),
    # never a spurious decode or an index error
    if prefix[:2] not in (b"P5", b"P6"):
        assert decode_netpbm(prefix) is None
    if not (prefix[:4] == b"RIFF" and prefix[8:12] == b"WAVE"):
        assert decode_wav(prefix) is None


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=9000),
    bps=st.sampled_from([8, 16]),
    kind=st.sampled_from(["random", "smooth", "constant", "steps"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_flac_roundtrip_property(n, bps, kind, seed):
    """FLAC is lossless: decode(encode(x)) equals the quantized input
    BIT-EXACTLY for arbitrary lengths (crossing frame boundaries at
    4096), both sample widths, and signal shapes that exercise every
    subframe type (CONSTANT / FIXED orders / Rice escape)."""
    from chicago_crime_spark_ml_spark.operators.flac import (
        decode_flac_meta,
        encode_flac,
    )

    rng = np.random.default_rng(seed)
    if kind == "random":
        x = rng.uniform(-1, 1, size=n)
    elif kind == "smooth":
        x = np.sin(np.linspace(0, 7, n)) * 0.8
    elif kind == "constant":
        x = np.full(n, rng.uniform(-1, 1))
    else:
        x = np.repeat(rng.uniform(-1, 1, size=max(1, n // 16 + 1)), 16)[:n]
    dec, rate = decode_flac_meta(encode_flac(x, bps=bps, rate=8000))
    assert rate == 8000
    scale = (1 << (bps - 1)) - 1
    expect = np.trunc(np.clip(x, -1, 1) * scale) / float(1 << (bps - 1))
    assert np.array_equal(dec, expect)
