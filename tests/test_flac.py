"""FLAC codec (operators/flac.py): bit-exact lossless roundtrips,
dispatch, corruption rejection, and Spark-operator integration."""

from __future__ import annotations

import numpy as np
import pytest

from chicago_crime_spark_ml_spark.operators.flac import (
    decode_flac_meta,
    encode_flac,
)
from chicago_crime_spark_ml_spark.operators.multimodal import (
    decode_audio_meta,
    encode_wav,
)


def _quant(x, bps):
    scale = (1 << (bps - 1)) - 1
    return np.trunc(np.clip(np.asarray(x, dtype=np.float64), -1, 1) * scale) / float(
        1 << (bps - 1)
    )


@pytest.mark.parametrize("bps", [8, 16])
def test_flac_roundtrip_bit_exact(bps):
    rng = np.random.default_rng(11)
    signals = {
        "random": rng.uniform(-0.99, 0.99, 600),
        "constant": np.full(257, -0.5),
        "smooth": np.sin(np.linspace(0, 9, 5000)) * 0.7,  # crosses frames
        "extremes": np.tile([1.0, -1.0, 0.0], 40),
        "tiny": np.array([0.25]),
        "empty": np.array([]),
        "step": np.where(np.arange(300) < 150, 0.1, -0.9),
    }
    for name, x in signals.items():
        blob = encode_flac(x, bps=bps, rate=16000)
        dec, rate = decode_flac_meta(blob)
        assert rate == 16000
        assert np.array_equal(dec, _quant(x, bps)), (name, bps)


def test_flac_equals_wav_decoded_samples():
    """Lossless means FLAC and WAV encodings of one signal decode to
    the SAME dyadic rationals — the property that lets one closed-form
    oracle certify both codecs."""
    x = np.sin(np.linspace(0, 5, 400)) * 0.8
    fdec, frate = decode_flac_meta(encode_flac(x, bps=16, rate=8000))
    wdec, wrate = decode_audio_meta(encode_wav(x, width=2, rate=8000))
    assert frate == wrate == 8000
    assert np.array_equal(fdec, wdec)


def test_flac_compresses_smooth_signals():
    x = np.sin(np.linspace(0, 9, 4000)) * 0.7
    blob = encode_flac(x, bps=16)
    assert len(blob) < 0.25 * (2 * x.size)  # well under raw PCM


def test_flac_dispatch_and_magic():
    blob = encode_flac(np.array([0.1, 0.2]), bps=16)
    assert blob[:4] == b"fLaC"
    assert decode_flac_meta(b"not flac") is None
    # decode_audio_meta dispatches: WAV blobs bypass the FLAC branch
    assert decode_audio_meta(blob) is not None
    assert decode_audio_meta(b"RIFFxxxx????") is None  # neither codec


def test_flac_rejects_corruption():
    x = np.sin(np.linspace(0, 3, 300)) * 0.5
    good = encode_flac(x, bps=16)
    # flip one bit in the frame payload: CRC-16 (or MD5) must catch it
    bad = bytearray(good)
    bad[len(bad) - 10] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac_meta(bytes(bad))
    # truncation raises the named error, never struct/IndexError
    for cut in (5, 20, 41, len(good) - 3):
        with pytest.raises(ValueError):
            decode_flac_meta(good[:cut])


def test_flac_through_spark_operators(spark):
    from chicago_crime_spark_ml_spark.operators.multimodal import (
        audio_window_envelope,
        synthesize_flac_blobs,
        transcode_audio,
        wav_metadata,
    )

    x = [float(v) for v in np.sin(np.linspace(0, 4, 200)) * 0.6]
    df = spark.createDataFrame(
        [(1, x)], "doc_id long, samples array<double>"
    )
    blobs = synthesize_flac_blobs(df, bps=16, rate=8000)
    row = blobs.collect()[0]
    assert bytes(row.blob)[:4] == b"fLaC"

    meta = wav_metadata(blobs).collect()[0]  # dispatches to FLAC now
    assert meta.n_samples == 200 and meta.framerate_hz == 8000

    # envelope over FLAC blobs == envelope over WAV blobs (lossless)
    env_f = audio_window_envelope(
        blobs, window_samples=256, decode_stub=False
    ).collect()[0]
    wav_df = spark.createDataFrame(
        [(1, bytearray(encode_wav(x, width=2, rate=8000)))],
        "doc_id long, blob binary",
    )
    env_w = audio_window_envelope(
        wav_df, window_samples=256, decode_stub=False
    ).collect()[0]
    assert env_f.rms == env_w.rms and env_f.peak == env_w.peak

    # FLAC in -> WAV out, and FLAC out roundtrips with resampling
    wav_out = transcode_audio(blobs, width=2).collect()[0]
    assert bytes(wav_out.blob)[:4] == b"RIFF"
    flac_out = transcode_audio(
        wav_df, width=2, rate=16000, out_format="flac"
    ).collect()[0]
    dec, rate = decode_flac_meta(bytes(flac_out.blob))
    assert rate == 16000 and dec.size == 399  # 2n-1: real resampling
    with pytest.raises(ValueError, match="widths 1 and 2"):
        transcode_audio(wav_df, width=3, out_format="flac")


def test_trim_silence_edges(spark):
    from chicago_crime_spark_ml_spark.operators.flac import encode_flac
    from chicago_crime_spark_ml_spark.operators.multimodal import (
        decode_wav_meta,
        encode_wav,
        trim_silence,
    )

    sig = [0.0, 0.0, 0.5, 0.0, -0.7, 0.0]  # interior silence survives
    rows = [
        (1, bytearray(encode_wav(sig, width=2, rate=8000))),
        (2, bytearray(encode_flac(sig, bps=16, rate=8000))),  # FLAC in
        (3, bytearray(encode_wav([0.0] * 5, width=2))),       # all silent
        (4, bytearray(encode_wav([0.9], width=2))),           # no padding
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, blob BINARY")
    got = {r.doc_id: r for r in trim_silence(df).collect()}
    for did in (1, 2):  # WAV and FLAC inputs agree
        r = got[did]
        assert (r.n_leading_trimmed, r.n_trailing_trimmed, r.n_samples) == (2, 1, 3)
        dec, rate = decode_wav_meta(bytes(r.blob))
        assert rate == 8000 and dec.size == 3 and dec[1] == 0.0  # interior kept
    assert (got[3].n_samples, got[3].n_leading_trimmed) == (0, 5)
    assert decode_wav_meta(bytes(got[3].blob))[0].size == 0
    assert (got[4].n_samples, got[4].n_leading_trimmed,
            got[4].n_trailing_trimmed) == (1, 0, 0)


def _handbuilt_stream(nch, bps, total, frame_body_fn):
    """Minimal fLaC container around one hand-built frame: STREAMINFO
    with zero MD5 (skips verification), then frame_body_fn(head) which
    must return the complete frame bytes (header+subframes+CRC16)."""
    import struct

    from chicago_crime_spark_ml_spark.operators.flac import _BitWriter

    si = _BitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.align()
    body = si.getvalue() + b"\x00" * 16  # zero MD5: skip check
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(ch_code, bps, blocksize):
    import struct

    from chicago_crime_spark_ml_spark.operators.flac import (
        _BPS_CODE,
        _BitWriter,
        _crc8,
        _utf8_code,
    )

    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0b0111, 4)  # 16-bit blocksize-1 at header end
    bw.write(0b0000, 4)  # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(_BPS_CODE[bps], 3)
    bw.write(0, 1)
    bw.align()
    head = bytearray(bw.getvalue())
    head += _utf8_code(0)
    head += struct.pack(">H", blocksize - 1)
    head.append(_crc8(bytes(head)))
    return head


def _write_verbatim(bw, samples, ebps):
    bw.write(0, 1)
    bw.write(0b000001, 6)  # VERBATIM
    bw.write(0, 1)
    for s in samples:
        bw.write(int(s) & ((1 << ebps) - 1), ebps)


def _write_raw_residual(bw, resid, raw_bits):
    bw.write(0b00, 2)   # RICE method
    bw.write(0, 4)      # partition order 0
    bw.write(0b1111, 4)  # escape
    bw.write(raw_bits, 5)
    for r in resid:
        bw.write(int(r) & ((1 << raw_bits) - 1), raw_bits)


def test_lpc_subframe_decode():
    """Hand-built LPC order-2 frame: x[i] = ((c0 x[i-1] + c1 x[i-2])
    >> shift) + r[i] must reconstruct exactly (external FLAC corpora
    are mostly LPC-encoded — r8 decode-side support)."""
    import struct

    from chicago_crime_spark_ml_spark.operators.flac import (
        _BitWriter,
        _crc16,
        decode_flac_meta,
    )

    bps, n = 16, 16
    warm = [1000, -800]
    coefs = [3, -2]          # precision 4 bits fits [-8, 7]
    shift = 1
    resid = [(-1) ** i * (i % 5) for i in range(n - 2)]
    expect = list(warm)
    for i in range(2, n):
        pred = (coefs[0] * expect[i - 1] + coefs[1] * expect[i - 2]) >> shift
        expect.append(pred + resid[i - 2])

    head = _frame_header(0b0000, bps, n)  # mono
    sw = _BitWriter()
    sw.write(0, 1)
    sw.write(0b100001, 6)  # LPC, order 2 (100000 | order-1)
    sw.write(0, 1)         # no wasted bits
    for w in warm:
        sw.write(w & 0xFFFF, 16)
    sw.write(4 - 1, 4)     # coefficient precision 4
    sw.write(shift & 0x1F, 5)
    for c in coefs:
        sw.write(c & 0xF, 4)
    _write_raw_residual(sw, resid, 6)
    sw.align()
    frame = bytes(head) + sw.getvalue()
    frame += struct.pack(">H", _crc16(frame))

    stream = _handbuilt_stream(1, bps, n, None) + frame
    x, rate = decode_flac_meta(stream)
    got = np.round(x * (1 << (bps - 1))).astype(int)
    assert list(got) == expect
    assert rate == 8000


@pytest.mark.parametrize("mode", [0b1000, 0b1001, 0b1010])
def test_stereo_decorrelation_decode(mode):
    """Left-side / right-side / mid-side frames (VERBATIM subframes,
    side at bps+1) must reconstruct (l, r) exactly; decode_flac
    averages to mono like decode_wav."""
    import struct

    from chicago_crime_spark_ml_spark.operators.flac import (
        _BitWriter,
        _crc16,
        decode_flac_meta,
    )

    bps, n = 16, 12
    rng = np.random.default_rng(5 + mode)
    left = rng.integers(-30000, 30000, size=n).astype(np.int64)
    right = rng.integers(-30000, 30000, size=n).astype(np.int64)
    side = left - right
    mid = (left + right) >> 1
    head = _frame_header(mode, bps, n)
    sw = _BitWriter()
    if mode == 0b1000:    # left-side
        _write_verbatim(sw, left, 16)
        _write_verbatim(sw, side, 17)
    elif mode == 0b1001:  # right-side
        _write_verbatim(sw, side, 17)
        _write_verbatim(sw, right, 16)
    else:                 # mid-side
        _write_verbatim(sw, mid, 16)
        _write_verbatim(sw, side, 17)
    sw.align()
    frame = bytes(head) + sw.getvalue()
    frame += struct.pack(">H", _crc16(frame))

    stream = _handbuilt_stream(2, bps, n, None) + frame
    x, _ = decode_flac_meta(stream)
    want = (left + right).astype(np.float64) / 2.0 / float(1 << (bps - 1))
    assert np.allclose(x, want, atol=0, rtol=0)
