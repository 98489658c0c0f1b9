"""External-encoder interop fixtures (r9, VERDICT r8 #6).

Until r9 every codec certification decoded blobs the engine's OWN
encoders produced — a shared spec misreading could certify itself. The
checked-in blobs under tests/fixtures/interop/ were assembled by an
independent implementation of each container format written directly
from the public specs (tools/gen_interop_fixtures.py — fresh bit/chunk
writers, zero code shared with the package codecs) and use structural
features the package encoders never emit: WAV chunk-layout quirks
(JUNK/LIST), WAVE_FORMAT_EXTENSIBLE, all five PNG filters + ancillary
chunks + split IDAT, 16-bit Paeth, and a FLAC stream with LPC,
mid-side/right-side decorrelation, wasted bits, partition orders 0-2
and VORBIS_COMMENT/PADDING metadata. The FLAC STREAMINFO carries the
real interleaved MD5, so the decoder's integrity check cross-validates
the fixture's bit assembly rather than trusting it.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "interop")


def _blob(name: str) -> bytes:
    with open(os.path.join(FIXDIR, name), "rb") as f:
        return f.read()


def _expected() -> dict:
    with open(os.path.join(FIXDIR, "expected.json")) as f:
        return json.load(f)


def test_wav_odd_chunk_layout_decodes():
    """JUNK before fmt + LIST INFO between fmt and data — the layout
    real encoders emit; the chunk walker must skip them and the decoded
    samples/rate must match the generator's ground truth exactly."""
    from chicago_crime_spark_ml_spark.operators.multimodal import (
        decode_wav_meta,
    )

    exp = _expected()["odd_layout.wav"]
    x, rate = decode_wav_meta(_blob("odd_layout.wav"))
    assert rate == exp["rate"]
    assert np.array_equal(x, np.asarray(exp["samples"]))


def test_wav_extensible_format_quarantines():
    """WAVE_FORMAT_EXTENSIBLE is a REAL format this subset decoder does
    not support: the contract is a ValueError (quarantinable), never a
    crash or a silent wrong decode."""
    from chicago_crime_spark_ml_spark.operators.multimodal import (
        decode_wav_meta,
    )

    with pytest.raises(ValueError, match="WAV"):
        decode_wav_meta(_blob("ext_format.wav"))


def test_png_mixed_filters_ancillary_chunks_decode():
    """One scanline per filter type 0-4, zlib level 9, IDAT split into
    three chunks, gAMA/pHYs/tEXt ancillary chunks — byte-exact pixels."""
    from chicago_crime_spark_ml_spark.operators.multimodal import (
        decode_png,
    )

    exp = _expected()["mixed_filters.png"]
    pix = decode_png(_blob("mixed_filters.png"))
    assert pix.shape == (5, 4, 1)
    assert np.array_equal(
        pix[:, :, 0], np.asarray(exp["pixels"], dtype=float) / 255.0
    )


def test_png_16bit_paeth_decodes():
    """16-bit grayscale with every scanline Paeth-filtered (2-byte
    filter unit — the bpp path an 8-bit-only test never touches)."""
    from chicago_crime_spark_ml_spark.operators.multimodal import (
        decode_png,
    )

    exp = _expected()["paeth16.png"]
    pix = decode_png(_blob("paeth16.png"))
    assert np.array_equal(
        pix[:, :, 0], np.asarray(exp["pixels"], dtype=float) / 65535.0
    )


def test_flac_lpc_midside_decodes_md5_verified():
    """Stereo FLAC assembled independently: LPC order-2 mid + wasted-bit
    FIXED side (mid-side, partition order 1), VERBATIM side + FIXED
    order-2 right (right-side, partition order 2), VORBIS_COMMENT and
    PADDING metadata. STREAMINFO carries the true interleaved MD5 — the
    decoder verifies it, so a mutual misreading of the spec cannot pass."""
    from chicago_crime_spark_ml_spark.operators.flac import (
        decode_flac_meta,
    )

    exp = _expected()["lpc_midside.flac"]
    x, rate = decode_flac_meta(_blob("lpc_midside.flac"))
    assert rate == exp["rate"]
    assert np.array_equal(x, np.asarray(exp["mono"]))


def test_fixtures_through_audit_and_pipeline(spark):
    """The intake path end-to-end: media_type_audit triages all five
    fixtures by real decode (extensible WAV → codec 'wav', decodable
    False — quarantined by classification, not crash), and the
    decodable audio flows through trim_silence and the fingerprint
    without error."""
    from pyspark.sql import functions as F

    from chicago_crime_spark_ml_spark.operators.multimodal import (
        audio_fingerprint,
        media_type_audit,
        trim_silence,
    )

    rows = [
        (1, bytearray(_blob("odd_layout.wav"))),
        (2, bytearray(_blob("ext_format.wav"))),
        (3, bytearray(_blob("mixed_filters.png"))),
        (4, bytearray(_blob("paeth16.png"))),
        (5, bytearray(_blob("lpc_midside.flac"))),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, blob BINARY")
    audit = {
        r.doc_id: (r.codec, r.decodable)
        for r in media_type_audit(df).collect()
    }
    assert audit[1] == ("wav", True)
    assert audit[2] == ("wav", False)  # classified, not decodable
    assert audit[3] == ("png", True)
    assert audit[4] == ("png", True)
    assert audit[5] == ("flac", True)
    aud = df.filter(F.col("doc_id").isin(1, 5))
    assert trim_silence(aud).count() == 2
    # the 40-sample WAV sits below the fingerprint's documented
    # 65-sample floor (no stable fingerprint under one sample/window)
    # and must be SKIPPED, not crash; the 384-sample FLAC fingerprints
    fps = audio_fingerprint(aud)
    assert {r.doc_id for r in fps.collect()} == {5}
