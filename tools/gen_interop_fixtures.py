"""Generate external-encoder INTEROP fixtures (r9, VERDICT r8 #6).

Every codec certification until r9 decoded blobs the engine's own
encoders produced, so a bug shared by encode+decode (a misread of the
spec) could certify itself. No independent encoder binaries exist in
this container (no Pillow, no flac CLI, no network), so these fixtures
are the closest honest substitute: each blob is assembled by a FRESH
implementation of the container format written directly from the public
specs (RFC 9639 for FLAC, the W3C PNG spec, the RIFF/WAVE spec), sharing
NO code with the package's codecs, and deliberately using structural
features the package encoders never emit:

- odd_layout.wav      JUNK chunk before fmt, LIST INFO chunk between
                      fmt and data, 11025 Hz — the chunk-layout quirks
                      real encoders produce (must decode).
- ext_format.wav      WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) — a real
                      format the subset decoder does NOT support (must
                      quarantine with ValueError, never crash the job).
- mixed_filters.png   8-bit gray, one scanline per filter type 0-4,
                      zlib level 9, IDAT split across 3 chunks, gAMA +
                      pHYs + tEXt ancillary chunks (must decode).
- paeth16.png         16-bit gray, every scanline Paeth-filtered
                      (2-byte filter unit; must decode).
- lpc_midside.flac    stereo 16-bit: frame 0 mid-side with an LPC
                      order-2 mid and a wasted-bit FIXED side at
                      partition order 1; frame 1 right-side with a
                      VERBATIM side and FIXED order-2 right at
                      partition order 2; VORBIS_COMMENT + PADDING
                      metadata blocks; STREAMINFO carries the real
                      interleaved-sample MD5, so the package decoder's
                      own integrity check cross-validates this
                      generator's bit assembly (must decode).

Deterministic (no randomness, no timestamps); expected decoded values
are written to expected.json. Run from the repo root:

    python tools/gen_interop_fixtures.py
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "interop",
)


# ---------------------------------------------------------------------------
# WAV (RIFF) — assembled chunk by chunk, no stdlib `wave`
# ---------------------------------------------------------------------------


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WAVE"
    for cid, data in chunks:
        body += cid + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            body += b"\x00"  # RIFF word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def gen_odd_layout_wav() -> tuple[bytes, list[float], int]:
    rate, n = 11025, 40
    ints = [((i * 617) % 4001) - 2000 for i in range(n)]
    data = struct.pack(f"<{n}h", *ints)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    info = b"INFO" + b"ISFT" + struct.pack("<I", 8) + b"fixture\x00"
    blob = _riff(
        [
            (b"JUNK", b"\x00" * 10),
            (b"fmt ", fmt),
            (b"LIST", info),
            (b"data", data),
        ]
    )
    return blob, [v / 32768.0 for v in ints], rate


def gen_ext_format_wav() -> bytes:
    rate, n = 8000, 8
    ints = [100 * i for i in range(n)]
    data = struct.pack(f"<{n}h", *ints)
    # WAVE_FORMAT_EXTENSIBLE: tag 0xFFFE + 22-byte extension with the
    # PCM subformat GUID
    guid = bytes(
        [
            0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
            0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71,
        ]
    )
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, rate, rate * 2, 2, 16, 22, 16, 1
    ) + guid
    return _riff([(b"fmt ", fmt), (b"data", data)])


# ---------------------------------------------------------------------------
# PNG — fresh filter + chunk assembly, no shared code with encode_png
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _filter_row(ftype: int, row: list[int], prev: list[int], bpp: int):
    out = [ftype]
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((x - pred) & 0xFF)
    return out


def gen_mixed_filters_png() -> tuple[bytes, list[list[int]]]:
    w, h = 4, 5
    pix = [[(r * 53 + c * 17 + (r * c * 7)) % 256 for c in range(w)] for r in range(h)]
    raw, prev = [], [0] * w
    for r in range(h):
        raw += _filter_row(r % 5, pix[r], prev, 1)
        prev = pix[r]
    comp = zlib.compress(bytes(raw), 9)
    thirds = max(1, len(comp) // 3)
    idats = [comp[:thirds], comp[thirds : 2 * thirds], comp[2 * thirds :]]
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _png_chunk(b"gAMA", struct.pack(">I", 45455))
        + _png_chunk(b"pHYs", struct.pack(">IIB", 2835, 2835, 1))
        + b"".join(_png_chunk(b"IDAT", d) for d in idats if d)
        + _png_chunk(b"tEXt", b"Software\x00interop-fixture-gen")
        + _png_chunk(b"IEND", b"")
    )
    return blob, pix


def gen_paeth16_png() -> tuple[bytes, list[list[int]]]:
    w, h = 3, 3
    pix = [[(r * 21001 + c * 9973) % 65536 for c in range(w)] for r in range(h)]
    raw, prev = [], [0] * (w * 2)
    for r in range(h):
        row = []
        for v in pix[r]:
            row += [v >> 8, v & 0xFF]  # network byte order
        raw += _filter_row(4, row, prev, 2)
        prev = row
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )
    return blob, pix


# ---------------------------------------------------------------------------
# FLAC — fresh bit-writer + frame assembly per RFC 9639
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def _rice_write(bw: BitWriter, values: list[int], param: int) -> None:
    for v in values:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _residual_write(
    bw: BitWriter, resid: list[int], order: int, porder: int, params: list[int]
) -> None:
    bw.write(0, 2)  # RICE method, 4-bit params
    bw.write(porder, 4)
    nparts = 1 << porder
    blocksize = len(resid) + order
    idx = 0
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        bw.write(params[p], 4)
        _rice_write(bw, resid[idx : idx + cnt], params[p])
        idx += cnt


def _subframe_lpc(bw, sig, order, coefs, shift, prec, ebps):
    bw.write(0, 1)
    bw.write(32 + order - 1, 6)
    bw.write(0, 1)  # no wasted bits
    for v in sig[:order]:
        bw.write_signed(v, ebps)
    bw.write(prec - 1, 4)
    bw.write_signed(shift, 5)
    for c in coefs:
        bw.write_signed(c, prec)
    resid = []
    for i in range(order, len(sig)):
        pred = sum(coefs[j] * sig[i - 1 - j] for j in range(order)) >> shift
        resid.append(sig[i] - pred)
    return resid


def _subframe_fixed(bw, sig, order, ebps, wasted=0):
    bw.write(0, 1)
    bw.write(8 + order, 6)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
        sig = [v >> wasted for v in sig]
        ebps -= wasted
    else:
        bw.write(0, 1)
    for v in sig[:order]:
        bw.write_signed(v, ebps)
    cur = list(sig)
    for _ in range(order):
        cur = [cur[i] - cur[i - 1] for i in range(1, len(cur))]
    return cur


def _subframe_verbatim(bw, sig, ebps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in sig:
        bw.write_signed(v, ebps)
    return None


def gen_lpc_midside_flac() -> tuple[bytes, list[float], int]:
    rate, bs = 22050, 192
    n = 2 * bs
    left = [((i * i * 3 + 7 * i) % 4001) - 2000 for i in range(n)]
    side = [2 * (((i * 13) % 41) - 20) for i in range(n)]  # even: wasted bit
    right = [left[i] - side[i] for i in range(n)]

    frames = b""
    for fno in range(2):
        lo, hi = fno * bs, (fno + 1) * bs
        l, r, s = left[lo:hi], right[lo:hi], side[lo:hi]
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize strategy
        bw.write(0b0001, 4)  # blocksize 192
        bw.write(0b0000, 4)  # rate from STREAMINFO
        bw.write(0b1010 if fno == 0 else 0b1001, 4)  # mid-side / right-side
        bw.write(0b100, 3)  # 16 bps
        bw.write(0, 1)  # reserved
        bw.write(fno, 8)  # frame number (single-byte UTF-8)
        hdr = bw.bytes[:]
        bw.write(_crc8(bytes(hdr)), 8)
        if fno == 0:
            mid = [(l[i] + r[i]) >> 1 for i in range(bs)]
            resid = _subframe_lpc(
                bw, mid, order=2, coefs=[13, -5], shift=3, prec=12, ebps=16
            )
            _residual_write(bw, resid, order=2, porder=1, params=[14, 14])
            resid = _subframe_fixed(bw, s, order=1, ebps=17, wasted=1)
            _residual_write(bw, resid, order=1, porder=0, params=[7])
        else:
            _subframe_verbatim(bw, s, ebps=17)
            resid = _subframe_fixed(bw, r, order=2, ebps=16)
            _residual_write(bw, resid, order=2, porder=2, params=[13, 13, 13, 13])
        bw.align()
        body = bw.bytes[:]
        bw.write(_crc16(bytes(body)), 16)
        frames += bw.data()

    md5 = hashlib.md5()
    inter = b"".join(
        struct.pack("<hh", left[i], right[i]) for i in range(n)
    )
    md5.update(inter)
    si = BitWriter()
    si.write(bs, 16)  # min blocksize
    si.write(bs, 16)  # max blocksize
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(rate, 20)
    si.write(1, 3)  # channels - 1
    si.write(15, 5)  # bps - 1
    si.write(n, 36)
    streaminfo = si.data() + md5.digest()

    vc_vendor = b"interop-fixture-gen"
    vorbis = struct.pack("<I", len(vc_vendor)) + vc_vendor + struct.pack("<I", 0)
    meta = (
        bytes([0x00]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
        + bytes([0x04]) + struct.pack(">I", len(vorbis))[1:] + vorbis
        + bytes([0x81]) + struct.pack(">I", 16)[1:] + b"\x00" * 16  # PADDING, last
    )
    blob = b"fLaC" + meta + frames
    mono = [((left[i] + right[i]) / 2.0) / 32768.0 for i in range(n)]
    return blob, mono, rate


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    expected: dict = {}

    blob, samples, rate = gen_odd_layout_wav()
    open(os.path.join(OUT, "odd_layout.wav"), "wb").write(blob)
    expected["odd_layout.wav"] = {"rate": rate, "samples": samples}

    open(os.path.join(OUT, "ext_format.wav"), "wb").write(gen_ext_format_wav())

    blob, pix = gen_mixed_filters_png()
    open(os.path.join(OUT, "mixed_filters.png"), "wb").write(blob)
    expected["mixed_filters.png"] = {"pixels": pix}

    blob, pix = gen_paeth16_png()
    open(os.path.join(OUT, "paeth16.png"), "wb").write(blob)
    expected["paeth16.png"] = {"pixels": pix}

    blob, mono, rate = gen_lpc_midside_flac()
    open(os.path.join(OUT, "lpc_midside.flac"), "wb").write(blob)
    expected["lpc_midside.flac"] = {"rate": rate, "mono": mono}

    with open(os.path.join(OUT, "expected.json"), "w") as f:
        json.dump(expected, f)
    print(f"wrote 5 fixtures + expected.json to {OUT}")


if __name__ == "__main__":
    main()
