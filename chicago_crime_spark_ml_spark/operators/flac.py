"""Pure-stdlib FLAC codec (subset) — no third-party audio libs.

FLAC is LOSSLESS, which is exactly what makes it certifiable here: a
synthesized blob decodes to bit-identical integer samples, so the same
closed-form dyadic-rational oracle trick the WAV matrix uses extends to
a genuinely COMPRESSED format (VERDICT r6 ask #4). The subset:

- encoder: mono or independent-channel, 8/16 bits per sample, fixed
  4096-sample blocks (short last block), per-frame best FIXED predictor
  order 0–4 chosen by folded-residual mass, CONSTANT detection, Rice
  residual coding (partition order 0, RICE method) with the escaped
  raw-binary fallback when Rice would inflate.
- decoder: CONSTANT / VERBATIM / FIXED 0–4 / LPC order 1–32 subframes,
  Rice methods RICE and RICE2 at any partition order, escaped
  partitions, wasted bits, mono and independent multi-channel
  (averaged to mono like :func:`..multimodal.decode_wav`), and the
  three stereo decorrelation modes (left-side / right-side / mid-side,
  side channel at bps+1) — so EXTERNAL FLAC corpora, which are mostly
  LPC-encoded and often decorrelated, decode through the audit /
  trim / transcode paths (r8; the encoder stays subset and never
  emits LPC or decorrelation). Frame-header CRC-8 and frame CRC-16
  are verified — a corrupt blob is corrupt data, not a different
  format.

Format per RFC 9639 / the public FLAC spec (public knowledge only).
The reference engine has no audio surface at all (SURVEY.md §2.6);
this sits in the engine's multimodal extension tier.
"""

from __future__ import annotations

import hashlib
import struct

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                (crc << 1) ^ _CRC16_POLY if crc & 0x8000 else crc << 1
            ) & 0xFFFF
    return crc


def _utf8_code(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding for frame numbers: k-byte form
    carries (7−k) + 6(k−1) payload bits (7-byte form: 36)."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        payload = (7 - nbytes) + 6 * (nbytes - 1) if nbytes < 7 else 36
        if n < (1 << payload):
            break
    lead_bits = (0xFF << (8 - nbytes)) & 0xFF
    rest = [(0x80 | ((n >> (6 * i)) & 0x3F)) for i in range(nbytes - 1)]
    out = [lead_bits | (n >> (6 * (nbytes - 1)))]
    out.extend(reversed(rest))
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.bytepos = pos
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits > 0:
            if self.bytepos >= len(self.buf):
                raise ValueError("FLAC: truncated stream")
            avail = 8 - self.bitpos
            take = min(nbits, avail)
            byte = self.buf[self.bytepos]
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            nbits -= take
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


_BPS_CODE = {8: 0b001, 16: 0b100}
_CODE_BPS = {v: k for k, v in _BPS_CODE.items()}
_BLOCKSIZE = 4096


def _fold(r):
    import numpy as np  # noqa: PLC0415

    return np.where(r >= 0, 2 * r, -2 * r - 1).astype(np.int64)


def _rice_param(folded) -> int:
    """Heuristic Rice parameter: ~log2 of the mean folded residual."""
    if folded.size == 0:
        return 0
    m = float(folded.mean())
    k = 0
    while (1 << (k + 1)) <= m + 1 and k < 14:
        k += 1
    return k


def encode_flac(samples, bps: int = 16, rate: int = 8000) -> bytes:
    """Encode float samples in [-1, 1] (mono) as a FLAC stream. A
    decoded sample is ``trunc(clip(x)·(2^(bps−1)−1)) / 2^(bps−1)``.
    For **bps=16** this is the same quantizer as
    :func:`..multimodal.encode_wav`, so 16-bit WAV and FLAC encodings
    of one signal decode bit-identically — the property that lets one
    oracle certify both codecs, and the ONLY width it holds for:
    8-bit WAV quantizes as ``trunc(x·127 + 128)`` (unsigned PCM bias
    applied BEFORE truncation), which diverges from FLAC's
    ``trunc(x·127)`` by 1 LSB on negative samples (ADVICE r7 — scope
    any future dual-codec oracle or width=1 transcode parity check to
    16-bit)."""
    import numpy as np  # noqa: PLC0415

    if bps not in _BPS_CODE:
        raise ValueError(f"FLAC: unsupported bits-per-sample {bps}")
    x = np.asarray(samples, dtype=np.float64).ravel()
    scale = (1 << (bps - 1)) - 1
    ints = np.trunc(np.clip(x, -1, 1) * scale).astype(np.int64)

    n = int(ints.size)
    md5 = hashlib.md5()
    if bps == 8:
        md5.update((ints & 0xFF).astype(np.uint8).tobytes())
    else:
        md5.update(ints.astype("<i2").tobytes())

    out = bytearray(b"fLaC")
    # STREAMINFO: last-block flag set (no other metadata), type 0, len 34
    si = _BitWriter()
    # declared min/max blocksize clamped to RFC 9639's 16-sample floor:
    # the field is a DECLARATION (actual blocksize rides in each frame
    # header), and conformant external decoders may reject a sub-16
    # value even though the frames themselves are valid (ADVICE r7)
    nominal = max(min(n, _BLOCKSIZE), 16)
    si.write(nominal, 16)  # min blocksize
    si.write(nominal, 16)  # max blocksize
    si.write(0, 24)  # min framesize unknown
    si.write(0, 24)  # max framesize unknown
    si.write(rate, 20)
    si.write(0, 3)  # channels - 1 (mono)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    body = si.getvalue() + md5.digest()
    assert len(body) == 34, len(body)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fidx in range(-(-n // _BLOCKSIZE)):
        blk = ints[fidx * _BLOCKSIZE : (fidx + 1) * _BLOCKSIZE]
        out += _encode_frame(blk, fidx, bps)
    return bytes(out)


def _encode_frame(blk, fidx: int, bps: int) -> bytes:
    import numpy as np  # noqa: PLC0415

    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocksize strategy
    bw.write(0b0111, 4)  # blocksize-1 as 16 bits at header end
    bw.write(0b0000, 4)  # sample rate from STREAMINFO
    bw.write(0b0000, 4)  # mono
    bw.write(_BPS_CODE[bps], 3)
    bw.write(0, 1)  # reserved
    bw.align()
    head = bytearray(bw.getvalue())
    head += _utf8_code(fidx)
    head += struct.pack(">H", max(0, len(blk) - 1))
    head.append(_crc8(bytes(head)))

    sw = _BitWriter()
    nblk = int(blk.size)
    if nblk and np.all(blk == blk[0]):
        sw.write(0, 1)
        sw.write(0b000000, 6)  # CONSTANT
        sw.write(0, 1)
        sw.write(int(blk[0]) & ((1 << bps) - 1), bps)
    else:
        # best FIXED order by folded-residual mass (order ≤ nblk-1)
        best_k, best_cost, best_resid = 0, None, blk
        for k in range(0, min(4, max(0, nblk - 1)) + 1):
            resid = np.diff(blk, k) if k else blk
            cost = int(_fold(resid).sum()) + k * bps
            if best_cost is None or cost < best_cost:
                best_k, best_cost, best_resid = k, cost, resid
        k, resid = best_k, best_resid.astype(np.int64)
        sw.write(0, 1)
        sw.write(0b001000 | k, 6)  # FIXED, order k
        sw.write(0, 1)  # no wasted bits
        for w in blk[:k]:
            sw.write(int(w) & ((1 << bps) - 1), bps)
        folded = _fold(resid)
        param = _rice_param(folded)
        rice_bits = int((folded >> param).sum()) + folded.size * (param + 1)
        raw_bits_per = (
            max(
                int(resid.max()).bit_length() + 1,
                (int(-resid.min()) - 1).bit_length() + 1 if resid.size and resid.min() < 0 else 1,
                1,
            )
            if resid.size
            else 1
        )
        sw.write(0b00, 2)  # RICE method, 4-bit params
        sw.write(0, 4)  # partition order 0
        if rice_bits <= raw_bits_per * folded.size:
            sw.write(param, 4)
            for u in folded:
                u = int(u)
                sw.write_unary(u >> param)
                sw.write(u, param)
        else:
            sw.write(0b1111, 4)  # escape
            sw.write(raw_bits_per, 5)
            for r in resid:
                sw.write(int(r) & ((1 << raw_bits_per) - 1), raw_bits_per)
    sw.align()
    frame = bytes(head) + sw.getvalue()
    return frame + struct.pack(">H", _crc16(frame))


def decode_flac_meta(buf: bytes):
    """Decode a FLAC stream → ``(samples, rate)`` with samples mono
    float64 in [-1, 1] normalized by 2^(bps−1) (channels averaged),
    mirroring :func:`..multimodal.decode_wav_meta`; returns ``None``
    when the 4-byte ``fLaC`` marker is absent so callers can dispatch.
    Verifies STREAMINFO MD5 when present, every frame-header CRC-8, and
    every frame CRC-16."""
    import numpy as np  # noqa: PLC0415

    buf = bytes(buf)
    if buf[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("FLAC: truncated metadata")
        last = buf[pos] & 0x80
        btype = buf[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        if pos + 4 + blen > len(buf):
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            streaminfo = buf[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC: missing STREAMINFO")
    sr = _BitReader(streaminfo)
    sr.read(16)
    sr.read(16)
    sr.read(24)
    sr.read(24)
    rate = sr.read(20)
    nch_si = sr.read(3) + 1
    bps_si = sr.read(5) + 1
    total = sr.read(36)
    md5_expect = streaminfo[18:34]

    chans = [[] for _ in range(nch_si)]
    while pos < len(buf):
        pos = _decode_frame(buf, pos, bps_si, nch_si, chans)
    per = [np.concatenate(c) if c else np.empty(0, np.int64) for c in chans]
    nsamp = per[0].size
    if any(p.size != nsamp for p in per):
        raise ValueError("FLAC: ragged channel lengths")
    if total and nsamp != total:
        raise ValueError(
            f"FLAC: sample count {nsamp} != STREAMINFO total {total}"
        )
    if md5_expect != b"\x00" * 16:
        md5 = hashlib.md5()
        inter = np.empty(nsamp * nch_si, dtype=np.int64)
        for i, p in enumerate(per):
            inter[i::nch_si] = p
        if bps_si == 8:
            md5.update((inter & 0xFF).astype(np.uint8).tobytes())
        elif bps_si == 16:
            md5.update(inter.astype("<i2").tobytes())
        else:
            md5 = None  # only 8/16 are producible here
        if md5 is not None and md5.digest() != md5_expect:
            raise ValueError("FLAC: MD5 mismatch — corrupt stream")
    x = np.mean(
        [p.astype(np.float64) for p in per], axis=0
    ) if nch_si > 1 else per[0].astype(np.float64)
    return x / float(1 << (bps_si - 1)), rate


_FIXED_BLOCKSIZES = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}


def _decode_frame(buf: bytes, pos: int, bps_si: int, nch_si: int, chans) -> int:
    import numpy as np  # noqa: PLC0415

    br = _BitReader(buf, pos)
    if br.read(14) != 0b11111111111110:
        raise ValueError(f"FLAC: bad frame sync at byte {pos}")
    br.read(1)
    br.read(1)  # blocking strategy (coded number length differs; we
    # re-read the UTF-8 code generically either way)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    br.read(1)
    # extended-UTF-8 coded frame/sample number
    lead = br.read(8)
    ones = 0
    probe = lead
    while probe & 0x80 and ones < 8:
        probe = (probe << 1) & 0xFF
        ones += 1
    if ones in (1, 8):
        raise ValueError("FLAC: invalid UTF-8 lead byte in frame header")
    extra = max(0, ones - 1)
    for _ in range(extra):
        if br.read(2) != 0b10:
            raise ValueError("FLAC: bad UTF-8 continuation in header")
        br.read(6)
    if bs_code == 0b0110:
        blocksize = br.read(8) + 1
    elif bs_code == 0b0111:
        blocksize = br.read(16) + 1
    elif bs_code in _FIXED_BLOCKSIZES:
        blocksize = _FIXED_BLOCKSIZES[bs_code]
    else:
        raise ValueError(f"FLAC: reserved blocksize code {bs_code}")
    if sr_code in (0b1100,):
        br.read(8)
    elif sr_code in (0b1101, 0b1110):
        br.read(16)
    elif sr_code == 0b1111:
        raise ValueError("FLAC: invalid sample rate code")
    hdr_end = br.bytepos if br.bitpos == 0 else br.bytepos + 1
    crc8 = br.read(8)
    if _crc8(buf[pos:hdr_end]) != crc8:
        raise ValueError("FLAC: frame header CRC-8 mismatch")
    if ch_code <= 0b0111:
        nch, mode = ch_code + 1, None
    elif ch_code <= 0b1010:
        nch, mode = 2, ch_code  # 1000 left-side, 1001 right-side, 1010 mid-side
    else:
        raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
    if nch != nch_si:
        raise ValueError("FLAC: frame channel count != STREAMINFO")
    bps = _CODE_BPS.get(bps_code, bps_si if bps_code == 0 else None)
    if bps is None or bps != bps_si:
        raise ValueError(f"FLAC: unsupported sample size code {bps_code}")

    if mode is None:
        for ch in range(nch):
            chans[ch].append(_decode_subframe(br, blocksize, bps))
    else:
        # decorrelated stereo: the SIDE channel carries one extra bit
        # (it holds left-right, range doubles); reconstruct per RFC 9639
        c0 = _decode_subframe(
            br, blocksize, bps + (1 if mode == 0b1001 else 0)
        )
        c1 = _decode_subframe(
            br, blocksize, bps + (1 if mode in (0b1000, 0b1010) else 0)
        )
        if mode == 0b1000:  # left-side: (left, side=left-right)
            left, right = c0, c0 - c1
        elif mode == 0b1001:  # right-side: (side=left-right, right)
            left, right = c1 + c0, c1
        else:  # mid-side: (mid=(l+r)>>1, side=l-r)
            mid2 = (c0 << 1) | (c1 & 1)
            left, right = (mid2 + c1) >> 1, (mid2 - c1) >> 1
        chans[0].append(left)
        chans[1].append(right)
    br.align()
    frame_end = br.bytepos
    crc16 = br.read(16)
    if _crc16(buf[pos:frame_end]) != crc16:
        raise ValueError("FLAC: frame CRC-16 mismatch")
    return br.bytepos


def _decode_subframe(br: _BitReader, blocksize: int, bps: int):
    import numpy as np  # noqa: PLC0415

    if br.read(1):
        raise ValueError("FLAC: bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    ebps = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(ebps)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array(
            [br.read_signed(ebps) for _ in range(blocksize)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED order 0..4
        k = stype - 8
        if k > blocksize:
            raise ValueError("FLAC: predictor order exceeds blocksize")
        warm = np.array(
            [br.read_signed(ebps) for _ in range(k)], dtype=np.int64
        )
        resid = _decode_residual(br, blocksize, k)
        rec = resid
        for j in range(k, 0, -1):
            init = int(np.diff(warm, j - 1)[0]) if j > 1 else (
                int(warm[0]) if k else 0
            )
            rec = np.concatenate(([init], init + np.cumsum(rec)))
        out = rec
    elif stype >= 32:  # LPC, order 1..32
        k = (stype & 31) + 1
        if k > blocksize:
            raise ValueError("FLAC: predictor order exceeds blocksize")
        warm = [br.read_signed(ebps) for _ in range(k)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC coefficient precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(k)]
        resid = _decode_residual(br, blocksize, k)
        rec = list(warm)  # Python ints: exact, arithmetic >> per spec
        for i in range(k, blocksize):
            pred = sum(coefs[j] * rec[i - 1 - j] for j in range(k)) >> shift
            rec.append(pred + int(resid[i - k]))
        out = np.asarray(rec, dtype=np.int64)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    return out << wasted if wasted else out


def _decode_residual(br: _BitReader, blocksize: int, order: int):
    import numpy as np  # noqa: PLC0415

    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC: blocksize not divisible by partitions")
    out = []
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC: negative partition sample count")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:  # 0-bit raw samples are all zeros per spec
                out.extend(0 for _ in range(cnt))
            else:
                out.extend(br.read_signed(raw) for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return np.asarray(out, dtype=np.int64)
