"""FLAC codec in pure stdlib Python + numpy (X79).

Completes the audio family beside the PCM WAV tier the way GIF completed
the animation family: FLAC is the dominant LOSSLESS compressed audio
format in curated speech/music corpora, and losslessness means decoded
samples round-trip EXACTLY — so, like the GIF tier, an end-to-end loop
can be pinned by an arithmetic checksum oracle, not just by container
fields.

Implemented surface (the format per the public FLAC specification):
  * 'fLaC' marker + metadata blocks (STREAMINFO parsed — block size,
    sample rate, channels, bit depth, total samples; other blocks
    skipped by length),
  * frame headers: sync code, fixed blocking strategy, block-size /
    sample-rate / sample-size codes (incl. the end-of-header 8/16-bit
    block-size forms), channel assignments INDEPENDENT, LEFT/SIDE,
    RIGHT/SIDE, MID/SIDE (the stereo decorrelation modes), UTF-8-coded
    frame number, CRC-8 verified,
  * subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the t, 2t-t1, ...
    polynomial predictors), LPC with quantized coefficients and shift,
    wasted-bits unpacking,
  * residuals: partitioned Rice coding, methods 0 (4-bit) and 1 (5-bit
    parameters), escape code (raw residuals at stated width),
  * frame CRC-16 verified,
  * a byte-deterministic mirror encoder (16-bit, mono/stereo,
    independent channels, FIXED order chosen 0-2 by total residual
    magnitude per block, single-partition Rice with the standard
    mean-based parameter estimate) so fixtures are
    encoder-free-checkable and the Rice/FIXED decode paths are
    exercised by real compressed streams, not just VERBATIM.

Loud tiers: ValueError for not-a-FLAC / truncated / CRC mismatch /
corrupt streams; NotImplementedError for valid-but-uncovered variants
(variable blocking strategy, >2 channels at encode).
"""

from __future__ import annotations

import struct

import numpy as np


def is_flac(content: bytes) -> bool:
    return content[:4] == b"fLaC"


# -- bit I/O (MSB-first, the FLAC convention) -------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC unary run overlong (corrupt stream)")

    def align(self):
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# -- CRCs (the FLAC polynomials) -------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# -- utf-8-style frame number ----------------------------------------------


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    seq = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 1 + 5 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    for i in range(nbytes - 1):
        seq.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | n
    return bytes([lead] + seq[::-1])


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC frame number: bad UTF-8 lead byte")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC frame number: bad continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# -- decode -----------------------------------------------------------------


def decode_flac(content: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC bytes → (sample_rate, n_channels, samples int32 (n, ch))."""
    if not is_flac(content):
        raise ValueError("not a FLAC: missing fLaC marker")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC: metadata header")
        hdr = content[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + content[pos + 1 : pos + 4])
        body = content[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("truncated FLAC: metadata body")
        if btype == 0:
            if length < 34:
                raise ValueError("FLAC STREAMINFO too short")
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)
            br.read(24)
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            streaminfo = (rate, nch, bps, total)
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps, total = streaminfo

    chans: list[list[int]] = [[] for _ in range(nch)]
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(content, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync code not found")
        br.read(1)  # reserved
        if br.read(1):
            raise NotImplementedError(
                "FLAC variable blocking strategy not supported"
            )
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _frame_no = _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC reserved block size code 0")
        elif bs_code == 1:
            block = 192
        elif bs_code <= 5:
            block = 576 << (bs_code - 2)
        elif bs_code == 6:
            block = br.read(8) + 1
        elif bs_code == 7:
            block = br.read(16) + 1
        else:
            block = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        if ss_code == 0:
            fbps = bps
        else:
            fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
            if fbps is None:
                raise ValueError("FLAC reserved sample size code")
        br.align()
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        hdr_crc = content[br.pos]
        if _crc8(content[frame_start : br.pos]) != hdr_crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        br.pos += 1

        if ch_code < 8:
            n_sub = ch_code + 1
            assignment = "indep"
        elif ch_code == 8:
            n_sub, assignment = 2, "left_side"
        elif ch_code == 9:
            n_sub, assignment = 2, "right_side"
        elif ch_code == 10:
            n_sub, assignment = 2, "mid_side"
        else:
            raise ValueError("FLAC reserved channel assignment")
        if assignment == "indep" and n_sub != nch:
            raise ValueError("FLAC frame channel count disagrees with STREAMINFO")

        sub: list[list[int]] = []
        for ci in range(n_sub):
            w = fbps
            # side channels carry one extra bit
            if (assignment == "left_side" and ci == 1) or (
                assignment == "right_side" and ci == 0
            ) or (assignment == "mid_side" and ci == 1):
                w += 1
            sub.append(_read_subframe(br, block, w))
        br.align()
        crc = (content[br.pos] << 8) | content[br.pos + 1]
        if _crc16(content[frame_start : br.pos]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        br.pos += 2
        pos = br.pos

        if assignment == "indep":
            outs = sub
        elif assignment == "left_side":
            left = sub[0]
            outs = [left, [l - s for l, s in zip(left, sub[1])]]
        elif assignment == "right_side":
            right = sub[1]
            outs = [[r + s for r, s in zip(right, sub[0])], right]
        else:  # mid_side
            outs = [[0] * block, [0] * block]
            for i in range(block):
                mid, side = sub[0][i], sub[1][i]
                mid = (mid << 1) | (side & 1)
                outs[0][i] = (mid + side) >> 1
                outs[1][i] = (mid - side) >> 1
        take = min(block, total - got)
        for c in range(nch):
            chans[c].extend(outs[c][:take])
        got += take
    return rate, nch, np.array(chans, dtype=np.int32).T.copy()


def _read_subframe(br: _BitReader, block: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe: bad padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    w = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(w)
        out = [v] * block
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(w) for _ in range(block)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(w) for _ in range(order)]
        resid = _read_residual(br, block, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, block):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(resid[i - order] + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [br.read_signed(w) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("FLAC LPC: invalid coefficient precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC LPC: negative shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, block, order)
        out = list(warm)
        for i in range(order, block):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(resid[i - order] + (acc >> shift))
    else:
        raise ValueError(f"FLAC reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _read_residual(br: _BitReader, block: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block % nparts:
        raise ValueError("FLAC residual: block not divisible by partitions")
    out: list[int] = []
    for p in range(nparts):
        n = block // nparts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC residual: order exceeds first partition")
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                r = br.read(k) if k else 0
                zz = (q << k) | r
                out.append((zz >> 1) ^ -(zz & 1))
    return out


# -- encode -----------------------------------------------------------------


def _rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) / len(resid)
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(bw: _BitWriter, resid: list[int]):
    k = _rice_param(resid)
    bw.write(0, 2)  # method 0 (4-bit params)
    bw.write(0, 4)  # partition order 0 → one partition
    bw.write(k, 4)
    for r in resid:
        zz = (r << 1) if r >= 0 else ((-r) << 1) - 1
        q, rem = zz >> k, zz & ((1 << k) - 1)
        if q > 1 << 20:
            raise ValueError("rice quotient overlong — parameter estimate broken")
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if k:
            bw.write(rem, k)


def encode_flac(samples: np.ndarray, rate: int, block: int = 4096) -> bytes:
    """int16 samples ((n,) mono or (n, 2) stereo) → FLAC bytes
    (fixed blocking, independent channels, FIXED predictor order 0-2
    chosen per block by residual magnitude, single-partition Rice)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] > 2:
        raise NotImplementedError(">2 channels not supported at encode")
    if s.shape[0] == 0:
        raise ValueError("encode_flac needs at least one sample")
    if s.dtype != np.int16:
        raise ValueError("encode_flac takes int16 samples")
    if rate <= 0 or rate >= 1 << 20:
        raise ValueError("sample rate out of range")
    n, nch = s.shape
    bps = 16

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # zero md5 (unset)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for f, start in enumerate(range(0, n, block)):
        blk = s[start : start + block]
        bn = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(nch - 1, 4)  # independent channels
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)
        hdr = bw
        head = bytearray(hdr.bytes() if hdr.nbits == 0 else b"")
        # assemble header bytes manually: the fields above are 32 bits
        assert hdr.nbits == 0
        head = bytearray(hdr.out)
        head += _utf8_number(f)
        head += struct.pack(">H", bn - 1)
        head.append(_crc8(bytes(head)))

        fw = _BitWriter()
        for c in range(nch):
            ch = blk[:, c].astype(np.int64)
            # candidate FIXED orders 0-2: pick the smallest |residual| sum
            best_order, best_resid, best_cost = 0, None, None
            for order in range(0, 3):
                if bn <= order:
                    continue
                coefs = _FIXED_COEFS[order]
                resid = [
                    int(
                        ch[i]
                        - sum(c_ * ch[i - 1 - j] for j, c_ in enumerate(coefs))
                    )
                    for i in range(order, bn)
                ]
                cost = sum(abs(r) for r in resid)
                if best_cost is None or cost < best_cost:
                    best_order, best_resid, best_cost = order, resid, cost
            fw.write(0, 1)
            fw.write(8 + best_order, 6)  # FIXED subframe
            fw.write(0, 1)  # no wasted bits
            for i in range(best_order):
                fw.write(int(ch[i]) & 0xFFFF, 16)
            _write_residual(fw, best_resid)
        fw.align()
        frame = bytes(head) + fw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
