"""Minimal FLAC *encoder* used as the spec-reference test vector generator
for the native decoder (webaudio_tpu/native/wahost.cpp wah_flac_decode).

Implements the encode direction of RFC 9639 for every feature the decoder
supports: constant / verbatim / fixed(0-4) / LPC subframes, rice + rice2
residual partitions with escapes, wasted bits, left/right/mid-side stereo
decorrelation, odd block sizes.  Lossless round-trip == exact equality.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, width: int):
        if width == 0:
            return
        value &= (1 << width) - 1
        self.acc = (self.acc << width) | value
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def sbits(self, value: int, width: int):
        self.bits(value & ((1 << width) - 1), width)

    def unary(self, q: int):
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self):
        if self.n:
            self.bits(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _utf8_num(w: BitWriter, n: int):
    if n < 0x80:
        w.bits(n, 8)
    elif n < 0x800:
        w.bits(0xC0 | (n >> 6), 8)
        w.bits(0x80 | (n & 0x3F), 8)
    else:
        raise ValueError("frame number too large for the test encoder")


_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BS_CODE = {192: 1, 256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12}


def _rice_encode(w: BitWriter, e: np.ndarray, k: int):
    for v in e:
        u = (abs(int(v)) * 2 - 1) if int(v) < 0 else int(v) * 2  # zigzag
        w.unary(u >> k)
        w.bits(u & ((1 << k) - 1), k)


def _residual(w: BitWriter, e: np.ndarray, bs: int, order: int,
              porder: int, ks, method: int = 0):
    """ks: rice parameter per partition, or 'escape:<bits>' strings."""
    w.bits(method, 2)
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    w.bits(porder, 4)
    nparts = 1 << porder
    idx = 0
    for part in range(nparts):
        count = bs >> porder
        if part == 0:
            count -= order
        ke = ks[part % len(ks)]
        seg = e[idx:idx + count]
        idx += count
        if isinstance(ke, str):  # escape:<rawbits>
            raw = int(ke.split(":")[1])
            w.bits(escape, pbits)
            w.bits(raw, 5)
            for v in seg:
                w.sbits(int(v), raw)
        else:
            w.bits(ke, pbits)
            _rice_encode(w, seg, ke)


def _subframe(w: BitWriter, s: np.ndarray, bps: int, plan: dict):
    kind = plan["kind"]
    wasted = plan.get("wasted", 0)
    if wasted:
        assert (s & ((1 << wasted) - 1) == 0).all(), "samples not shiftable"
        s = s >> wasted
    eff = bps - wasted
    w.bits(0, 1)  # reserved
    bs = len(s)
    if kind == "constant":
        assert (s == s[0]).all()
        w.bits(0, 6)
        _wasted(w, wasted)
        w.sbits(int(s[0]), eff)
    elif kind == "verbatim":
        w.bits(1, 6)
        _wasted(w, wasted)
        for v in s:
            w.sbits(int(v), eff)
    elif kind == "fixed":
        order = plan["order"]
        w.bits(0b001000 | order, 6)
        _wasted(w, wasted)
        for v in s[:order]:
            w.sbits(int(v), eff)
        s64 = s.astype(np.int64)
        e = s64.copy()
        for _ in range(order):
            e = np.diff(e)
        _residual(w, e, bs, order, plan.get("porder", 0),
                  plan.get("ks", [4]), plan.get("method", 0))
    elif kind == "lpc":
        order = plan["order"]
        coefs = plan["coefs"]          # list[int], len == order
        prec = plan.get("prec", 12)    # bits incl. sign
        shift = plan.get("shift", 10)
        assert len(coefs) == order
        w.bits(0b100000 | (order - 1), 6)
        _wasted(w, wasted)
        for v in s[:order]:
            w.sbits(int(v), eff)
        w.bits(prec - 1, 4)
        w.sbits(shift, 5)
        for c in coefs:
            w.sbits(int(c), prec)
        s64 = s.astype(np.int64)
        e = np.empty(bs - order, np.int64)
        for i in range(order, bs):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(s64[i - 1 - j])
            e[i - order] = int(s64[i]) - (acc >> shift)
        _residual(w, e, bs, order, plan.get("porder", 0),
                  plan.get("ks", [9]), plan.get("method", 1))
    else:  # pragma: no cover
        raise ValueError(kind)


def _wasted(w: BitWriter, wasted: int):
    if wasted:
        w.bits(1, 1)
        w.unary(wasted - 1)
    else:
        w.bits(0, 1)


def encode_flac(channels: np.ndarray, sample_rate: int, bps: int,
                frame_plans: list) -> bytes:
    """channels: (nch, total) int array of bps-bit samples.
    frame_plans: list of (block_size, ch_assign, [subframe plan per ch]).
    ch_assign: 'independent' | 'left_side' | 'right_side' | 'mid_side'.
    """
    nch, total = channels.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.bits(16, 16)            # min block size
    si.bits(65535, 16)         # max block size
    si.bits(0, 24)             # min frame size (unknown)
    si.bits(0, 24)             # max frame size
    si.bits(sample_rate, 20)
    si.bits(nch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(total & ((1 << 36) - 1), 36)
    for _ in range(16):
        si.bits(0, 8)          # md5 (unchecked)
    body = si.bytes()
    out.append(0x80)           # last-block | type 0
    out += len(body).to_bytes(3, "big")
    out += body

    pos = 0
    for fno, (bs, assign, plans) in enumerate(frame_plans):
        block = channels[:, pos:pos + bs].astype(np.int64)
        pos += bs
        w = BitWriter()
        w.bits(0b11111111111110, 14)
        w.bits(0, 1)           # reserved
        w.bits(0, 1)           # fixed block size strategy
        bs_code = _BS_CODE.get(bs)
        if bs_code is None:
            bs_code = 6 if bs <= 256 else 7
        w.bits(bs_code, 4)
        w.bits(0, 4)           # sample rate: from STREAMINFO
        subs = []
        if assign == "independent":
            w.bits(nch - 1, 4)
            subs = [(block[c], bps) for c in range(nch)]
        else:
            assert nch == 2
            L, R = block[0], block[1]
            side = L - R
            if assign == "left_side":
                w.bits(8, 4)
                subs = [(L, bps), (side, bps + 1)]
            elif assign == "right_side":
                w.bits(9, 4)
                subs = [(side, bps + 1), (R, bps)]
            else:  # mid_side
                w.bits(10, 4)
                mid = (L + R) >> 1
                subs = [(mid, bps), (side, bps + 1)]
        w.bits(_SS_CODE[bps], 3)
        w.bits(0, 1)           # reserved
        _utf8_num(w, fno)
        if bs_code == 6:
            w.bits(bs - 1, 8)
        elif bs_code == 7:
            w.bits(bs - 1, 16)
        w.bits(0, 8)           # CRC-8 (decoder does not verify)
        for (sig, sb_bps), plan in zip(subs, plans):
            _subframe(w, sig, sb_bps, plan)
        w.align()
        w.bits(0, 16)          # CRC-16 (decoder does not verify)
        out += w.bytes()
    assert pos == total
    return bytes(out)
