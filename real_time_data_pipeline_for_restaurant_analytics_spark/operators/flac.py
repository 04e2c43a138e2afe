"""FLAC codec (fixed-predictor subset) built on the stdlib — the
entropy-coded AUDIO format behind the multimodal seam (round-10; the
audio sibling of the q148 baseline-JPEG move).

FLAC (RFC 9639 / the xiph format spec) is LOSSLESS: decoded samples
equal the encoded PCM bit-for-bit, so — unlike JPEG — ANY
deterministic signal is oracle-replayable with no fixture
constraints. What makes it a real test of entropy-coded decoding:

- **Decoder** (:func:`decode_flac`): 'fLaC' magic + STREAMINFO parse
  (and skip of other metadata blocks), frame sync walk with CRC-8
  header / CRC-16 frame verification, UTF-8-coded frame numbers,
  subframe dispatch (CONSTANT / VERBATIM / FIXED orders 0-4), Rice
  residual decoding (zigzag fold, unary quotient = '0'*q + '1',
  4-bit params, 0b1111 escape to verbatim residuals, partition
  orders), and a final MD5 check of the decoded PCM against the
  STREAMINFO digest — an end-to-end integrity proof the format
  itself ships. LPC subframes, decorrelated stereo frames
  (left/side, side/right, mid/side — what real-world encoders emit),
  wasted-bits subframes, and every bit depth the spec allows
  (4..32, incl. 12/20-bit via the ceil-byte MD5 packing libFLAC
  uses) decode too — the format's subframe surface is closed.
- **Encoder** (:func:`encode_flac`): per block, tries CONSTANT and
  fixed predictors of order 0-2, picks the cheapest by exact coded
  size, rice-codes residuals with the per-partition optimal
  parameter, and emits spec-correct CRCs and the true PCM MD5 —
  so any third-party FLAC decoder accepts the output.

Scale contract: identical to the other codecs — Arrow-batched
``mapInPandas``, payload bytes touched once, zero payload shuffles,
narrow integer stats out. The rice loops are interpreter-bound pure
Python (the deterministic-replayability price, linear in samples and
embarrassingly parallel).

Reference anchor: none in the reference (it stores no media) — this
is the LLM-training-data surface (SURVEY §6) where audio corpora are
FLAC/WAV.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..registry import register

BLOCK_SIZE = 256  # small on purpose: multi-frame streams at fixture sizes

#: fixed-predictor residual formulas, order 0..4 (RFC 9639 §9.2.2)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def pad_to_byte(self) -> None:
        if self._n:
            self.put(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            # byte-at-a-time skip over all-zero spans
            if self.bit == 0 and self.data[self.byte] == 0:
                q += 8
                self.byte += 1
                continue
            if (self.data[self.byte] >> (7 - self.bit)) & 1:
                self.bit += 1
                if self.bit == 8:
                    self.bit = 0
                    self.byte += 1
                return q
            q += 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (values, not codepoint
    rules)."""
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])
    raise NotImplementedError("frame numbers beyond 16 bits")


def _read_utf8_number(data: bytes, pos: int) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    if b0 >> 5 == 0b110:
        return ((b0 & 0x1F) << 6) | (data[pos + 1] & 0x3F), pos + 2
    if b0 >> 4 == 0b1110:
        return (
            ((b0 & 0x0F) << 12)
            | ((data[pos + 1] & 0x3F) << 6)
            | (data[pos + 2] & 0x3F),
            pos + 3,
        )
    raise ValueError("invalid UTF-8-coded frame number")


def _best_rice_param(resid: list[int]) -> tuple[int, int]:
    """(param, coded bits) minimizing the exact rice size; param 14
    max (15 is the escape). Vectorized: the exact size at every param
    is one shift+sum over the folded values (int64 is safe — |resid|
    ≤ a few × 2^17 for 16-bit fixed predictors)."""
    if not resid:
        return 0, 0
    a = np.asarray(resid, dtype=np.int64)
    us = np.where(a >= 0, a << 1, -(a << 1) - 1)
    n = len(resid)
    bits = [int((us >> p).sum()) + n * (1 + p) for p in range(15)]
    best_p = int(np.argmin(bits))
    return best_p, bits[best_p]


def _residuals(samples: list[int], order: int) -> list[int]:
    if order == 0:
        return list(samples)
    a = np.asarray(samples, dtype=np.int64)
    out = a[order:].copy()
    for j, c in enumerate(_FIXED_COEFS[order]):
        out -= c * a[order - j - 1 : len(a) - j - 1]
    return out.tolist()


#: frame-header bits-per-sample codes, RFC 9639 §9.1.4; depths with
#: no table code (e.g. 4-bit) ride code 0 = "get from STREAMINFO"
_BPS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}
_BPS_FROM_CODE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _pack_pcm(arr: "np.ndarray", bps: int) -> bytes:
    """Interleaved little-endian signed PCM at ceil(bps/8) bytes per
    sample — the byte stream the spec's STREAMINFO MD5 digests (the
    libFLAC convention: non-byte-aligned depths pad to whole bytes)."""
    nbytes = (bps + 7) // 8
    if nbytes == 1:
        return arr.astype("<i1").tobytes()
    if nbytes == 2:
        return arr.astype("<i2").tobytes()
    if nbytes == 4:
        return arr.astype("<i4").tobytes()
    # 3 bytes: the low three bytes of the little-endian int32 form
    b = np.frombuffer(arr.astype("<i4").tobytes(), dtype=np.uint8)
    return b.reshape(-1, 4)[:, :3].tobytes()


def encode_flac(samples: "np.ndarray", sample_rate: int, bps: int = 16) -> bytes:
    """REAL FLAC from an (n, channels) integer array: STREAMINFO with
    the true PCM MD5, fixed-blocksize frames, per-channel best-of
    CONSTANT / fixed-predictor-order-{0,1,2} subframes (with
    wasted-bits detection — shared trailing zero bits move to the
    subframe header, the move real encoders make on upscaled audio),
    rice residuals, real CRC-8/CRC-16. ``bps`` ∈ {8, 16, 24, 32}."""
    if not 4 <= bps <= 32:
        raise ValueError(f"FLAC bit depth {bps} out of the spec's 4..32 range")
    n, ch = samples.shape
    if ch not in (1, 2):
        raise NotImplementedError("only mono/stereo")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.size and (samples.min() < lo or samples.max() > hi):
        raise ValueError(f"sample out of {bps}-bit range")
    # PCM MD5 over interleaved little-endian samples (the spec's raw
    # unencoded-audio digest — decoders verify decoded output with it)
    md5 = hashlib.md5(_pack_pcm(samples, bps)).digest()

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.put(BLOCK_SIZE, 16)  # min blocksize
    si.put(BLOCK_SIZE, 16)  # max blocksize
    si.put(0, 24)  # min framesize unknown
    si.put(0, 24)  # max framesize unknown
    si.put(sample_rate, 20)
    si.put(ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    body = si.bytes() + md5
    out += bytes([0x80, 0, 0, len(body)]) + body  # last-block STREAMINFO

    for fno, start in enumerate(range(0, n, BLOCK_SIZE)):
        block = samples[start : start + BLOCK_SIZE]
        bs = block.shape[0]
        head = bytearray(b"\xff\xf8")  # sync + fixed blocking strategy
        head.append(0x70)  # blocksize code 0b0111 (16-bit at end), rate code 0
        # depths without a table code ride 0b000 = "from STREAMINFO"
        head.append(((ch - 1) << 4) | (_BPS_CODE.get(bps, 0) << 1))
        head += _utf8_number(fno)
        head += struct.pack(">H", bs - 1)
        head.append(_crc8(bytes(head)))

        w = _BitWriter()
        for c in range(ch):
            _write_subframe(w, [int(v) for v in block[:, c]], bps)
        w.pad_to_byte()
        frame = bytes(head) + w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _write_subframe(w: _BitWriter, chan: list[int], bps: int = 16) -> None:
    """Pick CONSTANT or the cheapest fixed order in {0,1,2} by exact
    coded size, then emit header + warmup + rice residual. Trailing
    zero bits shared by every sample are stripped into the header's
    wasted-bits field first (RFC 9639 §9.2.1)."""
    nonzero = [v for v in chan if v]
    wasted = 0
    if nonzero:
        wasted = min((v & -v).bit_length() - 1 for v in nonzero)
        wasted = min(wasted, bps - 1)
    if wasted:
        chan = [v >> wasted for v in chan]
        bps -= wasted

    def header(type_bits: int) -> None:
        w.put(0, 1)  # zero pad
        w.put(type_bits, 6)
        if wasted:
            w.put(1, 1)
            w.put_unary(wasted - 1)
        else:
            w.put(0, 1)

    mask = (1 << bps) - 1
    if all(v == chan[0] for v in chan):
        header(0b000000)  # CONSTANT
        w.put(chan[0] & mask, bps)
        return
    best = None
    for order in (0, 1, 2):
        if order >= len(chan):
            break
        resid = _residuals(chan, order)
        p, bits = _best_rice_param(resid)
        # + the residual section's framing the rice path pays and
        # VERBATIM doesn't: 2-bit coding method + 4-bit partition
        # order + 4-bit rice parameter (ADVICE r11 — omitting it let
        # FIXED win by a few bits right at the break-even point; a
        # constant, so the best-order choice is unaffected)
        total = order * bps + bits + 10
        if best is None or total < best[3]:
            best = (order, resid, p, total)
    order, resid, p, _ = best
    if best[3] > len(chan) * bps:
        # rice coding loses to raw samples (incompressible signals —
        # e.g. full-range 24/32-bit noise, where even the best rice
        # parameter leaves enormous unary quotients): emit VERBATIM,
        # which bounds the subframe at bps bits/sample like every
        # real encoder does
        header(0b000001)  # VERBATIM
        for v in chan:
            w.put(v & mask, bps)
        return
    header(0b001000 | order)  # FIXED, order
    for v in chan[:order]:  # warmup, verbatim
        w.put(v & mask, bps)
    w.put(0b00, 2)  # rice method, 4-bit params
    w.put(0, 4)  # partition order 0 → one partition
    w.put(p, 4)
    for r in resid:
        u = _zigzag(r)
        w.put_unary(u >> p)
        if p:
            w.put(u & ((1 << p) - 1), p)


def decode_flac(payload: bytes) -> tuple["np.ndarray", int]:
    """REAL FLAC decode → ((n, channels) int array, sample_rate),
    with CRC-8/CRC-16 verification per frame and the STREAMINFO MD5
    verified against the decoded PCM. CONSTANT/VERBATIM/FIXED/LPC
    subframes, wasted-bits subframes, all four channel assignments
    (independent + the three decorrelated stereo forms), and every
    spec bit depth (4..32; smallest of int8/int16/int32 output, MD5
    packed at ceil(bps/8) bytes as libFLAC does) decode."""
    if payload[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC signature")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC without STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min blocksize
    r.read(16)  # max blocksize
    r.read(24)
    r.read(24)
    rate = r.read(20)
    ch = r.read(3) + 1
    bps = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]
    if not 4 <= bps <= 32:
        raise ValueError(f"FLAC bit depth {bps} out of the spec's 4..32 range")

    chans: list[list[int]] = [[] for _ in range(ch)]
    while pos < len(payload) and sum(len(c) for c in chans) < total * ch:
        try:
            pos = _decode_frame(payload, pos, ch, chans, bps)
        except (IndexError, struct.error) as e:
            # a desynced rice stream (one flipped bit shifts every
            # boundary after it) can run past the buffer before the
            # CRC is reached — that is CORRUPTION, and must surface as
            # the same ValueError the explicit checks raise (the PNG
            # chunk-framing lesson, ADVICE r10)
            raise ValueError("truncated or desynced FLAC frame") from e

    if any(len(c) != total for c in chans):
        raise ValueError("FLAC stream ended short of STREAMINFO total")
    arr = np.stack([np.array(c, dtype=np.int64) for c in chans], axis=1)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.size and (arr.max() > hi or arr.min() < lo):
        raise ValueError(f"decoded sample out of {bps}-bit range")
    out = arr.astype(np.int8 if bps <= 8 else np.int16 if bps <= 16 else np.int32)
    if hashlib.md5(_pack_pcm(out, bps)).digest() != md5_expect:
        raise ValueError("decoded PCM contradicts the STREAMINFO MD5")
    return out, rate


def _decode_frame(
    payload: bytes, pos: int, ch: int, chans: list[list[int]], bps: int
) -> int:
    """Decode ONE frame starting at ``pos``; extend ``chans`` and
    return the position after the frame CRC."""
    frame_at = pos
    if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
        raise ValueError("lost FLAC frame sync")
    bs_code = payload[pos + 2] >> 4
    sr_code = payload[pos + 2] & 0x0F
    chan_asgn = payload[pos + 3] >> 4
    size_code = (payload[pos + 3] >> 1) & 0x07
    if chan_asgn > 10:
        raise ValueError(f"reserved channel assignment {chan_asgn}")
    decorrelated = chan_asgn >= 8
    if decorrelated:
        # 8 = left/side, 9 = side/right, 10 = mid/side — the side
        # channel carries bps+1 bits (RFC 9639 §9.1.3). Our encoder
        # emits independent channels; real-world encoders emit these.
        if ch != 2:
            raise ValueError("decorrelated stereo frame in a non-stereo stream")
    elif chan_asgn + 1 != ch:
        raise ValueError("frame channel count != STREAMINFO")
    if size_code != 0:  # 0 = get depth from STREAMINFO
        coded_bps = _BPS_FROM_CODE.get(size_code)
        if coded_bps is None:
            raise ValueError(f"reserved bit-depth code {size_code:#05b}")
        if coded_bps != bps:
            raise ValueError("frame bit depth contradicts STREAMINFO")
    _, pos = _read_utf8_number(payload, pos + 4)
    # block size: the spec's fixed table, plus the two from-end codes
    # (real-world encoders emit the table codes, e.g. 1100 = 4096;
    # ours emits 0111 so short last frames need no special casing)
    if bs_code == 0b0111:
        bs = struct.unpack_from(">H", payload, pos)[0] + 1
        pos += 2
    elif bs_code == 0b0110:
        bs = payload[pos] + 1
        pos += 1
    elif bs_code == 0b0001:
        bs = 192
    elif 0b0010 <= bs_code <= 0b0101:
        bs = 576 << (bs_code - 2)
    elif bs_code >= 0b1000:
        bs = 256 << (bs_code - 8)
    else:
        raise ValueError("reserved block size code 0b0000")
    # sample rate: 0 = from STREAMINFO; the fixed table decodes too
    # (the value is informational here — STREAMINFO governs); the
    # three from-end variants carry extra header bytes to skip
    if sr_code in (0b1100, 0b1101):
        pos += 1
    elif sr_code == 0b1110:
        pos += 2
    elif sr_code == 0b1111:
        raise ValueError("invalid sample rate code 0b1111")
    if payload[pos] != _crc8(payload[frame_at:pos]):
        raise ValueError("FLAC frame header CRC-8 mismatch")
    pos += 1

    br = _BitReader(payload, pos)
    if not decorrelated:
        for c in range(ch):
            chans[c].extend(_read_subframe(br, bs, bps))
    else:
        side_first = chan_asgn == 9
        a = _read_subframe(br, bs, bps + 1 if side_first else bps)
        b = _read_subframe(br, bs, bps if side_first else bps + 1)
        if chan_asgn == 8:  # left/side: R = L - side
            left, side = a, b
            right = [l - s for l, s in zip(left, side)]
        elif chan_asgn == 9:  # side/right: L = side + R
            side, right = a, b
            left = [s + r for s, r in zip(side, right)]
        else:  # mid/side: mid recovers its dropped low bit from side
            mid, side = a, b
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
        chans[0].extend(left)
        chans[1].extend(right)
    br.align()
    pos = br.byte
    if pos + 2 > len(payload):
        raise ValueError("truncated FLAC frame CRC")
    (crc,) = struct.unpack_from(">H", payload, pos)
    if crc != _crc16(payload[frame_at:pos]):
        raise ValueError("FLAC frame CRC-16 mismatch")
    return pos + 2


def _read_subframe(br: _BitReader, bs: int, bps: int) -> list[int]:
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        # wasted bits (RFC 9639 §9.2.1): k-1 unary-coded; the subframe
        # codes samples k bits narrower and the decoder shifts back
        wasted = br.read_unary() + 1
        if wasted >= bps:
            raise ValueError("wasted bits exceed the bit depth")
        bps -= wasted

    def done(vals: list[int]) -> list[int]:
        return [v << wasted for v in vals] if wasted else vals

    if stype == 0b000000:  # CONSTANT
        return done([br.read_signed(bps)] * bs)
    if stype == 0b000001:  # VERBATIM
        return done([br.read_signed(bps) for _ in range(bs)])
    if 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _read_rice_residual(br, bs, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            out.append(r + sum(c * out[-j - 1] for j, c in enumerate(coefs)))
        return done(out)
    if stype >= 0b100000:  # LPC, order 1-32 (RFC 9639 §9.2.3)
        # our encoder never emits LPC (fixed predictors suffice for
        # the deterministic fixtures), but real-world FLAC is mostly
        # LPC — the decoder accepts it so third-party files decode
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0b1111:
            raise ValueError("invalid LPC coefficient precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC quantization shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_rice_residual(br, bs, order)
        out = list(warm)
        for r in resid:
            pred = sum(c * out[-j - 1] for j, c in enumerate(coefs)) >> shift
            out.append(r + pred)
        return done(out)
    raise ValueError(f"reserved subframe type {stype:#08b}")


def _read_rice_residual(br: _BitReader, bs: int, order: int) -> list[int]:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for part in range(nparts):
        count = bs // nparts - (order if part == 0 else 0)
        p = br.read(pbits)
        if p == escape:
            raw_bits = br.read(5)
            out.extend(br.read_signed(raw_bits) for _ in range(count))
        else:
            for _ in range(count):
                u = (br.read_unary() << p) | (br.read(p) if p else 0)
                out.append(_unzigzag(u))
    return out


# ---------------------------------------------------------------------------
# q149: the registered query — same deterministic signal as q110's WAV
# leg, so the (lossless) oracle is the same closed-form arithmetic;
# the payload path is genuine FLAC with rice-coded residuals.
# ---------------------------------------------------------------------------


def synth_flac_payloads(ids_df: DataFrame) -> DataFrame:
    from .multimodal import spread_ids, synth_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_flac(*synth_wav(int(d))) for d in pdf["doc_id"]
                    ],
                }
            )

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


def flac_decode_stats(binary_df: DataFrame) -> DataFrame:
    from .multimodal import AUDIO_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "sample_rate", "n_samples", "n_channels", "sum_abs", "peak")}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                s, rate = decode_flac(bytes(p))
                a = np.abs(s.astype(np.int64))
                out["doc_id"].append(int(d)); out["sample_rate"].append(rate)
                out["n_samples"].append(s.shape[0]); out["n_channels"].append(s.shape[1])
                out["sum_abs"].append(int(a.sum())); out["peak"].append(int(a.max()))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, schema=AUDIO_SCHEMA)


@register(
    "q149_flac_decode_stats",
    oracle="""
WITH base AS (
  SELECT doc_id,
         256 + 64 * (doc_id % 7) AS n,
         CAST(1 + doc_id % 2 AS INT) AS ch
  FROM documents
)
SELECT doc_id,
       CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples, ch AS n_channels,
       CAST(list_sum(flatten(list_transform(range(n), i ->
            list_transform(range(ch), c ->
              abs((31 * doc_id + 17 * i + 7 * c) % 65536 - 32768))))) AS BIGINT)
         AS sum_abs,
       CAST(list_max(flatten(list_transform(range(n), i ->
            list_transform(range(ch), c ->
              abs((31 * doc_id + 17 * i + 7 * c) % 65536 - 32768))))) AS INT)
         AS peak
FROM base ORDER BY doc_id
""",
    doc="REAL entropy-coded AUDIO decode (round-10, the FLAC half of "
    "the q148 move): the q110 deterministic PCM signal is encoded as "
    "genuine FLAC — STREAMINFO with the true PCM MD5, multi-frame "
    "fixed-blocksize stream, per-channel best-of CONSTANT/fixed-"
    "predictor subframes, zigzag+rice residuals, spec CRC-8/CRC-16 — "
    "and decoded back from the spec alone (frame sync walk, UTF-8 "
    "frame numbers, rice with escape support, predictor "
    "reconstruction, CRC and MD5 verification) inside the same "
    "Arrow-batched mapInPandas plumbing. FLAC is lossless, so the "
    "oracle is the same closed-form sample arithmetic as q110 — any "
    "wrong bit in the rice/predictor/CRC chain breaks the hash (or "
    "the in-stream MD5 first). The decoder additionally accepts LPC "
    "subframes and decorrelated (left/side, side/right, mid/side) "
    "stereo frames, wasted-bits subframes, and every spec bit depth "
    "(4..32 incl. 12/20-bit) — the format's subframe surface is "
    "closed. Payload bytes never shuffle; the "
    "exchanges are the ids fan-out and the presentation sort.",
)
def q149_flac_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from . import flac as _m, multimodal as _mm
    # (_m, _mm): synth_flac_payloads encodes multimodal.synth_wav
    # output, so edits to EITHER module must invalidate the cache
    payloads = _mm.cached_payloads(
        spark, sf_dir, "flac149", synth_flac_payloads, d, (_m, _mm)
    )
    return flac_decode_stats(payloads).orderBy("doc_id")
