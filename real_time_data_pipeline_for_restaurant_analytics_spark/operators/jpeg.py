"""Baseline JPEG codec built on numpy + the stdlib — the entropy-coded
image format behind the multimodal seam (round-10, verdict item 2).

PNG (round 9) proved a COMPRESSED codec can be oracle-replayable when
every decode step is deterministic. JPEG is the dominant real-corpus
image format, and its baseline profile (ITU-T T.81 / ISO 10918-1,
SOF0) is huffman entropy coding + dequantization + the 8x8 inverse
DCT — all implementable exactly from the public spec:

- **Decoder** (:func:`decode_jpeg`): real marker walk (SOI, APPn/COM
  skipped by length, DQT, SOF0, DHT, SOS, EOI), canonical huffman
  tables built from the stream's OWN DHT segments (never assumed),
  a bit reader with 0xFF00 byte-unstuffing, per-component DC
  prediction, zigzag de-scan, dequantization, and a float64
  separable IDCT with final round+clamp. Baseline grayscale, 4:4:4
  color, and chroma-subsampled color (4:2:0/4:2:2 — per-component
  sampling factors, MCU-interleaved scan, replication upsampling;
  round 10 second pass) and PROGRESSIVE streams (SOF2 — all four
  G.1.2 scan kinds with EOB-run coding, accumulated into the
  coefficient arrays before one vectorized IDCT; round 10 third
  pass) are supported, as are DRI/RSTn restart intervals (the
  camera-output framing — byte-aligned RST sync with modulo-8
  sequence checking and DC/EOB-run resets); arithmetic-coded and
  subsampled-progressive streams raise NotImplementedError — the
  honest remaining boundary, now INSIDE the format.
- **Encoder** (:func:`encode_jpeg`): the exact inverse pipeline
  (level shift, forward DCT, quantization with the Annex-K-shaped
  quality tables, zigzag, DC-diff + (run,size) huffman with ZRL/EOB,
  byte stuffing). Huffman tables are emitted in DHT and may be ANY
  valid canonical code — we emit flat tables (all 162 AC symbols at
  8 bits, 12 DC symbols at 4 bits), which keeps the encoder small
  while the decoder still runs its general DHT construction; a
  pytest feeds it a non-flat table to pin generality.

Oracle replayability (the q148 move): JPEG is lossy, so arbitrary
pixels don't round-trip — but a block-constant-plus-single-AC fixture
does, EXACTLY. For a block whose pixels are ``v + 3a*g(x)`` with
``g = [1,-1,-1,1,1,-1,-1,1]`` (the u=4 DCT basis row scaled to
integers) and even ``v``, the forward DCT lands on exactly two
coefficients — DC ``8(v-128)`` (quantizes exactly: Q00=16) and
AC(u=4,v=0) ``24a`` (quantizes exactly: Q[0][4]=24) — and the decode
reproduces ``v + 3a*g(x)`` bit-for-bit (every intermediate is an
exact small integer in float64). The huffman layer is fully exercised
(varying DC diffs across blocks, a 13-zero AC run to the zigzag-14
coefficient, EOB), and DuckDB replays the decoded-pixel arithmetic in
closed form. Entropy-coding losslessness on ARBITRARY coefficients is
pinned separately in pytest (encode→decode the scan of seeded random
blocks, exact equality), as is the full-DCT path (decode(encode(x))
within quantization error bounds).

Scale: same contract as the other codecs — payload bytes are decoded
exactly once inside Arrow-batched ``mapInPandas``, zero shuffles, and
only narrow integer stats leave the stage. The per-byte huffman loop
is interpreter-bound pure Python (the PNG lesson: that is the price
of deterministic oracle replayability; it is embarrassingly parallel
and linear in payload bytes).

Reference anchor: the reference stores no images — this family is the
LLM-training-data surface (SURVEY §6) where a 100 TB multimodal
corpus is mostly JPEG.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..registry import register

# ---------------------------------------------------------------------------
# Tables. Quantization: the ITU T.81 Annex K example tables (the de
# facto "quality 50" tables every libjpeg derivative scales).
# ---------------------------------------------------------------------------

LUMA_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
CHROMA_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag() -> list[tuple[int, int]]:
    """The spec's zigzag scan as (y, x) pairs: anti-diagonals, even
    diagonals walked bottom-left→top-right, odd ones the reverse."""
    out = []
    for d in range(15):
        for i in range(d + 1):
            y, x = (d - i, i) if d % 2 == 0 else (i, d - i)
            if y < 8 and x < 8:
                out.append((y, x))
    return out


ZIGZAG = _zigzag()  # ZIGZAG[k] = (y, x); k=0 is DC
_ZZ_Y = np.array([y for y, _ in ZIGZAG])
_ZZ_X = np.array([x for _, x in ZIGZAG])

#: DCT-II basis A[u, x] = C(u) cos((2x+1)uπ/16); forward S = A s Aᵀ / 4,
#: inverse s = Aᵀ S A / 4 — float64, exact to ~1e-13 on small-integer
#: coefficient patterns, which is what makes the fixture replayable.
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Flat canonical huffman tables (see module docstring): DC sizes 0..11
# at 4 bits each; AC's 162 (run,size) symbols at 8 bits each. Any
# (bits, values) pair shipped in DHT is a valid JPEG table — the
# decoder builds its codes from the stream, never from these.
DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), the T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF00 stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1s per the spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    # restart markers are consumed at MCU boundaries
                    # by _sync_restart, so any marker reached mid-
                    # block through the bit reader is corruption
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside entropy data"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG entropy stream")


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(size, raw bits) for a coefficient value, T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _extend(raw: int, size: int) -> int:
    """Inverse of :func:`_magnitude_bits` (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt_payload(tid: int, q: "np.ndarray") -> bytes:
    zz = bytes(int(q[y, x]) for y, x in ZIGZAG)
    return bytes([tid]) + zz


def _dht_payload(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)


def _fdct_quant(plane: "np.ndarray", q: "np.ndarray") -> "np.ndarray":
    """(n_by, n_bx, 8, 8) quantized int coefficients for one component
    plane whose dims are multiples of 8 (callers pad first)."""
    h, w = plane.shape
    blocks = (
        plane.astype(np.float64)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        - 128.0
    )
    coef = np.einsum("vy,nmyx,ux->nmvu", _A, blocks, _A) * 0.25
    return np.round(coef / q).astype(np.int64)


def _put_block(
    w: _BitWriter,
    blk: "np.ndarray",
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-code one quantized 8x8 block (DC diff vs ``pred``,
    (run,size)/ZRL/EOB AC coding); returns the new DC predictor."""
    zz = blk[_ZZ_Y, _ZZ_X]
    diff = int(zz[0]) - pred
    size, raw = _magnitude_bits(diff)
    w.put(*dc_codes[size])
    if size:
        w.put(raw, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            w.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        size, raw = _magnitude_bits(v)
        w.put(*ac_codes[(run << 4) | size])
        w.put(raw, size)
        run = 0
    if last_nz < 63:
        w.put(*ac_codes[0x00])  # EOB
    return int(zz[0])


def _encode_scan(
    comp_coefs: list["np.ndarray"],
    dc_codes,
    ac_codes,
    samps: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Interleaved MCU entropy coding with per-component sampling
    factors (T.81 A.2.3): each MCU carries Hi×Vi raster-ordered blocks
    of every component, DC prediction per component. ``samps=None``
    means all-1x1 (the 4:4:4 / grayscale case, where MCU grid = block
    grid). ``dc_codes``/``ac_codes`` may be one shared table dict or a
    per-component list. A nonzero ``restart_interval`` pads to a byte
    and emits RSTn (count mod 8) every that-many MCUs, resetting DC
    prediction — the camera-output framing real corpora carry."""
    if samps is None:
        samps = [(1, 1)] * len(comp_coefs)
    if isinstance(dc_codes, dict):
        dc_codes = [dc_codes] * len(comp_coefs)
    if isinstance(ac_codes, dict):
        ac_codes = [ac_codes] * len(comp_coefs)
    out = bytearray()
    w = _BitWriter()
    n_mcy = comp_coefs[0].shape[0] // samps[0][1]
    n_mcx = comp_coefs[0].shape[1] // samps[0][0]
    pred = [0] * len(comp_coefs)
    rst = 0
    for mcu_no in range(n_mcy * n_mcx):
        if restart_interval and mcu_no and mcu_no % restart_interval == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            w = _BitWriter()
            pred = [0] * len(comp_coefs)
        my, mx = divmod(mcu_no, n_mcx)
        for ci, coefs in enumerate(comp_coefs):
            hi, vi = samps[ci]
            for v in range(vi):
                for u in range(hi):
                    pred[ci] = _put_block(
                        w,
                        coefs[my * vi + v, mx * hi + u],
                        pred[ci],
                        dc_codes[ci],
                        ac_codes[ci],
                    )
    return bytes(out + w.flush())


def _rgb_to_ycbcr(pix: "np.ndarray") -> list["np.ndarray"]:
    r, g, b = (pix[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]


#: subsampling name → luma sampling factors (chroma is always 1x1)
_SUBSAMP = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _box_downsample(plane: "np.ndarray", fx: int, fy: int) -> "np.ndarray":
    """fx×fy box-average downsample (the standard chroma decimation);
    odd trailing edges are handled by edge replication before the
    average, matching the decoder's ceil-sized component planes."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    mean = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
    return np.clip(np.round(mean), 0, 255).astype(np.uint8)


def _encode_baseline(
    planes: list["np.ndarray"],
    samps: list[tuple[int, int]],
    qids: list[int],
    h: int,
    w: int,
    restart_interval: int = 0,
) -> bytes:
    """Assemble the full SOF0 container around an MCU-interleaved scan.
    ``planes[i]`` is component i at its OWN (subsampled) resolution;
    each is padded by edge replication to the MCU grid (ceil(w/8Hmax)
    × ceil(h/8Vmax) MCUs of Hi×Vi blocks) — SOF carries the true dims
    and the decoder crops. Luma codes with DHT 0, chroma (if present)
    with DHT 1 (same flat canonical contents, distinct table ids — so
    decoders must actually honor the SOS table selectors)."""
    qtables = [LUMA_Q] + ([CHROMA_Q] if len(planes) > 1 else [])
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    n_mcx, n_mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coefs = []
    for plane, (hi, vi), qid in zip(planes, samps, qids):
        ch, cw = plane.shape
        ph, pw = n_mcy * vi * 8, n_mcx * hi * 8
        padded = np.pad(plane, ((0, ph - ch), (0, pw - cw)), mode="edge")
        coefs.append(_fdct_quant(padded, qtables[qid]))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for tid, q in enumerate(qtables):
        out += _seg(0xDB, _dqt_payload(tid, q))  # DQT
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qids[ci]])
    out += _seg(0xC0, sof)  # SOF0: baseline
    out += _seg(0xC4, _dht_payload(0, 0, DC_BITS, DC_VALS))  # DHT DC0
    out += _seg(0xC4, _dht_payload(1, 0, AC_BITS, AC_VALS))  # DHT AC0
    if ncomp > 1:
        out += _seg(0xC4, _dht_payload(0, 1, DC_BITS, DC_VALS))  # DHT DC1
        out += _seg(0xC4, _dht_payload(1, 1, AC_BITS, AC_VALS))  # DHT AC1
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, no approx
    out += _seg(0xDA, sos)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    out += _encode_scan(coefs, dc_codes, ac_codes, samps=samps,
                        restart_interval=restart_interval)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_ycbcr(
    y: "np.ndarray",
    cb: "np.ndarray",
    cr: "np.ndarray",
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """REAL baseline JPEG writer from full-resolution YCbCr planes:
    chroma is box-average-decimated per ``subsampling`` ('444', '422'
    horizontal-only, '420' both axes — the dominant real-corpus
    shape), luma carries the sampling factors, and the scan is
    MCU-interleaved. Plane-native entry so deterministic fixtures can
    skip the RGB→YCbCr rounding."""
    fx, fy = _SUBSAMP[subsampling]
    planes = [y] + [_box_downsample(c, fx, fy) for c in (cb, cr)]
    samps = [(fx, fy), (1, 1), (1, 1)]
    h, w = y.shape
    return _encode_baseline(planes, samps, [0, 1, 1], h, w, restart_interval)


def encode_jpeg(
    pix: "np.ndarray", subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """REAL baseline JPEG writer: (h, w) uint8 → grayscale SOF0;
    (h, w, 3) uint8 RGB → YCbCr SOF0 at the requested chroma
    subsampling ('444' default, '422', '420'), optionally with DRI/
    RSTn restart framing every ``restart_interval`` MCUs. Dims are
    padded to the MCU grid by edge replication (the standard move —
    SOF0 carries the true dims, the decoder crops)."""
    if pix.ndim == 2:
        h, w = pix.shape
        return _encode_baseline([pix], [(1, 1)], [0], h, w, restart_interval)
    yp, cbp, crp = _rgb_to_ycbcr(pix)
    return encode_jpeg_ycbcr(yp, cbp, crp, subsampling, restart_interval)


# Progressive scans need EOBn symbols ((r<<4)|0 for r<15), which the
# baseline flat table omits — this flat table carries every (run,size)
# with size 0..10 (176 symbols at 8 bits; EOB0, EOB1..EOB14, ZRL=0xF0)
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_ac_first(zzc: list, ac: dict, al: int) -> bytes:
    """Progressive AC-first scan (G.1.2.2) over one component's
    zigzag blocks: point-transformed magnitudes with EOB-run
    folding of all-insignificant block tails."""
    w = _BitWriter()
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            rb = eobrun.bit_length() - 1
            w.put(*ac[rb << 4])
            if rb:
                w.put(eobrun - (1 << rb), rb)
            eobrun = 0

    for row in zzc:
        for zzv in row:
            r = 0
            for k in range(1, 64):
                v = zzv[k]
                m = abs(v) >> al
                if m == 0:
                    r += 1
                    continue
                flush()
                while r > 15:
                    w.put(*ac[0xF0])  # ZRL
                    r -= 16
                size = m.bit_length()
                w.put(*ac[(r << 4) | size])
                _, raw = _magnitude_bits(m if v > 0 else -m)
                w.put(raw, size)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
    flush()
    return w.flush()


def _encode_ac_refine(zzc: list, ac: dict, al: int) -> bytes:
    """Progressive AC-refinement scan (G.1.2.3): correction bits for
    already-significant coefficients interleaved with newly-
    significant ±2^Al emissions; tails fold into EOB runs whose
    buffered correction bits trail the EOBn symbol — the exact
    libjpeg emission discipline the decoder mirrors."""
    w = _BitWriter()
    eobrun = 0
    pending: list[int] = []

    def flush() -> None:
        nonlocal eobrun, pending
        if eobrun:
            rb = eobrun.bit_length() - 1
            w.put(*ac[rb << 4])
            if rb:
                w.put(eobrun - (1 << rb), rb)
            for b in pending:
                w.put(b, 1)
            eobrun = 0
            pending = []

    for row in zzc:
        for zzv in row:
            absv = [abs(v) >> al for v in zzv]
            eob = 0
            for k in range(1, 64):
                if absv[k] == 1:
                    eob = k
            r = 0
            br: list[int] = []
            for k in range(1, 64):
                t = absv[k]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    flush()
                    w.put(*ac[0xF0])  # ZRL
                    r -= 16
                    for b in br:
                        w.put(b, 1)
                    br = []
                if t > 1:  # already significant → one correction bit
                    br.append(t & 1)
                    continue
                flush()
                w.put(*ac[(r << 4) | 1])
                w.put(1 if zzv[k] > 0 else 0, 1)
                for b in br:
                    w.put(b, 1)
                br = []
                r = 0
            if r or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush()
    flush()
    return w.flush()


def encode_jpeg_progressive(pix: "np.ndarray") -> bytes:
    """REAL progressive JPEG writer (SOF2): grayscale or 4:4:4 color,
    four-stage scan script per component — interleaved DC-first at
    Al=1, interleaved DC-refinement raw bits, AC-first 1..63 at Al=1,
    AC-refinement — so a decoder must get every G.1.2 scan kind right
    to reproduce the coefficients. Progressive is an entropy-layer
    REARRANGEMENT of the same quantized coefficients as baseline, so
    any fixture that round-trips through SOF0 exactly round-trips
    through this writer too. One scan-script body serves every
    profile (review r11): grayscale and 4:4:4 are the (1,1)-sampled
    cases of :func:`_encode_progressive`."""
    if pix.ndim == 2:
        h, w = pix.shape
        return _encode_progressive([pix], [(1, 1)], [0], h, w)
    return encode_jpeg_progressive_ycbcr(*_rgb_to_ycbcr(pix), "444")


def encode_jpeg_progressive_ycbcr(
    y: "np.ndarray",
    cb: "np.ndarray",
    cr: "np.ndarray",
    subsampling: str = "420",
) -> bytes:
    """REAL subsampled PROGRESSIVE JPEG writer (round-11 — the
    subsampled-progressive seam closed): chroma box-decimated per
    ``subsampling``, then the shared G.1.2 scan script
    (:func:`_encode_progressive`). Progressive is an entropy-layer
    rearrangement of the same quantized coefficients, so
    decode(this) == decode(baseline at the same subsampling) exactly —
    the invariant the tests pin."""
    fx, fy = _SUBSAMP[subsampling]
    planes = [y, _box_downsample(cb, fx, fy), _box_downsample(cr, fx, fy)]
    h, w = y.shape
    return _encode_progressive(planes, [(fx, fy), (1, 1), (1, 1)], [0, 1, 1], h, w)


def _encode_progressive(
    planes: list, samps: list, qids: list, h: int, w: int
) -> bytes:
    """The one SOF2 writer body (review r11 folded the 4:4:4 and
    subsampled writers together): interleaved DC-first Al=1 /
    DC-refine scans walk every component's MCU-PADDED block grid
    (Hi×Vi blocks per MCU — T.81 A.2.3), per-component AC-first /
    AC-refine scans walk each component's OWN ceil-sized block raster
    (A.2.2), which for a partial trailing MCU is a strict subset of
    the padded grid. ``planes`` arrive already at their sampled
    resolutions; grayscale/4:4:4 are simply the all-(1,1) case where
    the two grids coincide."""
    qtables = [LUMA_Q] if max(qids) == 0 else [LUMA_Q, CHROMA_Q]
    hmax = max(hi for hi, _vi in samps)
    vmax = max(vi for _hi, vi in samps)
    n_mcx, n_mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    ncomp = len(planes)
    zz = []
    for plane, (hi, vi), qid in zip(planes, samps, qids):
        ph, pw = n_mcy * vi * 8, n_mcx * hi * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        zz.append(_fdct_quant(padded, qtables[qid])[:, :, _ZZ_Y, _ZZ_X].tolist())

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtables):
        out += _seg(0xDB, _dqt_payload(tid, q))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qids[ci]])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _seg(0xC4, _dht_payload(0, 0, DC_BITS, DC_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, PROG_AC_BITS, PROG_AC_VALS))
    dc = _canonical_codes(DC_BITS, DC_VALS)
    ac = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

    def sos(comp_ids: list, ss: int, se: int, ah: int, al: int) -> bytes:
        seg = bytes([len(comp_ids)])
        for cid in comp_ids:
            seg += bytes([cid, 0x00])
        return _seg(0xDA, seg + bytes([ss, se, (ah << 4) | al]))

    def mcu_blocks():
        for my in range(n_mcy):
            for mx in range(n_mcx):
                for ci in range(ncomp):
                    hi, vi = samps[ci]
                    for v in range(vi):
                        for u in range(hi):
                            yield ci, zz[ci][my * vi + v][mx * hi + u]

    all_ids = [ci + 1 for ci in range(ncomp)]
    # scan 1: DC first, interleaved over the MCU grid, Al=1
    w1 = _BitWriter()
    pred = [0] * ncomp
    for ci, blk in mcu_blocks():
        v0 = blk[0] >> 1
        size, raw = _magnitude_bits(v0 - pred[ci])
        pred[ci] = v0
        w1.put(*dc[size])
        if size:
            w1.put(raw, size)
    out += sos(all_ids, 0, 0, 0, 1) + w1.flush()
    # scan 2: DC refinement — low bits in the same MCU order
    w2 = _BitWriter()
    for _ci, blk in mcu_blocks():
        w2.put(blk[0] & 1, 1)
    out += sos(all_ids, 0, 0, 1, 0) + w2.flush()
    # AC scans: non-interleaved, each component's ceil-sized raster
    slices = []
    for ci in range(ncomp):
        hi, vi = samps[ci]
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        slices.append([row[:bw] for row in zz[ci][:bh]])
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 0, 1) + _encode_ac_first(slices[ci], ac, 1)
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 1, 0) + _encode_ac_refine(slices[ci], ac, 0)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _iter_scan_blocks(scan_idx, comps, hmax, vmax, n_mcx, n_mcy, w, h):
    """Yield (mcu_no, ci, by, bx) in coded order: MCU-interleaved
    with Hi×Vi blocks per component for multi-component scans (T.81
    A.2.3); the component's OWN ceil-sized block raster for single-
    component scans (A.2.2 non-interleaved, where every block is its
    own MCU). mcu_no drives restart-interval boundaries."""
    if len(scan_idx) > 1:
        for my in range(n_mcy):
            for mx in range(n_mcx):
                for ci in scan_idx:
                    hi, vi = comps[ci][1], comps[ci][2]
                    for v in range(vi):
                        for u in range(hi):
                            yield my * n_mcx + mx, ci, my * vi + v, mx * hi + u
    else:
        ci = scan_idx[0]
        hi, vi = comps[ci][1], comps[ci][2]
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        for by in range(bh):
            for bx in range(bw):
                yield by * bw + bx, ci, by, bx


def _sync_restart(reader: _BitReader, expect: int) -> None:
    """Byte-align and consume the RSTn marker at a restart boundary
    (F.2.1.3.1): pad bits are discarded, optional 0xFF fill bytes are
    skipped, and the modulo-8 restart count must match."""
    reader._n = 0  # discard pad bits; reader.pos is already past them
    d, p = reader.data, reader.pos
    while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
        p += 1  # fill bytes before the marker
    if p + 1 >= len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
        raise ValueError("expected RSTn marker at restart boundary")
    if d[p + 1] - 0xD0 != expect:
        raise ValueError("RSTn marker out of sequence")
    reader.pos = p + 2


def _decode_scan(reader, scan_sel, band, comps, coefs, hufftables, grid,
                 progressive, interval=0):
    """Entropy-decode ONE scan into the zigzag coefficient arrays.
    ``band`` = (Ss, Se, Ah, Al). Baseline scans must cover the full
    band with no point transform; progressive scans follow the T.81
    G.1.2 split: DC-first/DC-refine (interleaved allowed) and
    single-component AC-first/AC-refine with EOB-run coding and
    in-place coefficient refinement. A nonzero restart ``interval``
    resets DC prediction and EOB runs at every RSTn boundary."""
    ss, se, ah, al = band
    hmax, vmax, n_mcx, n_mcy, w, h = grid
    scan_idx = []
    dctab, actab = {}, {}
    for scid, tsel in scan_sel:
        matches = [i for i, c in enumerate(comps) if c[0] == scid]
        if not matches:
            raise ValueError("SOS references a component absent from SOF")
        ci = matches[0]
        scan_idx.append(ci)
        dctab[ci] = hufftables.get((0, tsel >> 4))
        actab[ci] = hufftables.get((1, tsel & 0x0F))
    if not progressive:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("baseline scan with progressive band parameters")
    else:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and len(scan_idx) != 1:
            raise ValueError("progressive AC scan must be single-component")
    need_dc = ss == 0
    need_ac = se > 0
    for ci in scan_idx:
        if (need_dc and ah == 0 and dctab[ci] is None) or (
            need_ac and actab[ci] is None
        ):
            raise ValueError("JPEG scan references an undefined DHT table")

    pred = {ci: 0 for ci in scan_idx}
    eobrun = 0
    prev_mcu = 0
    rst = 0
    for mcu_no, ci, by, bx in _iter_scan_blocks(
        scan_idx, comps, hmax, vmax, n_mcx, n_mcy, w, h
    ):
        if interval and mcu_no != prev_mcu and mcu_no % interval == 0:
            _sync_restart(reader, rst)
            rst = (rst + 1) % 8
            pred = {c: 0 for c in scan_idx}
            eobrun = 0
        prev_mcu = mcu_no
        coef = coefs[ci][by][bx]
        if not progressive:
            size = _decode_symbol(reader, dctab[ci])
            if size > 11:
                raise ValueError("invalid DC size category")
            pred[ci] += _extend(reader.bits(size), size)
            coef[0] = pred[ci]
            k = 1
            while k < 64:
                sym = _decode_symbol(reader, actab[ci])
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k > 63 or size == 0:
                    raise ValueError("AC coefficient index out of range")
                coef[k] = _extend(reader.bits(size), size)
                k += 1
        elif ss == 0 and ah == 0:  # DC first
            size = _decode_symbol(reader, dctab[ci])
            if size > 11:
                raise ValueError("invalid DC size category")
            pred[ci] += _extend(reader.bits(size), size)
            coef[0] = pred[ci] << al
        elif ss == 0:  # DC refinement: one raw bit per block
            if reader.bit():
                coef[0] |= 1 << al
        elif ah == 0:  # AC first (G.1.2.2): EOB-run coding
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _decode_symbol(reader, actab[ci])
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += reader.bits(run)
                    break
                k += run
                if k > se:
                    raise ValueError("AC coefficient index out of range")
                coef[k] = _extend(reader.bits(size), size) << al
                k += 1
        else:  # AC refinement (G.1.2.3)
            p1 = 1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _decode_symbol(reader, actab[ci])
                    run, size = sym >> 4, sym & 0x0F
                    newval = 0
                    if size == 0:
                        if run != 15:
                            eobrun = 1 << run
                            if run:
                                eobrun += reader.bits(run)
                            break
                        # run == 15: ZRL — pass 16 zero-history coeffs
                    else:
                        if size != 1:
                            raise ValueError(
                                "AC refinement symbol with size != 1"
                            )
                        newval = p1 if reader.bit() else -p1
                    # advance past `run` zero-history coefficients,
                    # refining every nonzero-history one on the way
                    while k <= se:
                        c = coef[k]
                        if c != 0:
                            if reader.bit() and (abs(c) & p1) == 0:
                                coef[k] = c + (p1 if c > 0 else -p1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError(
                                "AC refinement ran past the band end"
                            )
                        coef[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB-run tail: correction bits only, for this block's
                # remaining band and each fully-skipped block after it
                while k <= se:
                    c = coef[k]
                    if c != 0:
                        if reader.bit() and (abs(c) & p1) == 0:
                            coef[k] = c + (p1 if c > 0 else -p1)
                    k += 1
                eobrun -= 1


def decode_jpeg_planes(payload: bytes) -> list["np.ndarray"]:
    """REAL JPEG decode from the spec, stopping at the component
    planes: marker walk, DHT/DQT parsed from the stream, huffman +
    DC-prediction entropy decode with 0xFF00 unstuffing
    (per-component Hi×Vi sampling factors, MCU-interleaved, T.81
    A.2.3), then one vectorized dequantize + zigzag de-scan + float64
    IDCT over every block, round + clamp to 8-bit samples, crop each
    component to its ceil(dim·Hi/Hmax) natural size, and replication-
    upsample chroma to the full (h, w) grid. Both baseline (SOF0,
    single full-band scan or per-component scans) and PROGRESSIVE
    (SOF2) streams decode — progressive scans accumulate into the
    coefficient arrays across DC-first/DC-refine/AC-first/AC-refine
    passes with EOB-run coding (G.1.2). Returns one uint8 (h, w)
    plane per component. Single-component images are non-interleaved
    per the spec, so their sampling factors are ignored. DRI/RSTn
    restart intervals decode with byte-aligned sync, modulo-8
    sequence checks, and DC/EOB-run resets. SUBSAMPLED progressive
    decodes too (round-11): interleaved DC scans walk the MCU-padded
    grids, per-component AC scans each component's ceil-sized raster.
    Arithmetic / hierarchical streams and sampling ratios where
    Hi∤Hmax raise NotImplementedError (the remaining in-format
    seams); corrupt or truncated streams raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    coefs = None  # per comp: (bh, bw, 64) int zigzag coefficient lists
    grid = None
    got_scan = False
    interval = 0  # restart interval in MCUs (DRI; 0 = none)
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}, got 0x{payload[pos]:02X}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # spec-legal fill byte(s) before any marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # TEM/RSTn: standalone markers, no length field
            continue
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X}: only baseline (SOF0) "
                "and progressive huffman (SOF2) are implemented — extended/"
                "arithmetic/hierarchical streams are the remaining seam"
            )
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + length]
        if len(seg) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            at = 0
            while at < len(seg):
                prec, tid = seg[at] >> 4, seg[at] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quantization tables")
                if at + 65 > len(seg):
                    raise ValueError("truncated DQT")
                q = np.zeros((8, 8), dtype=np.int64)
                for k, (y, x) in enumerate(ZIGZAG):
                    q[y, x] = seg[at + 1 + k]
                qtables[tid] = q
                at += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            at = 0
            while at < len(seg):
                cls, tid = seg[at] >> 4, seg[at] & 0x0F
                bits = list(seg[at + 1 : at + 17])
                n = sum(bits)
                vals = list(seg[at + 17 : at + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                codes = _canonical_codes(bits, vals)
                hufftables[(cls, tid)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                at += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"illegal sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            if ncomp == 1:
                # single-component images are non-interleaved (T.81
                # A.2.2): the data-unit order is the plain block
                # raster and the sampling factors play no role
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            # subsampled progressive decodes since round-11: the scan
            # machinery was already general — interleaved DC scans use
            # the MCU-padded grids, non-interleaved AC scans each
            # component's ceil-sized raster (_iter_scan_blocks)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _cid, hi, vi, _tq in comps:
                if hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"sampling ratio {hi}x{vi} does not divide the MCU "
                        f"grid {hmax}x{vmax} — replication upsampling needs "
                        "integer factors (the remaining in-format seam)"
                    )
            n_mcx, n_mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            grid = (hmax, vmax, n_mcx, n_mcy, w, h)
            # plain int lists: progressive refinement is scalar access
            coefs = [
                [[[0] * 64 for _ in range(n_mcx * hi)] for _ in range(n_mcy * vi)]
                for _cid, hi, vi, _tq in comps
            ]
            sof = (h, w, comps)
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = [(seg[1 + 2 * i], seg[2 + 2 * i]) for i in range(ns)]
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            reader = _BitReader(payload, pos + 2 + length)
            _decode_scan(
                reader, scan_sel, (ss, se, ahal >> 4, ahal & 0x0F),
                sof[2], coefs, hufftables, grid, progressive, interval,
            )
            got_scan = True
            # scan data ends where the next true marker begins (the
            # reader consumed whole bytes; stuffed FF00s are data)
            pos = reader.pos
            while pos + 1 < len(payload) and not (
                payload[pos] == 0xFF and payload[pos + 1] != 0x00
            ):
                pos += 1
            continue
        pos += 2 + length
    if sof is None or not got_scan:
        raise ValueError("JPEG without SOF0/SOS")
    h, w, comps = sof
    hmax, vmax, n_mcx, n_mcy, _, _ = grid

    out_planes = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        q = qtables.get(tq)
        if q is None:
            raise ValueError("SOF references an undefined DQT table")
        zz = np.array(coefs[ci], dtype=np.int64)  # (bh, bw, 64)
        bh, bw = zz.shape[:2]
        blk = np.zeros((bh, bw, 8, 8), dtype=np.float64)
        blk[:, :, _ZZ_Y, _ZZ_X] = zz
        blk *= q[None, None]
        s = np.einsum("uy,nmux,xv->nmyv", _A, blk, _A) * 0.25 + 128.0
        plane = s.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        p8 = np.clip(np.round(plane[:ch, :cw]), 0, 255).astype(np.uint8)
        if hi != hmax or vi != vmax:
            p8 = np.repeat(np.repeat(p8, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p8[:h, :w])
    return out_planes


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """:func:`decode_jpeg_planes` plus BT.601 color de-correlation:
    returns (h, w) uint8 for grayscale, (h, w, 3) RGB for color.
    Color conversion runs on the rounded 8-bit samples — the form
    every integer decoder uses, and what keeps plane statistics
    integer-exact for the oracle fixtures."""
    planes = decode_jpeg_planes(payload)
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=2
    )


# ---------------------------------------------------------------------------
# The q148 fixture: block-constant + u=4 AC pattern (module docstring)
# ---------------------------------------------------------------------------

#: g(x) = √2·cos((2x+1)π/4) — the u=4 basis row as exact integers
_G = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)


def synth_jpeg_pixels(doc_id: int) -> "np.ndarray":
    """Deterministic grayscale image whose JPEG round-trip is EXACT:
    w8 = 2 + id%3 / h8 = 2 + id%2 blocks of 8x8; block (bx, by) holds
    ``v + 3a·g(x mod 8)`` with even ``v = 2((17bx + 31by + id) % 106)
    + 20`` (DC quantizes exactly — Q00 = 16) and ``a = (bx + 2by + id)
    % 5 - 2`` on the u=4 coefficient (24a, Q[0][4] = 24 — quantizes
    exactly; the 3a·g pixel contribution is integer). Values stay in
    [14, 236]: no clamping anywhere."""
    w8 = 2 + doc_id % 3
    h8 = 2 + doc_id % 2
    bx = np.arange(w8)[None, :]
    by = np.arange(h8)[:, None]
    v = 2 * ((17 * bx + 31 * by + doc_id) % 106) + 20  # (h8, w8), even
    a = (bx + 2 * by + doc_id) % 5 - 2  # (h8, w8) in [-2, 2]
    # expand to pixels: base per block + the g pattern along x
    base = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)
    amp = np.repeat(np.repeat(3 * a, 8, axis=0), 8, axis=1)
    gx = np.tile(_G, w8)[None, :]
    return (base + amp * gx).astype(np.uint8)


def synth_jpeg_payloads(ids_df: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, payload): REAL baseline JPEG bytes of the
    exact-round-trip fixture."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_jpeg(synth_jpeg_pixels(int(d))) for d in pdf["doc_id"]
                    ],
                }
            )

    from .multimodal import spread_ids

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


JPEG_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, n_px bigint, sum_y bigint, sum_sq bigint"
)


def jpeg_decode_stats(binary_df: DataFrame) -> DataFrame:
    """REAL JPEG decode → integer luma statistics, Arrow-batched.
    ``sum_sq`` is the stat that SEES the AC coefficients (the g
    pattern cancels in a plain sum), so a wrong bit anywhere in the
    huffman/dequant/IDCT chain breaks the hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "n_px", "sum_y", "sum_sq")}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                pix = decode_jpeg(bytes(p)).astype(np.int64)
                h, w = pix.shape
                out["doc_id"].append(int(d))
                out["width"].append(w); out["height"].append(h)
                out["n_px"].append(w * h)
                out["sum_y"].append(int(pix.sum()))
                out["sum_sq"].append(int((pix * pix).sum()))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, schema=JPEG_STATS_SCHEMA)


_JPEG_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         2 + doc_id % 3 AS w8,
         2 + doc_id % 2 AS h8
  FROM documents
), blk AS (
  SELECT d.doc_id, d.w8, d.h8,
         2 * ((17 * bx.bx + 31 * by.by + d.doc_id) % 106) + 20 AS v,
         (bx.bx + 2 * by.by + d.doc_id) % 5 - 2 AS a
  FROM dims d,
       (SELECT unnest(range(4)) AS bx) bx,
       (SELECT unnest(range(3)) AS by) by
  WHERE bx.bx < d.w8 AND by.by < d.h8
)
SELECT doc_id,
       CAST(8 * w8 AS INT) AS width,
       CAST(8 * h8 AS INT) AS height,
       CAST(64 * w8 * h8 AS BIGINT) AS n_px,
       CAST(SUM(64 * v) AS BIGINT) AS sum_y,
       CAST(SUM(64 * v * v + 576 * a * a) AS BIGINT) AS sum_sq
FROM blk GROUP BY doc_id, w8, h8 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# The q151 fixture: 4:2:0 color — q148's luma family + per-MCU-constant
# chroma at 128 + 17t (CHROMA_Q's Q00 = 17, so the chroma DC quantizes
# exactly and the full subsampled round trip is bit-exact)
# ---------------------------------------------------------------------------


def synth_jpeg420_planes(doc_id: int) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """Deterministic YCbCr planes whose 4:2:0 JPEG round-trip is
    EXACT. Luma is the q148 family (block-constant + u=4 basis,
    exact under LUMA_Q). Chroma is constant per 16x16 MCU at
    ``128 + 17t``, t ∈ [-6, 6] — constant full-res chroma per MCU
    box-averages exactly to a constant 8x8 chroma block, whose lone
    DC coefficient ``8·17t`` divides CHROMA_Q's Q00=17 without
    remainder; replication upsampling then reproduces the constant.
    w = 8·(2 + id%3) includes 24 → a PARTIAL trailing MCU in x, so
    the edge-replication pad and the decoder's ceil-crop contract
    are load-bearing under the value hash."""
    w8, h8 = 2 + doc_id % 3, 2 + doc_id % 2
    w, h = 8 * w8, 8 * h8
    bx = np.arange(w8)[None, :]
    by = np.arange(h8)[:, None]
    v = 2 * ((17 * bx + 31 * by + doc_id) % 106) + 20
    a = (bx + 2 * by + doc_id) % 5 - 2
    y = (
        np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)
        + np.repeat(np.repeat(3 * a, 8, axis=0), 8, axis=1) * np.tile(_G, w8)[None, :]
    ).astype(np.uint8)
    gx, gy = np.meshgrid(np.arange(w) // 16, np.arange(h) // 16)
    cb = (128 + 17 * ((3 * gx + 5 * gy + doc_id) % 13 - 6)).astype(np.uint8)
    cr = (128 + 17 * ((7 * gx + 11 * gy + 2 * doc_id) % 13 - 6)).astype(np.uint8)
    return y, cb, cr


def synth_jpeg420_payloads(ids_df: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, payload): REAL 4:2:0 baseline JPEG bytes
    of the exact-round-trip color fixture."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_jpeg_ycbcr(*synth_jpeg420_planes(int(d)), "420")
                        for d in pdf["doc_id"]
                    ],
                }
            )

    from .multimodal import spread_ids

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


JPEG420_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, n_px bigint, "
    "sum_y bigint, sum_sq_y bigint, sum_cb bigint, sum_cr bigint"
)


def jpeg420_decode_stats(binary_df: DataFrame) -> DataFrame:
    """REAL subsampled-JPEG decode → integer per-plane statistics,
    Arrow-batched. ``sum_sq_y`` sees the luma AC term; ``sum_cb`` /
    ``sum_cr`` are sums over the replication-UPSAMPLED full-res
    chroma, so a wrong MCU interleave order, chroma table selection,
    upsample factor, or ceil-crop all break the hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "width", "height", "n_px", "sum_y", "sum_sq_y",
                "sum_cb", "sum_cr")
        for pdf in batches:
            out = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                y, cb, cr = (pl.astype(np.int64) for pl in decode_jpeg_planes(bytes(p)))
                h, w = y.shape
                out["doc_id"].append(int(d))
                out["width"].append(w); out["height"].append(h)
                out["n_px"].append(w * h)
                out["sum_y"].append(int(y.sum()))
                out["sum_sq_y"].append(int((y * y).sum()))
                out["sum_cb"].append(int(cb.sum()))
                out["sum_cr"].append(int(cr.sum()))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, schema=JPEG420_STATS_SCHEMA)


_JPEG420_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         2 + doc_id % 3 AS w8,
         2 + doc_id % 2 AS h8
  FROM documents
), luma AS (
  SELECT d.doc_id,
         SUM(64 * (2 * ((17 * bx.bx + 31 * by.by + d.doc_id) % 106) + 20)) AS sum_y,
         SUM(64 * (2 * ((17 * bx.bx + 31 * by.by + d.doc_id) % 106) + 20)
                * (2 * ((17 * bx.bx + 31 * by.by + d.doc_id) % 106) + 20)
             + 576 * ((bx.bx + 2 * by.by + d.doc_id) % 5 - 2)
                   * ((bx.bx + 2 * by.by + d.doc_id) % 5 - 2)) AS sum_sq_y
  FROM dims d,
       (SELECT unnest(range(4)) AS bx) bx,
       (SELECT unnest(range(3)) AS by) by
  WHERE bx.bx < d.w8 AND by.by < d.h8
  GROUP BY d.doc_id
), chroma AS (
  SELECT d.doc_id,
         SUM((128 + 17 * ((3 * mx.mx + 5 * my.my + d.doc_id) % 13 - 6))
             * LEAST(16, 8 * d.w8 - 16 * mx.mx)
             * LEAST(16, 8 * d.h8 - 16 * my.my)) AS sum_cb,
         SUM((128 + 17 * ((7 * mx.mx + 11 * my.my + 2 * d.doc_id) % 13 - 6))
             * LEAST(16, 8 * d.w8 - 16 * mx.mx)
             * LEAST(16, 8 * d.h8 - 16 * my.my)) AS sum_cr
  FROM dims d,
       (SELECT unnest(range(2)) AS mx) mx,
       (SELECT unnest(range(2)) AS my) my
  WHERE 16 * mx.mx < 8 * d.w8 AND 16 * my.my < 8 * d.h8
  GROUP BY d.doc_id
)
SELECT d.doc_id,
       CAST(8 * d.w8 AS INT) AS width,
       CAST(8 * d.h8 AS INT) AS height,
       CAST(64 * d.w8 * d.h8 AS BIGINT) AS n_px,
       CAST(l.sum_y AS BIGINT) AS sum_y,
       CAST(l.sum_sq_y AS BIGINT) AS sum_sq_y,
       CAST(c.sum_cb AS BIGINT) AS sum_cb,
       CAST(c.sum_cr AS BIGINT) AS sum_cr
FROM dims d
JOIN luma l USING (doc_id)
JOIN chroma c USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "q151_jpeg_subsampled_stats",
    oracle=_JPEG420_ORACLE,
    doc="REAL 4:2:0 chroma-subsampled JPEG decode (round-10, closing "
    "the dominant real-corpus image shape): deterministic YCbCr "
    "planes — the q148 luma family plus per-MCU-constant chroma at "
    "128+17t — are box-decimated, MCU-interleaved (Y 2x2 + Cb + Cr "
    "blocks per MCU, chroma on its OWN DHT tables), entropy-coded, "
    "then decoded back from the spec alone: sampling factors parsed "
    "from SOF0, per-component MCU block placement, ceil-sized "
    "component crops, replication upsampling to the full grid. The "
    "fixture quantizes exactly under both Annex-K tables (luma as in "
    "q148; chroma DC 8·17t divides Q00=17), so the full lossy "
    "subsampled pipeline is integer-EXACT and DuckDB replays every "
    "plane sum in closed form — w=24 images carry a PARTIAL trailing "
    "MCU, putting the pad/crop contract under the value hash. "
    "Remaining in-format seams: subsampled progressive and "
    "non-integer sampling ratios. Plan shape as q148: ids fan-out + "
    "two MapInPandas, payload bytes never shuffle, presentation sort "
    "on the 8-column stats frame.",
)
def q151_jpeg_subsampled_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from . import jpeg as _m, multimodal as _mm
    payloads = _mm.cached_payloads(spark, sf_dir, "jpeg151", synth_jpeg420_payloads, d, (_m,))
    return jpeg420_decode_stats(payloads).orderBy("doc_id")


def synth_jpeg_prog_payloads(ids_df: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, payload): REAL progressive (SOF2) JPEG
    bytes of the q148 exact-round-trip fixture — same pixels, same
    quantized coefficients, entirely different entropy arrangement."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_jpeg_progressive(synth_jpeg_pixels(int(d)))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    from .multimodal import spread_ids

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


@register(
    "q153_jpeg_progressive_stats",
    oracle=_JPEG_ORACLE,
    doc="REAL progressive-JPEG decode (round-10, closing the last "
    "major JPEG seam): the q148 fixture pixels are written as genuine "
    "SOF2 streams — interleaved DC-first at Al=1, DC-refinement raw "
    "bits, per-component AC-first with EOB-run folding, AC-refinement "
    "with buffered correction bits (the libjpeg emission discipline) "
    "— and decoded by accumulating all four G.1.2 scan kinds into the "
    "coefficient arrays before one vectorized dequant+IDCT. "
    "Progressive rearranges the SAME quantized coefficients as "
    "baseline, so the oracle is q148's closed form verbatim, and a "
    "pytest additionally pins decode(progressive(x)) == "
    "decode(baseline(x)) bit-for-bit on random images. Remaining "
    "in-format seams: subsampled progressive and arithmetic coding. Plan shape as q148: ids fan-out + two "
    "MapInPandas, payload bytes never shuffle.",
)
def q153_jpeg_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from . import jpeg as _m, multimodal as _mm
    payloads = _mm.cached_payloads(spark, sf_dir, "jpeg153", synth_jpeg_prog_payloads, d, (_m,))
    return jpeg_decode_stats(payloads).orderBy("doc_id")


def synth_jpeg420_prog_payloads(ids_df: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, payload): REAL subsampled-PROGRESSIVE
    (SOF2 + 4:2:0) JPEG bytes of the q151 exact color fixture — same
    pixels, same quantized coefficients, G.1.2 scan script over the
    two grids (MCU-padded DC, ceil-raster AC)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_jpeg_progressive_ycbcr(
                            *synth_jpeg420_planes(int(d)), "420"
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    from .multimodal import spread_ids

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


@register(
    "q158_jpeg420_progressive_stats",
    oracle=_JPEG420_ORACLE,
    doc="REAL subsampled-PROGRESSIVE JPEG decode (round-11 — the "
    "combination seam closed; 4:2:0 progressive is what phone cameras "
    "and web optimizers actually emit): the q151 exact color fixture "
    "is written as SOF2 with 2x2/1x1/1x1 sampling factors and the "
    "full G.1.2 scan script — interleaved DC-first/DC-refine over the "
    "MCU-PADDED block grids, per-component AC-first/AC-refine with "
    "EOB-run coding over each component's CEIL-SIZED raster (a "
    "partial trailing MCU makes the two grids differ, putting the "
    "distinction under the value hash) — and decoded by the same "
    "general scan machinery as q151/q153. Progressive rearranges the "
    "identical quantized coefficients, so the oracle is q151's closed "
    "form verbatim, and pytest pins decode(prog420(x)) == "
    "decode(baseline420(x)) plane-exactly on random images at every "
    "subsampling. Remaining in-format seams: arithmetic coding, "
    "hierarchical, non-integer sampling ratios. Plan shape as q148.",
)
def q158_jpeg420_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from . import jpeg as _m, multimodal as _mm
    payloads = _mm.cached_payloads(
        spark, sf_dir, "jpeg158", synth_jpeg420_prog_payloads, d, (_m,)
    )
    return jpeg420_decode_stats(payloads).orderBy("doc_id")


@register(
    "q148_jpeg_decode_stats",
    oracle=_JPEG_ORACLE,
    doc="REAL entropy-coded codec decode (round-10): deterministic "
    "grayscale images are encoded as genuine baseline JPEG — float64 "
    "forward DCT, Annex-K quantization, zigzag, DC-diff + (run,size) "
    "huffman with a 13-zero run to the zigzag-14 coefficient, EOB, "
    "0xFF00 byte stuffing — and decoded back from the spec alone "
    "(marker walk, DHT tables parsed from the stream, bit-level "
    "huffman decode, dequantize, IDCT, round+clamp) inside the same "
    "Arrow-batched mapInPandas plumbing as q108/q146. The fixture's "
    "block-constant + u=4-basis pixels make the lossy pipeline "
    "integer-EXACT end to end (DC and the one AC coefficient quantize "
    "without remainder), so DuckDB replays the decoded pixels in "
    "closed form — sum_sq sees the AC term (576·a² per block), so one "
    "wrong huffman bit or IDCT scale factor breaks the value hash. "
    "Remaining multimodal seams: WebP/AVIF and H.264 pixel decode "
    "(4:2:0/4:2:2 joined as q151, progressive as q153; FLAC as q149, "
    "GIF as q150). Payload bytes never shuffle — the exchanges "
    "are the 8-byte ids fan-out (spread_ids, full decode parallelism "
    "at any corpus split count) and the 6-column stats frame's "
    "presentation sort.",
)
def q148_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from . import jpeg as _m, multimodal as _mm
    payloads = _mm.cached_payloads(spark, sf_dir, "jpeg148", synth_jpeg_payloads, d, (_m,))
    return jpeg_decode_stats(payloads).orderBy("doc_id")
