"""WebP-lossless (VP8L) codec invariants (round 10, operators/
webp.py): literal/palette encoder round trips, hand-built wire
streams for the LZ77 + color-cache + subtract-green decode paths the
fixture encoder never emits, and the loud seams."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.webp import (
    _HASH_MUL,
    _LsbWriter,
    _encode_codes,
    _vp8l_container,
    _write_code_lengths,
    _write_flat_code,
    _write_single_code,
    decode_vp8l,
    encode_vp8l,
    encode_vp8l_palette,
)


def test_literal_streams_round_trip():
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
        synth_pixels,
    )

    for d in range(24):
        pix = synth_pixels(d)
        out = decode_vp8l(encode_vp8l(pix))
        assert out.shape == (*pix.shape[:2], 4)
        assert (out[:, :, :3] == pix).all() and (out[:, :, 3] == 255).all(), d
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert (decode_vp8l(encode_vp8l(img))[:, :, :3] == img).all()


def test_palette_transform_round_trip():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (20, 3), dtype=np.uint8)
    idx = rng.integers(0, 20, (11, 14), dtype=np.uint8)
    out = decode_vp8l(encode_vp8l_palette(idx, pal))
    assert (out[:, :, :3] == pal[idx]).all() and (out[:, :, 3] == 255).all()
    # small palettes now BUNDLE (round-11); a 1-entry palette is the
    # remaining invalid input
    with pytest.raises(ValueError, match="2..256"):
        encode_vp8l_palette(idx % 1, pal[:1])


def _header(w: int, h: int) -> _LsbWriter:
    wr = _LsbWriter()
    wr.put(w - 1, 14)
    wr.put(h - 1, 14)
    wr.put(0, 1)  # alpha hint
    wr.put(0, 3)  # version
    return wr


def test_lz77_and_color_cache_decode_hand_built_stream():
    """The fixture encoder is literal-only, so LZ77 back-references
    (absolute distances) and color-cache hits are pinned by a stream
    written symbol-by-symbol: two literals, a length-3 copy at
    distance 2, then a cache hit — every emitted pixel must also
    land in the cache on the way."""
    w, h, cache_bits = 6, 1, 1
    # two literal pixels differing only in green
    px = [(255 << 24) | (10 << 16) | (g << 8) | 20 for g in (7, 9)]
    slot = [((_HASH_MUL * p) & 0xFFFFFFFF) >> (32 - cache_bits) for p in px]

    wr = _header(w, h)
    wr.put(0, 1)  # no transforms
    wr.put(1, 1)  # color cache present
    wr.put(cache_bits, 4)
    wr.put(0, 1)  # no meta prefix codes
    # green code over 282 symbols: literals 7 and 9, length symbol
    # 258 (copy length 3), cache symbol for px0's slot — complete at
    # 2 bits each
    glen = [0] * 282
    glen[7] = glen[9] = glen[258] = glen[280 + slot[0]] = 2
    _write_code_lengths(wr, glen)
    gcodes = _encode_codes(glen)
    _write_single_code(wr, 10)  # red
    _write_single_code(wr, 20)  # blue
    _write_single_code(wr, 255)  # alpha
    _write_single_code(wr, 13)  # distance code 13 → 97..128
    # pixel 0, 1: literals
    wr.put_code(*gcodes[7])
    wr.put_code(*gcodes[9])
    # pixels 2-4: copy length 3; distance code 13 costs 0 bits, then
    # 5 extra bits: value = (2+1)<<5 + extra + 1 = 122 → d = 2
    wr.put_code(*gcodes[258])
    wr.put(122 - 97, 5)
    # pixel 5: cache hit on px0's slot
    wr.put_code(*gcodes[280 + slot[0]])

    out = decode_vp8l(_vp8l_container(wr.bytes()))
    got = [
        (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b, a in out.reshape(-1, 4)
    ]
    # copies alternate over the 2-pixel prefix
    assert got[:5] == [px[0], px[1], px[0], px[1], px[0]]
    # cache state at pixel 5: every emitted pixel inserted, so the
    # slot holds the LAST pixel that hashed there
    cache = {}
    for p in got[:5]:
        cache[((_HASH_MUL * p) & 0xFFFFFFFF) >> (32 - cache_bits)] = p
    assert got[5] == cache[slot[0]]


def test_subtract_green_transform_decodes():
    """Hand-built subtract-green stream: stored r/b carry the green
    channel subtracted mod 256; the inverse transform must restore
    the original RGB exactly."""
    rng = np.random.default_rng(9)
    pix = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8).astype(np.int64)
    wr = _header(7, 5)
    wr.put(1, 1)  # transform present
    wr.put(2, 2)  # subtract green
    wr.put(0, 1)  # end of transforms
    wr.put(0, 1)  # no color cache
    wr.put(0, 1)  # no meta prefix codes
    _write_flat_code(wr, 256 + 24, 256)  # green
    _write_flat_code(wr, 256, 256)  # red
    _write_flat_code(wr, 256, 256)  # blue
    _write_single_code(wr, 255)  # alpha
    _write_single_code(wr, 0)  # distance
    for r, g, b in pix.reshape(-1, 3):
        wr.put_code(int(g), 8)
        wr.put_code(int((r - g) % 256), 8)
        wr.put_code(int((b - g) % 256), 8)
    out = decode_vp8l(_vp8l_container(wr.bytes()))
    assert (out[:, :, :3] == pix).all()


def test_loud_seams_and_corruption():
    # lossy and extended profiles are out by design
    import struct

    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"xxxx"
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_vp8l(lossy)
    with pytest.raises(NotImplementedError, match="WebP"):
        decode_vp8l(b"II*\x00 not riff")
    # predictor transform is the named seam
    wr = _header(4, 4)
    wr.put(1, 1)
    wr.put(0, 2)  # predictor
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_vp8l(_vp8l_container(wr.bytes()))
    # pixel bundling and meta prefix codes are WORKING profiles since
    # round-11 (pinned by their round-trip tests below); a truncated
    # bundled/meta stream now fails as plain corruption
    wr = _header(4, 4)
    wr.put(1, 1)
    wr.put(3, 2)  # color indexing
    wr.put(9, 8)  # 10 entries → bundled, then nothing: truncation
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8l(_vp8l_container(wr.bytes()))
    # the 2D neighbor distance map is the named seam: distance code 0
    # decodes to dval 1 ≤ 120
    wr = _header(2, 1)
    wr.put(0, 1)
    wr.put(0, 1)
    wr.put(0, 1)
    glen = [0] * 280
    glen[7] = 1
    glen[256] = 1  # length symbol (length 1)
    _write_code_lengths(wr, glen)
    gcodes = _encode_codes(glen)
    for sym in (10, 20, 255):
        _write_single_code(wr, sym)
    _write_single_code(wr, 0)  # distance code 0 → dval 1
    wr.put_code(*gcodes[7])  # one literal
    wr.put_code(*gcodes[256])  # copy length 1, distance 1 → neighbor map
    with pytest.raises(NotImplementedError, match="neighbor"):
        decode_vp8l(_vp8l_container(wr.bytes()))
    # truncation is corruption
    good = encode_vp8l(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_vp8l(good[: len(good) - 6])
    # bad signature byte
    bad = bytearray(good)
    bad[bad.index(b"VP8L") + 8] = 0x2E
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(bytes(bad))


def test_decode_image_dispatches_webp():
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
        decode_image,
        synth_pixels,
    )

    pix = synth_pixels(6)
    out = decode_image(encode_vp8l(pix))
    assert out.shape == pix.shape and (out == pix).all()


def test_q154_matches_oracle(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    from .oracle_check import compare

    q = all_queries()["q154_webp_lossless_stats"]
    assert compare(spark, "q154", q.build, q.oracle, "/root/testdata/sf0.001") == []


def test_vp8l_pixel_bundled_palettes_round_trip():
    """Round-11: the ≤16-color pixel-bundling seam closed. Every
    bundling tier (2 colors → 8 px/byte, 4 → 4, 16 → 2) and the
    unbundled 17-color edge round-trip through real wire bytes, at
    widths that exercise the partial trailing bundle (w not a
    multiple of pixels-per-byte)."""
    import numpy as np

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.webp import (
        decode_vp8l,
        encode_vp8l_palette,
    )

    rng = np.random.default_rng(3)
    for npal in (2, 3, 4, 5, 9, 16, 17):
        pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
        for w in (1, 7, 8, 13, 16):
            idx = rng.integers(0, npal, (5, w), dtype=np.uint8)
            out = decode_vp8l(encode_vp8l_palette(idx, pal))
            assert (out[:, :, :3] == pal[idx]).all(), (npal, w)
            assert (out[:, :, 3] == 255).all(), (npal, w)


def test_vp8l_meta_prefix_codes_round_trip():
    """Round-11: the meta-prefix-code (entropy image) seam closed.
    Two prefix-code groups assigned by block parity — group 1's green
    is a 0-bit single-symbol code, so a decoder picking the wrong
    group for any block desynchronizes the stream instead of
    near-missing. Includes the single-block image (only group 0 may
    be transmitted: the group count is DERIVED from the entropy
    image's max index) and a prefix_bits=3 variant."""
    import numpy as np

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.webp import (
        META_CONST_GREEN,
        decode_vp8l,
        encode_vp8l_meta,
    )

    rng = np.random.default_rng(5)
    for (h, w), pb in (((9, 13), 2), ((4, 4), 2), ((17, 5), 2), ((32, 9), 3)):
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                if ((x >> pb) + (y >> pb)) & 1:
                    pix[y, x, 1] = META_CONST_GREEN
        out = decode_vp8l(encode_vp8l_meta(pix, prefix_bits=pb))
        assert (out[:, :, :3] == pix).all(), (h, w, pb)


def test_prefix_table_matches_canonical_walk_on_random_codes():
    """Property pin for the round-11 table-driven decoder: for random
    Kraft-COMPLETE canonical codes (built by repeated leaf splitting,
    so lengths run past the 10-bit root into the fallback path) and
    random symbol streams, _PrefixTable.decode must agree symbol-for-
    symbol with the textbook bit-by-bit canonical walk, and consume
    exactly the same number of bits."""
    import random

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.webp import (
        _LsbWriter,
        _LsbReader,
        _PrefixTable,
        _canonical_from_lengths,
        _encode_codes,
    )

    rng = random.Random(20250816)
    for trial in range(40):
        n_leaves = rng.randint(2, 220)
        # random full binary tree → Kraft-complete length multiset
        depths = [1, 1]
        while len(depths) < n_leaves:
            i = rng.randrange(len(depths))
            d = depths.pop(i)
            if d >= 15:  # spec cap; pick another leaf
                depths.append(d)
                continue
            depths += [d + 1, d + 1]
        alphabet = len(depths) + rng.randint(0, 40)
        syms = rng.sample(range(alphabet), len(depths))
        lengths = [0] * alphabet
        for s, d in zip(syms, depths):
            lengths[s] = d
        table = _PrefixTable(lengths)
        enc = _encode_codes(lengths)
        dict_walk = _canonical_from_lengths(lengths)

        stream = [rng.choice(syms) for _ in range(200)]
        w = _LsbWriter()
        for s in stream:
            w.put_code(*enc[s])
        data = w.bytes()

        r = _LsbReader(data)
        got = [table.decode(r) for s in stream]
        assert got == stream, f"trial {trial}: table decode diverged"

        # reference: textbook canonical walk over the same bytes
        r2 = _LsbReader(data)
        ref = []
        for _ in stream:
            code, ln = 0, 0
            while True:
                code = (code << 1) | r2.bit()
                ln += 1
                s = dict_walk.get((ln, code))
                if s is not None:
                    ref.append(s)
                    break
        assert ref == stream
        # identical consumption: both readers sit at the same bit
        assert r._total_bits == r2._total_bits, f"trial {trial}: bit drift"
