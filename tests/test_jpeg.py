"""Baseline JPEG codec invariants (round 10, operators/jpeg.py):
entropy-layer losslessness on arbitrary coefficients, fixture
exactness, bounded lossy error on general images, DHT generality
(non-flat tables), and the loud seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.jpeg import (
    _A,
    _ZZ_X,
    _ZZ_Y,
    AC_BITS,
    AC_VALS,
    DC_BITS,
    DC_VALS,
    LUMA_Q,
    _canonical_codes,
    _dht_payload,
    _dqt_payload,
    _encode_scan,
    _seg,
    decode_jpeg,
    decode_jpeg_planes,
    encode_jpeg,
    encode_jpeg_ycbcr,
    synth_jpeg_pixels,
    synth_jpeg420_planes,
)

#: The ITU T.81 Annex K DC luminance table — a NON-flat bits
#: distribution, used to prove the decoder's canonical-code builder
#: handles arbitrary DHT segments, not just our flat encoder tables.
K_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]


def _assemble_jpeg(coefs: np.ndarray, h: int, w: int,
                   dc_bits=DC_BITS, dc_vals=DC_VALS) -> bytes:
    """Hand-assemble a 1-component baseline JPEG from QUANTIZED
    coefficient blocks (n_by, n_bx, 8, 8) — bypasses the encoder's
    DCT so the entropy layer is tested on arbitrary integers."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, _dqt_payload(0, LUMA_Q))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, _dht_payload(0, 0, dc_bits, dc_vals))
    out += _seg(0xC4, _dht_payload(1, 0, AC_BITS, AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += _encode_scan(
        [coefs], _canonical_codes(dc_bits, dc_vals), _canonical_codes(AC_BITS, AC_VALS)
    )
    out += b"\xff\xd9"
    return bytes(out)


def _expected_pixels(coefs: np.ndarray) -> np.ndarray:
    """Reference dequant+IDCT of quantized coefficient blocks."""
    n_by, n_bx = coefs.shape[:2]
    img = np.zeros((n_by * 8, n_bx * 8))
    for by in range(n_by):
        for bx in range(n_bx):
            s = _A.T @ (coefs[by, bx] * LUMA_Q).astype(float) @ _A * 0.25
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = s + 128.0
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def test_entropy_layer_lossless_on_random_coefficients():
    """Huffman + DC-diff + (run,size)/ZRL/EOB + byte stuffing is a
    LOSSLESS layer: random quantized coefficients round-trip exactly
    through encode_scan → decode (checked via the reference IDCT —
    decoder and test share only the table constants)."""
    rng = np.random.default_rng(42)
    # sparse-ish blocks with long zero runs (exercises ZRL) and
    # occasional dense ones; DC range wide enough for most size cats
    coefs = np.zeros((3, 4, 8, 8), dtype=np.int64)
    for by in range(3):
        for bx in range(4):
            blk = np.zeros(64, dtype=np.int64)
            blk[0] = rng.integers(-400, 400)
            n_ac = int(rng.integers(0, 12))
            pos = rng.choice(np.arange(1, 64), size=n_ac, replace=False)
            blk[pos] = rng.integers(-80, 80, size=n_ac)
            b8 = np.zeros((8, 8), dtype=np.int64)
            b8[_ZZ_Y, _ZZ_X] = blk
            coefs[by, bx] = b8
    dec = decode_jpeg(_assemble_jpeg(coefs, 24, 32))
    assert (dec == _expected_pixels(coefs)).all()


def test_decoder_handles_non_flat_dht_tables():
    """The decoder builds codes from the stream's DHT — feed it the
    Annex-K (non-flat) DC table to pin generality beyond our flat
    encoder tables."""
    coefs = np.zeros((1, 2, 8, 8), dtype=np.int64)
    coefs[0, 0, 0, 0] = 37
    coefs[0, 1, 0, 0] = -91
    coefs[0, 1, 0, 4] = 5
    dec = decode_jpeg(_assemble_jpeg(coefs, 8, 16, dc_bits=K_DC_BITS))
    assert (dec == _expected_pixels(coefs)).all()


def test_fixture_family_roundtrips_exactly():
    """The q148 fixture: block-constant + u=4 pattern images survive
    the FULL lossy pipeline (float DCT, quantization, huffman, IDCT)
    bit-for-bit — the property the oracle replay rests on."""
    for d in range(40):
        pix = synth_jpeg_pixels(d)
        assert (decode_jpeg(encode_jpeg(pix)) == pix).all(), d


def test_general_images_bounded_error_and_crop():
    rng = np.random.default_rng(7)
    # smooth gradient: quantization error stays small
    y, x = np.mgrid[0:16, 0:24]
    smooth = ((y * 3 + x * 2) % 200 + 20).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(smooth))
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 12
    # non-multiple-of-8 dims: SOF carries true dims, decoder crops
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(img)).shape == (13, 21)


def test_color_444_block_constant_tight_bound():
    """4:4:4 color: constant-color blocks land DC-only, so the error
    budget is DC quantization (≤ Q00/16 per channel) + two BT.601
    roundings — ±3 overall."""
    solid = np.zeros((16, 16, 3), dtype=np.uint8)
    solid[:8, :, 0] = 200
    solid[:, :8, 1] = 120
    solid[:, :, 2] = 64
    dec = decode_jpeg(encode_jpeg(solid))
    assert dec.shape == (16, 16, 3)
    assert np.abs(dec.astype(int) - solid.astype(int)).max() <= 3


def test_loud_seams_and_corruption():
    good = encode_jpeg(synth_jpeg_pixels(3))
    # extended-sequential (SOF1) is a remaining SOF seam
    ext = good.replace(b"\xff\xc0", b"\xff\xc1", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(ext)
    # a baseline stream whose SOF marker is PATCHED to progressive is
    # corrupt (its scan carries baseline band parameters), not a seam
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # truncations anywhere are ValueError (corrupt, not seam)
    for cut in (len(good) // 3, len(good) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(good[:cut])
    # single-component scans are non-interleaved (T.81 A.2.2): the
    # sampling factors are ignored, so patching them must not change
    # the decode
    sof_at = good.index(b"\xff\xc0")
    sub = bytearray(good)
    sub[sof_at + 11] = 0x22  # component 1 sampling h=2,v=2
    assert (decode_jpeg(bytes(sub)) == synth_jpeg_pixels(3)).all()
    # a sampling ratio that doesn't divide the MCU grid is the seam
    color = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), "420")
    csof = color.index(b"\xff\xc0")
    bad = bytearray(color)
    bad[csof + 11] = 0x31  # luma 3x1 vs chroma 1x1: 3 % 1 ok, but
    bad[csof + 14] = 0x21  # chroma-Cb 2x1: 3 % 2 != 0 → seam
    with pytest.raises(NotImplementedError, match="sampling ratio"):
        decode_jpeg(bytes(bad))
    # out-of-spec sampling factors are corruption, not a seam
    zero = bytearray(color)
    zero[csof + 11] = 0x02
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(zero))
    # a declared restart interval whose RST markers never appear in
    # the entropy data is corruption (sync fails at the boundary)
    dri = good[:2] + _seg(0xDD, struct.pack(">H", 1)) + good[2:]
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(dri)
    # not a JPEG at all
    with pytest.raises(NotImplementedError, match="signature"):
        decode_jpeg(b"GIF89a")


def test_420_fixture_roundtrips_exactly():
    """The q151 fixture: q148 luma + per-MCU-constant chroma at
    128+17t survives the FULL 4:2:0 pipeline (box decimation, MCU
    interleave, chroma DHT-1 tables, huffman, IDCT, replication
    upsample, ceil-crop) bit-for-bit per plane — the property the
    q151 oracle replay rests on. id%3==1 widths (24 px) carry a
    partial trailing MCU."""
    for d in range(40):
        y, cb, cr = synth_jpeg420_planes(d)
        pl = decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, "420"))
        assert (pl[0] == y).all() and (pl[1] == cb).all() and (pl[2] == cr).all(), d


def test_subsampled_general_images_bounded_error():
    """4:2:0 and 4:2:2 on a smooth color gradient: chroma decimation
    + DC quantization keeps the error small; odd (non-multiple-of-
    MCU) dims crop to the true size."""
    yy, xx = np.mgrid[0:20, 0:30]
    img = np.stack(
        [((yy * 3 + xx * 2) % 200 + 20), ((yy * 2 + xx) % 180 + 30),
         ((yy + xx * 3) % 160 + 40)], axis=2
    ).astype(np.uint8)
    for mode in ("422", "420"):
        dec = decode_jpeg(encode_jpeg(img, mode))
        assert dec.shape == (20, 30, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16, mode


def test_420_mcu_interleave_order_is_y4_cb_cr():
    """Pin the T.81 A.2.3 block order inside a 4:2:0 MCU (Y raster
    2x2, then Cb, then Cr) by giving each luma block a distinct
    constant: a decoder that walked blocks in any other order would
    scramble the quadrants."""
    y = np.zeros((16, 16), dtype=np.uint8)
    vals = [40, 80, 120, 160]
    y[:8, :8], y[:8, 8:], y[8:, :8], y[8:, 8:] = vals
    cb = np.full((16, 16), 128 + 17 * 2, dtype=np.uint8)
    cr = np.full((16, 16), 128 - 17 * 3, dtype=np.uint8)
    pl = decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, "420"))
    assert (pl[0] == y).all()
    assert (pl[1] == cb).all() and (pl[2] == cr).all()


def test_progressive_equals_baseline_on_random_images():
    """Progressive (SOF2) rearranges the SAME quantized coefficients
    as baseline, so decode(progressive(x)) must equal
    decode(baseline(x)) BIT-FOR-BIT — the strongest equivalence the
    format offers, covering all four G.1.2 scan kinds (DC first/
    refine, AC first/refine with EOB runs) on arbitrary content."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    for _ in range(6):
        hh, ww = int(rng.integers(8, 48)), int(rng.integers(8, 48))
        img = rng.integers(0, 256, (hh, ww), dtype=np.uint8)
        assert (
            decode_jpeg(encode_jpeg(img)) == decode_jpeg(encode_jpeg_progressive(img))
        ).all()
    color = rng.integers(0, 256, (21, 29, 3), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg(color)) == decode_jpeg(encode_jpeg_progressive(color))
    ).all()


def test_progressive_eob_runs_across_blocks():
    """A mostly-flat image with isolated outliers makes most blocks
    all-insignificant in the AC scans, so EOB runs span many blocks
    (and refinement correction bits ride the run buffers) — the
    cross-block state the per-block baseline coder never exercises."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.full((48, 64), 130, dtype=np.uint8)
    img[5, 7] = 250
    img[37, 51] = 10
    img[20, 20] = 180
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert (base == prog).all()
    # the q148 fixture family is exact through progressive too
    for d in range(12):
        pix = synth_jpeg_pixels(d)
        assert (decode_jpeg(encode_jpeg_progressive(pix)) == pix).all(), d


def test_restart_intervals_round_trip_and_sequence_check():
    """DRI/RSTn framing (camera output): byte-aligned RST sync with
    DC-prediction resets keeps every fixture round trip exact at any
    interval, including 4:2:0 subsampled streams; an out-of-sequence
    RST number is loud corruption."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.jpeg import (
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
        synth_jpeg420_planes,
    )

    for d in (0, 3, 10):
        pix = synth_jpeg_pixels(d)
        for ri in (1, 2, 5):
            assert (decode_jpeg(encode_jpeg(pix, restart_interval=ri)) == pix).all()
        y, cb, cr = synth_jpeg420_planes(d)
        pl = decode_jpeg_planes(
            encode_jpeg_ycbcr(y, cb, cr, "420", restart_interval=2)
        )
        assert (pl[0] == y).all() and (pl[1] == cb).all() and (pl[2] == cr).all()
    good = encode_jpeg(synth_jpeg_pixels(5), restart_interval=2)
    at = good.index(b"\xff\xd0")
    bad = bytearray(good)
    bad[at + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(bad))


def test_subsampled_progressive_decodes():
    """Superseded seam (round-11): subsampled progressive is now a
    working profile — the full equivalence pin lives in
    test_subsampled_progressive_equals_baseline."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.jpeg import (
        decode_jpeg_planes,
        encode_jpeg_progressive_ycbcr,
    )

    y = np.full((16, 16), 99, dtype=np.uint8)
    planes = decode_jpeg_planes(encode_jpeg_progressive_ycbcr(y, y, y, "420"))
    assert planes[0].shape == (16, 16)


def test_q153_matches_oracle(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    from .oracle_check import compare

    q = all_queries()["q153_jpeg_progressive_stats"]
    assert compare(spark, "q153", q.build, q.oracle, "/root/testdata/sf0.001") == []


def test_q151_matches_oracle(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    from .oracle_check import compare

    q = all_queries()["q151_jpeg_subsampled_stats"]
    assert compare(spark, "q151", q.build, q.oracle, "/root/testdata/sf0.001") == []


def test_decode_image_dispatches_jpeg():
    """The multimodal front door routes FFD8 to the real decoder and
    replicates grayscale to RGB."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
        decode_image,
    )

    pix = synth_jpeg_pixels(11)
    rgb = decode_image(encode_jpeg(pix))
    assert rgb.shape == (*pix.shape, 3)
    assert (rgb[:, :, 0] == pix).all() and (rgb[:, :, 2] == pix).all()


def test_q148_matches_oracle(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    from .oracle_check import compare

    q = all_queries()["q148_jpeg_decode_stats"]
    assert compare(spark, "q148", q.build, q.oracle, "/root/testdata/sf0.001") == []


def test_fill_bytes_and_stray_markers_in_header_walk():
    """The spec allows any number of 0xFF fill bytes before a marker
    and standalone TEM markers between segments — the walk must skip
    them, not desync; an EOI with no SOS is corruption (ValueError)."""
    good = encode_jpeg(synth_jpeg_pixels(4))
    # inject FF fill + a TEM marker right after SOI
    padded = good[:2] + b"\xff" + b"\xff\x01" + good[2:]
    assert (decode_jpeg(padded) == synth_jpeg_pixels(4)).all()
    with pytest.raises(ValueError, match="SOF0/SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_subsampled_progressive_equals_baseline():
    """Round-11: the subsampled-progressive seam closed. Progressive
    is an entropy-layer rearrangement of the same quantized
    coefficients, so decode(SOF2 subsampled) must equal decode(SOF0
    subsampled) PLANE-EXACTLY — on the exact q151 fixture and on
    random planes at every subsampling, including odd sizes whose
    partial trailing MCU makes the DC (MCU-padded) and AC
    (ceil-raster) grids differ."""
    import numpy as np

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.jpeg import (
        decode_jpeg_planes,
        encode_jpeg_progressive_ycbcr,
        encode_jpeg_ycbcr,
        synth_jpeg420_planes,
    )

    rng = np.random.default_rng(11)
    for d in (0, 1, 2, 5, 7):
        y, cb, cr = synth_jpeg420_planes(d)
        base = decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, "420"))
        prog = decode_jpeg_planes(encode_jpeg_progressive_ycbcr(y, cb, cr, "420"))
        for b, p in zip(base, prog):
            assert b.shape == p.shape and (b == p).all(), d
        # the fixture's round trip is EXACT, progressive included
        assert (base[0] == y).all() and (prog[0] == y).all(), d
    for sub in ("420", "422", "444"):
        for (h, w) in ((24, 40), (17, 23), (8, 8), (31, 9)):
            planes_in = [
                rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(3)
            ]
            base = decode_jpeg_planes(encode_jpeg_ycbcr(*planes_in, sub))
            prog = decode_jpeg_planes(
                encode_jpeg_progressive_ycbcr(*planes_in, sub)
            )
            for b, p in zip(base, prog):
                assert b.shape == p.shape and (b == p).all(), (sub, h, w)
