"""FLAC codec invariants (round 10, operators/flac.py): lossless
round-trips across subframe types and block boundaries, spec CRC/MD5
integrity checks actually firing, rice escape path, and loud seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.flac import (
    BLOCK_SIZE,
    _crc8,
    _crc16,
    _unzigzag,
    _zigzag,
    decode_flac,
    encode_flac,
)
from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
    synth_wav,
)


def test_crc_reference_vectors():
    """The spec CRCs against known vectors: CRC-8 poly 0x07 and CRC-16
    poly 0x8005 over '123456789' are 0xF4 and 0xFEE8 (the standard
    check values for these polynomials with init 0)."""
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_zigzag_fold_is_the_spec_mapping():
    for r, u in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (-32768, 65535)]:
        assert _zigzag(r) == u and _unzigzag(u) == r


def test_lossless_round_trip_synth_and_random():
    for d in range(20):
        s, rate = synth_wav(d)
        out, r = decode_flac(encode_flac(s, rate))
        assert r == rate and (out == s).all(), d
    rng = np.random.default_rng(3)
    # sizes straddling the block boundary, mono and stereo
    for n, ch in [(1, 1), (BLOCK_SIZE - 1, 1), (BLOCK_SIZE, 2),
                  (BLOCK_SIZE + 1, 2), (4 * BLOCK_SIZE + 17, 2)]:
        s = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        out, r = decode_flac(encode_flac(s, 44100))
        assert (out == s).all() and r == 44100, (n, ch)


def test_subframe_type_selection_round_trips():
    # constant → CONSTANT subframe
    s = np.full((300, 2), -17, dtype=np.int16)
    assert (decode_flac(encode_flac(s, 8000))[0] == s).all()
    # linear ramp → order-1/2 predictor with tiny residuals
    ramp = (np.arange(600) % 20000 - 10000).astype(np.int16).reshape(-1, 1)
    assert (decode_flac(encode_flac(ramp, 8000))[0] == ramp).all()
    # white noise → order-0 (plain rice over samples)
    rng = np.random.default_rng(9)
    noise = rng.integers(-32768, 32768, (500, 1)).astype(np.int16)
    assert (decode_flac(encode_flac(noise, 8000))[0] == noise).all()


def test_integrity_checks_fire():
    s, rate = synth_wav(5)
    good = bytearray(encode_flac(s, rate))
    # flip one bit inside the LAST frame's entropy data: the frame
    # CRC-16 (or the predictor reconstruction via MD5) must catch it
    bad = bytearray(good)
    bad[-10] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # corrupt the STREAMINFO MD5: every frame decodes clean, the final
    # PCM digest check must still refuse
    bad2 = bytearray(good)
    bad2[8 + 18] ^= 0xFF  # metadata header (4) + block header (4) + 18 → md5[0]
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad2))
    # truncation is loud
    with pytest.raises(ValueError):
        decode_flac(bytes(good[: len(good) // 2]))


def test_loud_seams():
    with pytest.raises(NotImplementedError, match="signature"):
        decode_flac(b"OggS....")
    s, rate = synth_wav(2)
    good = encode_flac(s, rate)
    # rewrite the first subframe's type bits to LPC: the decoder now
    # ACCEPTS LPC, so it reinterprets the following bits as LPC
    # params/residuals and must fail LOUDLY downstream (frame CRC-16,
    # rice desync, or the PCM MD5) — silent wrong samples are the bug.
    # Frame layout: 4-byte fixed header + utf8(0)=1 + 2 blocksize +
    # 1 crc8 = byte offset 8 in the frame; subframe header is its
    # top bits.
    idx = good.index(b"\xff\xf8")
    sub_at = idx + 8
    patched = bytearray(good)
    patched[sub_at] = (patched[sub_at] & 0x01) | (0b100000 << 1)
    with pytest.raises(ValueError):
        decode_flac(bytes(patched))


def test_all_spec_bit_depths_round_trip():
    """Every bit depth the spec allows (round-10 second pass): table
    depth codes where they exist (8/12/16/20/24/32), STREAMINFO-
    carried depth (code 0) otherwise, MD5 packed at ceil(bps/8)
    bytes per sample as libFLAC does; decoder returns the smallest
    holding dtype. Out-of-spec depths are corruption, not a seam."""
    rng = np.random.default_rng(11)
    for bps, dt in (
        (4, np.int8), (8, np.int8), (12, np.int16), (17, np.int32),
        (20, np.int32), (24, np.int32), (32, np.int32),
    ):
        lo, hi = -(1 << (bps - 1)), 1 << (bps - 1)
        s = rng.integers(lo, hi, (520, 2)).astype(np.int64)
        out, rate = decode_flac(encode_flac(s, 22050, bps=bps))
        assert out.dtype == dt and (out == s).all(), bps
    with pytest.raises(ValueError, match="4..32"):
        encode_flac(np.zeros((8, 1), dtype=np.int64), 8000, bps=33)


def test_wasted_bits_round_trip_and_actually_used():
    """Samples sharing trailing zero bits (upscaled audio): the
    encoder moves them to the subframe header's wasted-bits field —
    the <<3 stream must NOT cost ~3 extra bits/sample over the
    unshifted one — and the decoder shifts them back exactly."""
    rng = np.random.default_rng(13)
    base = rng.integers(-3500, 3500, (512, 2)).astype(np.int64)
    enc_plain = encode_flac(base, 16000)
    enc_shift = encode_flac(base << 3, 16000)
    out, _ = decode_flac(enc_shift)
    assert (out == (base << 3)).all()
    # without wasted bits this would be ~3*512*2/8 = 384 bytes bigger
    assert len(enc_shift) < len(enc_plain) + 64


def test_incompressible_signal_falls_back_to_verbatim():
    """Full-range 32-bit noise is rice-incompressible (the best
    parameter still leaves huge unary quotients): the encoder must
    emit VERBATIM subframes — bounded at bps bits/sample — and the
    stream still round-trips. Pins the fallback real encoders use;
    without it this encode takes minutes and gigabytes."""
    rng = np.random.default_rng(17)
    s = rng.integers(-(1 << 31), 1 << 31, (512, 1)).astype(np.int64)
    enc = encode_flac(s, 96000, bps=32)
    # verbatim bound: ~4 bytes/sample + headers
    assert len(enc) < 512 * 4 + 256
    out, _ = decode_flac(enc)
    assert (out == s).all()


def test_q149_matches_oracle(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    from .oracle_check import compare

    q = all_queries()["q149_flac_decode_stats"]
    assert compare(spark, "q149", q.build, q.oracle, "/root/testdata/sf0.001") == []


def test_lpc_subframe_decodes():
    """Decoder-side LPC (what real-world encoders emit): hand-assemble
    a one-frame stream whose single subframe is LPC order-2 with
    stream-carried coefficients and shift, and check the decoded
    samples against an independent reconstruction of the same
    recurrence (s[i] = r[i] + ((c0*s[i-1] + c1*s[i-2]) >> shift))."""
    import hashlib

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.flac import (
        _BitWriter,
        _utf8_number,
        _zigzag,
    )

    bs = 32
    warm = [100, -200]
    coefs = [3, -1]  # precision 4 bits, shift 1 → pred = (3a - b) >> 1
    shift = 1
    resid = [((i * 7) % 11) - 5 for i in range(bs - 2)]
    # independent reconstruction
    samples = list(warm)
    for r in resid:
        samples.append(r + ((coefs[0] * samples[-1] + coefs[1] * samples[-2]) >> shift))
    assert all(-32768 <= s <= 32767 for s in samples)

    # subframe bits: pad(1)=0, type=0b100001 (LPC order 2), wasted=0
    w = _BitWriter()
    w.put(0, 1)
    w.put(0b100000 | (2 - 1), 6)
    w.put(0, 1)
    for v in warm:
        w.put(v & 0xFFFF, 16)
    w.put(4 - 1, 4)  # coef precision - 1
    w.put(shift, 5)
    for c in coefs:
        w.put(c & 0xF, 4)
    w.put(0b00, 2)  # rice, 4-bit params
    w.put(0, 4)  # partition order 0
    w.put(3, 4)  # rice param 3
    for r in resid:
        u = _zigzag(r)
        w.put_unary(u >> 3)
        w.put(u & 7, 3)
    w.pad_to_byte()
    sub = w.bytes()

    # frame header: sync, blocksize code 7 (16-bit), rate from SI,
    # mono, 16-bit
    head = bytearray(b"\xff\xf8")
    head.append(0x70)
    head.append((0 << 4) | (0b100 << 1))
    head += _utf8_number(0)
    head += struct.pack(">H", bs - 1)
    head.append(_crc8(bytes(head)))
    frame = bytes(head) + sub
    frame += struct.pack(">H", _crc16(frame))

    arr = np.array(samples, dtype=np.int16).reshape(-1, 1)
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()
    si = _BitWriter()
    si.put(bs, 16); si.put(bs, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(bs, 36)
    body = si.bytes() + md5
    payload = b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body + frame

    out, rate = decode_flac(payload)
    assert rate == 8000 and (out[:, 0] == np.array(samples)).all()


def test_table_coded_blocksize_and_samplerate_decode():
    """Real-world encoders emit TABLE block-size codes (e.g. 0b1100 =
    4096) and sample-rate codes rather than the from-end forms our
    encoder uses — rewrite a stream's frame header to the table codes
    and the decoder must still land on the same samples."""
    import hashlib

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.flac import (
        _BitWriter,
        _utf8_number,
    )

    rng = np.random.default_rng(4)
    samples = rng.integers(-32768, 32768, (192, 1)).astype(np.int16)

    # hand-assemble with bs_code 0b0001 (=192) and sr_code 0b0100
    # (=8000 from the table; informational — STREAMINFO governs)
    w = _BitWriter()
    w.put(0, 1)
    w.put(0b000001, 6)  # VERBATIM
    w.put(0, 1)
    for v in samples[:, 0]:
        w.put(int(v) & 0xFFFF, 16)
    w.pad_to_byte()
    head = bytearray(b"\xff\xf8")
    head.append((0b0001 << 4) | 0b0100)
    head.append((0 << 4) | (0b100 << 1))
    head += _utf8_number(0)
    head.append(_crc8(bytes(head)))
    frame = bytes(head) + w.bytes()
    frame += struct.pack(">H", _crc16(frame))

    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    si = _BitWriter()
    si.put(192, 16); si.put(192, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(192, 36)
    body = si.bytes() + md5
    payload = b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body + frame

    out, rate = decode_flac(payload)
    assert rate == 8000 and (out == samples).all()


def _assemble_stereo_frame(chan_asgn, sub_a, sub_b, bs):
    """One decorrelated-stereo frame: two VERBATIM subframes (the
    second/first is the side channel at 17 bits per the assignment)."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.flac import (
        _BitWriter,
        _utf8_number,
    )

    w = _BitWriter()
    side_first = chan_asgn == 9
    for i, (sub, vals) in enumerate(((0, sub_a), (1, sub_b))):
        bits = 17 if (i == 0) == side_first else 16
        w.put(0, 1)
        w.put(0b000001, 6)  # VERBATIM
        w.put(0, 1)
        for v in vals:
            w.put(int(v) & ((1 << bits) - 1), bits)
    w.pad_to_byte()
    head = bytearray(b"\xff\xf8")
    head.append(0x70)
    head.append((chan_asgn << 4) | (0b100 << 1))
    head += _utf8_number(0)
    head += struct.pack(">H", bs - 1)
    head.append(_crc8(bytes(head)))
    frame = bytes(head) + w.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def test_decorrelated_stereo_decodes():
    """Left/side, side/right, and mid/side frames (what real stereo
    encoders emit; the side channel carries 17 bits) reconstruct the
    same L/R the spec formulas define — checked against an independent
    numpy reconstruction and the in-stream PCM MD5."""
    import hashlib

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.flac import (
        _BitWriter,
    )

    rng = np.random.default_rng(11)
    bs = 64
    left = rng.integers(-32768, 32768, bs).astype(np.int64)
    right = rng.integers(-32768, 32768, bs).astype(np.int64)
    side = left - right  # 17-bit range
    mid = (left + right) >> 1

    for chan_asgn, a, b in (
        (8, left, side),    # left/side
        (9, side, right),   # side/right
        (10, mid, side),    # mid/side
    ):
        frame = _assemble_stereo_frame(chan_asgn, a, b, bs)
        expected = np.stack([left, right], axis=1).astype(np.int16)
        md5 = hashlib.md5(expected.astype("<i2").tobytes()).digest()
        si = _BitWriter()
        si.put(bs, 16); si.put(bs, 16); si.put(0, 24); si.put(0, 24)
        si.put(8000, 20); si.put(1, 3); si.put(15, 5); si.put(bs, 36)
        body = si.bytes() + md5
        payload = b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body + frame
        out, rate = decode_flac(payload)
        assert rate == 8000 and (out == expected).all(), chan_asgn
