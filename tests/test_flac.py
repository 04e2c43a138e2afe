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
    # force an LPC subframe type (0b100000): find the first subframe
    # header byte after a frame header and rewrite its type bits —
    # cheaper: craft a 1-frame stream and patch; here we patch the
    # first subframe of the first frame. Frame layout: 4-byte fixed
    # header + utf8(0)=1 + 2 blocksize + 1 crc8 = byte offset 8 in the
    # frame; subframe header is its top bits.
    idx = good.index(b"\xff\xf8")
    sub_at = idx + 8
    patched = bytearray(good)
    patched[sub_at] = (patched[sub_at] & 0x01) | (0b100000 << 1)
    with pytest.raises((NotImplementedError, ValueError)):
        # NotImplementedError for LPC unless the patched byte breaks
        # CRC first — both are loud; silent wrong samples are the bug
        decode_flac(bytes(patched))


def test_q149_matches_oracle(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    from .oracle_check import compare

    q = all_queries()["q149_flac_decode_stats"]
    assert compare(spark, "q149", q.build, q.oracle, "/root/testdata/sf0.001") == []
