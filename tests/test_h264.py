"""H.264 Annex-B parsing invariants (round 10, operators/h264.py):
emulation-prevention escape/unescape exactness, SPS crop arithmetic,
slice-header classification, the loud seams, and the q152 oracle."""

from __future__ import annotations

import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.h264 import (
    build_annexb_stream,
    build_pps,
    build_sps,
    ebsp_escape,
    ebsp_unescape,
    parse_annexb,
    parse_sps,
    parse_slice_header,
    stream_index,
)


def test_emulation_prevention_round_trip_and_rules():
    """Escape exactly where the spec demands (two zeros before a byte
    ≤ 3) and nowhere else; unescape inverts it for every boundary
    shape including a trailing 03 (cabac_zero_words)."""
    cases = [
        b"",
        b"\x00\x00",
        b"\x00\x00\x00",
        b"\x00\x00\x01\x00\x00\x02\x00\x00\x03",
        b"\x00\x00\x04",  # no escape: next byte > 3
        b"\xff\x00\x00\x00\xff",
        bytes(range(256)) * 3,
    ]
    for rbsp in cases:
        assert ebsp_unescape(ebsp_escape(rbsp)) == rbsp, rbsp
    assert ebsp_escape(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert ebsp_escape(b"\x00\x00\x04") == b"\x00\x00\x04"
    # a bare start-code prefix inside a NAL body is a missing escape
    with pytest.raises(ValueError, match="unescaped"):
        ebsp_unescape(b"\x00\x00\x01")
    # a raw zero triple is equally impossible in valid EBSP (spec
    # 7.4.1.1 escapes 00 00 00 as 00 00 03 00) — ADVICE r11: it must
    # fail as loudly as the start-code prefixes
    with pytest.raises(ValueError, match="unescaped"):
        ebsp_unescape(b"\xff\x00\x00\x00\xff")


def test_sps_crop_arithmetic():
    """Pixel dims from mb grid minus the 4:2:0 crop rectangle
    (CropUnitX/Y = 2 for frame_mbs_only): 5x3 mbs cropped 1 right /
    2 bottom → 78 x 44."""
    sps = parse_sps(build_sps(5, 3, 1, 2))
    assert sps["profile_idc"] == 66
    assert (sps["width"], sps["height"]) == (5 * 16 - 2, 3 * 16 - 4)
    full = parse_sps(build_sps(2, 2, 0, 0))
    assert (full["width"], full["height"]) == (32, 32)
    assert full["log2_max_frame_num"] == 4


def test_slice_header_prefix_classification():
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.h264 import (
        build_slice,
    )

    sh = parse_slice_header(build_slice(7, 3, b"\x80"), 4)
    assert sh["slice_class"] == "I" and sh["frame_num"] == 3
    sh = parse_slice_header(build_slice(5, 1, b"\x80"), 4)
    assert sh["slice_class"] == "P" and sh["frame_num"] == 1
    sh = parse_slice_header(build_slice(1, 0, b"\x80"), 4)
    assert sh["slice_class"] == "B"


def test_annexb_walk_and_loud_failures():
    good = build_annexb_stream(7)
    nals = parse_annexb(good)
    assert [t for t, _, _ in nals[:2]] == [7, 8]  # SPS then PPS
    # length-prefixed (MP4 avcC) framing is the documented seam
    with pytest.raises(NotImplementedError, match="Annex-B"):
        parse_annexb(b"\x00\x00\x00\x19" + b"\x65" + b"\x00" * 25)
    # forbidden_zero_bit set in a NAL header is corruption
    at = good.index(b"\x00\x00\x00\x01") + 4
    bad = bytearray(good)
    bad[at] |= 0x80
    with pytest.raises(ValueError, match="forbidden"):
        parse_annexb(bytes(bad))
    # a slice before any SPS cannot be indexed
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.h264 import (
        build_slice,
    )

    orphan = (
        b"\x00\x00\x00\x01"
        + bytes([(2 << 5) | 1])
        + ebsp_escape(build_slice(5, 0, b"\x80"))
    )
    with pytest.raises(ValueError, match="SPS"):
        stream_index(orphan)
    # truncated SPS RBSP
    with pytest.raises(ValueError, match="truncated"):
        parse_sps(build_sps(5, 3, 1, 2)[:2])


def test_high_profile_sps_is_the_seam():
    sps = bytearray(build_sps(2, 2, 0, 0))
    sps[0] = 100  # profile_idc: High
    with pytest.raises(NotImplementedError, match="high-profile"):
        parse_sps(bytes(sps))


def test_stream_index_matches_fixture_closed_form():
    for d in (0, 1, 4, 11, 29):
        ix = stream_index(build_annexb_stream(d))
        n = 3 + d % 6
        assert ix["n_nals"] == 2 + n
        assert ix["n_idr"] == sum(1 for i in range(n) if i % 5 == 0)
        assert ix["sum_frame_num"] == sum(i % 5 for i in range(n))
        assert ix["slice_rbsp_bytes"] == sum(2 + 3 + (d + i) % 5 for i in range(n))
        # every stream's wire form exercises at least one escape
        assert b"\x00\x00\x03" in build_annexb_stream(d)


def test_pps_parses_as_nal():
    (ntype, ref, rbsp), = parse_annexb(
        b"\x00\x00\x00\x01" + bytes([(3 << 5) | 8]) + ebsp_escape(build_pps())
    )
    assert ntype == 8 and ref == 3 and len(rbsp) == len(build_pps())


def test_avcc_config_and_length_prefixed_samples():
    """MP4-side framing (ISO 14496-15): the avcC record yields the
    NAL length-field size and the track resolution straight from its
    embedded SPS; length-prefixed sample data splits into the same
    NAL triples as Annex-B, at every legal length size."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.h264 import (
        NAL_IDR,
        build_avcc_config,
        build_slice,
        parse_avcc_config,
        parse_length_prefixed,
    )

    cfg = parse_avcc_config(build_avcc_config(build_sps(5, 3, 1, 2), build_pps(), 4))
    assert (cfg["width"], cfg["height"]) == (78, 44)
    assert cfg["nal_length_size"] == 4 and cfg["n_pps"] == 1
    assert cfg["profile_idc"] == 66
    body = bytes([(3 << 5) | NAL_IDR]) + ebsp_escape(
        build_slice(7, 0, b"\x00\x00\x01\x80")
    )
    for nls in (1, 2, 4):
        sample = len(body).to_bytes(nls, "big") + body
        ((ntype, ref, rbsp),) = parse_length_prefixed(sample, nls)
        assert ntype == NAL_IDR and ref == 3
        assert rbsp.endswith(b"\x00\x00\x01\x80")  # escape undone
    # truncations are loud
    with pytest.raises(ValueError, match="truncated"):
        parse_length_prefixed(len(body).to_bytes(4, "big") + body[:-2], 4)
    with pytest.raises(ValueError, match="avcC"):
        parse_avcc_config(b"\x01\x42\x00\x1e")
    # and Annex-B's seam message routes to the right entry point
    with pytest.raises(NotImplementedError, match="parse_length_prefixed"):
        from real_time_data_pipeline_for_restaurant_analytics_spark.operators.h264 import (
            parse_annexb,
        )

        parse_annexb(len(body).to_bytes(4, "big") + body)


def test_q152_matches_oracle(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    from .oracle_check import compare

    q = all_queries()["q152_h264_nal_stats"]
    assert compare(spark, "q152", q.build, q.oracle, "/root/testdata/sf0.001") == []
