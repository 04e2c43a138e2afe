"""Round-5 REAL image decode path: PPM/BMP codec round-trips, the
NotImplementedError boundary for compressed formats, and the
decode→thumbnail→re-encode chain through the Spark plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
    decode_and_thumbnail,
    decode_image,
    encode_bmp,
    encode_ppm,
    nn_thumbnail,
    synth_image_payloads,
    synth_pixels,
)


def test_codec_round_trips():
    rng = np.random.RandomState(11)
    # widths chosen to hit every BMP row-padding case (w*3 % 4 = 0..3)
    for w, h in [(4, 4), (5, 3), (6, 2), (7, 5), (16, 14), (1, 1)]:
        pix = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert (decode_image(encode_ppm(pix)) == pix).all(), ("ppm", w, h)
        assert (decode_image(encode_bmp(pix)) == pix).all(), ("bmp", w, h)


def test_compressed_formats_fail_loudly():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\xff\xd8\xff\xe0JFIF....")


def test_nn_thumbnail_sampling_grid():
    # thumb[i, j] must equal src[i*h//th, j*w//tw] exactly
    pix = synth_pixels(123)
    h, w, _ = pix.shape
    t = nn_thumbnail(pix, 4, 4)
    for i in range(4):
        for j in range(4):
            assert (t[i, j] == pix[(i * h) // 4, (j * w) // 4]).all()


def test_decode_thumbnail_bytes_round_trip_through_spark(spark):
    """The emitted thumb bytes are REAL re-encoded PPMs: decoding them
    back yields exactly the sampled pixel grid."""
    ids = spark.createDataFrame([(i,) for i in (0, 5, 77, 300)], "doc_id long")
    rows = decode_and_thumbnail(synth_image_payloads(ids)).collect()
    assert len(rows) == 4
    for r in rows:
        expected = nn_thumbnail(synth_pixels(r.doc_id))
        got = decode_image(bytes(r.thumb))
        assert (got == expected).all()
        assert r.thumb_sum == int(expected.sum(dtype=np.int64))


def test_wav_round_trip_and_boundary():
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        synth_wav,
    )

    rng = np.random.RandomState(5)
    for n, ch, rate in [(256, 1, 8000), (301, 2, 44100), (1, 1, 16000)]:
        s = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate and (out == s).all(), (n, ch)
    for d in (0, 3, 499):
        s, rate = synth_wav(d)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate and (out == s).all()
    with pytest.raises(NotImplementedError):
        decode_wav(b"OggS....")  # compressed container -> loud seam


def test_y4m_round_trip_and_frame_sample():
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        synth_video_frames,
    )

    for d in (0, 7, 123):
        fr = synth_video_frames(d)
        got = decode_y4m(encode_y4m(fr))
        assert (got == fr).all()
        assert (got[::2] == fr[::2]).all()  # the sampling grid q111 uses
    with pytest.raises(NotImplementedError):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42...\n")  # mp4 -> loud seam


def test_ahash64_and_phash_dedup_pairs(spark):
    """Round-6 q122: aHash matches an index-arithmetic replay, planted
    identical images pair at hamming 0, perturbed group members pair
    within the band, and unrelated images do not pair."""
    import numpy as np

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        simhash_hamming_pairs,
    )
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.multimodal import (
        ahash64,
        decode_image,
        encode_ppm,
        image_phash_frame,
        synth_pixels,
    )

    # replay check: bit b = gy*8+gx set iff red[(gy*h)//8, (gx*w)//8]*64 > sum
    pix = synth_pixels(7)
    h, w, _ = pix.shape
    samples = [
        int(pix[(gy * h) // 8, (gx * w) // 8, 0])
        for gy in range(8)
        for gx in range(8)
    ]
    total = sum(samples)
    u = sum(1 << b for b, v in enumerate(samples) if v * 64 > total)
    expected = u - (1 << 64) if u >= 1 << 63 else u
    assert ahash64(pix) == expected

    # planted corpus: two identical, one tiny perturbation, one unrelated
    base = synth_pixels(3)
    pert = base.copy()
    pert[0, 0, 0] = (int(pert[0, 0, 0]) + 1) % 256
    other = synth_pixels(9)
    rows = [
        (0, bytearray(encode_ppm(base))),
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(pert))),
        (3, bytearray(encode_ppm(other))),
    ]
    bdf = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = image_phash_frame(bdf).withColumnRenamed("phash", "simhash")
    got = {
        (r.id1, r.id2): r.hamming
        for r in simhash_hamming_pairs(fp, "doc_id", fp_bits=64).collect()
    }
    assert got.get((0, 1)) == 0  # identical -> hamming 0
    assert (0, 2) in got and got[(0, 2)] <= 3  # perturbed stays in band
    assert not any(3 in p for p in got)  # unrelated image never pairs
    # and the codec really ran: round-trip sanity
    assert np.array_equal(decode_image(encode_ppm(base)), base)
