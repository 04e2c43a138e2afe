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
