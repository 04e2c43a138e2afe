"""WARC/JSONL corpus ingestion sources (round 5): real byte-level
WARC parsing (Content-Length walking, multi-record archives,
non-response records, adversarial payloads), binaryFile distribution,
and corrupt-record capture in the JSONL reader."""

from __future__ import annotations

import os

from real_time_data_pipeline_for_restaurant_analytics_spark.sources.corpus import (
    build_warc_response,
    extract_html_body,
    parse_warc,
    read_corpus_jsonl,
    read_warc,
)

_CRLF = b"\r\n"


def _warcinfo() -> bytes:
    body = b"software: test\r\n"
    return (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
        + _CRLF + body + _CRLF + _CRLF
    )


def test_parse_warc_multi_record_and_skips_non_response():
    html1 = b"<html><body><p>hello world</p></body></html>"
    html2 = b"<html><body><p>second doc</p></body></html>"
    archive = (
        _warcinfo()
        + build_warc_response("http://a/1", "2024-05-01T00:00:00Z", html1)
        + build_warc_response("http://a/2", "2024-05-01T00:00:01Z", html2)
    )
    recs, n_bad = parse_warc(archive)
    assert n_bad == 0
    assert [r["url"] for r in recs] == ["http://a/1", "http://a/2"]
    assert all(r["http_status"] == 200 for r in recs)
    assert recs[0]["body"] == html1 and recs[1]["body"] == html2
    assert extract_html_body(recs[0]["body"]) == "hello world"


def test_parse_warc_payload_containing_warc_magic():
    """Content-Length walking is the only correct framing: a body that
    CONTAINS the record magic must not split the record."""
    evil = b"<html><body><p>quoting WARC/1.0\r\n\r\nheaders inside</p></body></html>"
    archive = build_warc_response("http://a/e", "2024-05-01T00:00:00Z", evil) \
        + build_warc_response("http://a/f", "2024-05-01T00:00:00Z", b"<p>ok</p>")
    recs, n_bad = parse_warc(archive)
    assert n_bad == 0
    assert len(recs) == 2
    assert recs[0]["body"] == evil
    assert recs[1]["url"] == "http://a/f"


def test_read_warc_binaryfile_distribution(spark, tmp_path):
    d = tmp_path / "warcs"
    os.makedirs(d)
    for i in range(3):
        with open(d / f"seg{i}.warc", "wb") as f:
            f.write(_warcinfo())
            for j in range(4):
                f.write(build_warc_response(
                    f"http://seg{i}/{j}", "2024-05-01T00:00:00Z",
                    f"<html><body><p>doc {i}-{j}</p></body></html>".encode(),
                ))
    out = read_warc(spark, str(d)).collect()
    assert len(out) == 12
    texts = {r.text for r in out}
    assert "doc 2-3" in texts and all(r.http_status == 200 for r in out)


def test_read_corpus_jsonl_corrupt_capture(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "web", "n_chars": 5}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "beta", "lang": "en", "source": "web", "n_chars": 4}\n'
    )
    df = read_corpus_jsonl(spark, str(p))
    rows = df.collect()
    good = [r for r in rows if r.doc_id is not None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record


def test_warc_round_trip_property():
    """Property (hypothesis): ANY sequence of response records with
    arbitrary binary bodies — including CRLFs, WARC magic, and HTTP
    header look-alikes inside bodies — round-trips through
    build_warc_response + parse_warc exactly and in order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    bodies = st.lists(
        st.binary(min_size=0, max_size=200).map(
            lambda b: b"<p>" + b + b"</p>"  # body shape the extractor expects
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=60, deadline=None)
    @given(bodies)
    def run(bs):
        archive = _warcinfo() + b"".join(
            build_warc_response(f"http://x/{i}", "2024-05-01T00:00:00Z", b)
            for i, b in enumerate(bs)
        )
        recs, n_bad = parse_warc(archive)
        assert n_bad == 0
        assert [r["body"] for r in recs] == bs
        assert [r["url"] for r in recs] == [f"http://x/{i}" for i in range(len(bs))]

    run()


def test_extract_html_body_non_ascii_and_literal_close_tag():
    """Round-6 ADVICE fix: (a) document text containing the literal
    '</p>' must survive extraction intact (the closing tag is searched
    from the END, so the template's own tag wins); (b) byte counts are
    UTF-8 octets, not characters, for non-ASCII text."""
    tricky = "escaped html like </p> inside text — naïve café 日本語"
    html = ("<html><head><title>doc</title></head><body><p>"
            + tricky + "</p></body></html>").encode()
    assert extract_html_body(html) == tricky

    archive = build_warc_response("http://a/u", "2024-05-01T00:00:00Z", html)
    recs, n_bad = parse_warc(archive)
    assert n_bad == 0
    assert recs[0]["body"] == html
    assert len(html) > len(html.decode())  # non-ASCII: bytes != chars
    # the records frame reports octets (what Content-Length walked)
    assert len(recs[0]["body"]) == len(html)


def test_parse_warc_gzip_and_malformed_robustness():
    """Review r8: gzipped archives (the real .warc.gz Common Crawl
    shape) must decompress instead of silently yielding zero records;
    a non-WARC payload raises loudly; a truncated record is COUNTED
    and the records before it survive; a double-spaced status line
    parses instead of crashing."""
    import gzip

    import pytest

    a = build_warc_response("http://a", "2024-01-01T00:00:00Z", b"<p>one</p>")
    b = build_warc_response("http://b", "2024-01-01T00:00:01Z", b"<p>two</p>")

    recs, n_bad = parse_warc(gzip.compress(a + b))
    assert [r["url"] for r in recs] == ["http://a", "http://b"] and n_bad == 0

    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc(b"PK\x03\x04 definitely a zip")

    truncated = a + b[: len(b) // 2]
    recs, unparsed = parse_warc(truncated)
    assert [r["url"] for r in recs] == ["http://a"], (
        "records before the corruption must survive"
    )
    # ADVICE r9: the damage signal is BYTES left unparsed (the corrupt
    # record's start to payload end), not a record count that framing
    # cannot actually compute past the first corruption
    assert unparsed == len(b) // 2, "unparsed tail must be byte-exact"

    # double-spaced status line — LENGTH-PRESERVING edit (review r9:
    # growing the body without fixing Content-Length is a framing
    # desync, which parse_warc now correctly reports as unparsed tail)
    weird = a.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1  200 K")
    recs, n_bad = parse_warc(weird)
    assert n_bad == 0 and recs[0]["http_status"] == 200


def test_warc_malformed_counts_frame(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.sources.corpus import (
        warc_malformed_counts,
    )

    a = build_warc_response("http://a", "2024-01-01T00:00:00Z", b"<p>x</p>")
    b = build_warc_response("http://b", "2024-01-01T00:00:01Z", b"<p>y</p>")
    good = a + b
    bad = a + b[: len(b) - 10]
    df = spark.createDataFrame([(good,), (bad,)], "warc binary")
    got = sorted(
        (r.n_records, r.corrupt, r.unparsed_bytes, r.total_bytes)
        for r in warc_malformed_counts(df).collect()
    )
    # clean archive: 2 records, nothing unparsed; truncated archive:
    # the surviving record plus a byte-exact unparsed tail (ADVICE r9)
    assert got == [
        (1, True, len(b) - 10, len(bad)),
        (2, False, 0, len(good)),
    ]


def test_parse_warc_desync_counts_unparsed_tail():
    """Review r9: a numerically-valid-but-WRONG Content-Length desyncs
    the walk onto non-WARC bytes mid-archive. That is corruption, not
    'trailing padding' — the unparsed tail must be reported, including
    the further (unreachable) valid records."""
    a = build_warc_response("http://a", "2024-01-01T00:00:00Z", b"<p>one</p>")
    b = build_warc_response("http://b", "2024-01-01T00:00:01Z", b"<p>two</p>")
    # shrink a's Content-Length so the walk lands mid-body of a
    needle = b"Content-Length: "
    i = a.index(needle) + len(needle)
    j = a.index(b"\r\n", i)
    n_real = int(a[i:j])
    bad_a = a[:i] + str(n_real - 20).encode() + a[j:]
    recs, unparsed = parse_warc(bad_a + b)
    assert unparsed > 0, "a desynced walk must not report a clean parse"
    assert unparsed >= len(b), "the unreachable next record is part of the damage"

    # genuine trailing CRLF/NUL padding is still not corruption
    recs, unparsed = parse_warc(a + b"\r\n\r\n\x00\x00")
    assert [r["url"] for r in recs] == ["http://a"] and unparsed == 0
