"""sources/warc.py: WARC/WET record splitting (build_warc is the twin)."""

from __future__ import annotations

import gzip

from datacanary_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    parse_warc_records,
)

RECS = [
    {"warc_type": "warcinfo", "content_type": "application/warc-fields",
     "payload": b"software: test\r\n"},
    {"warc_type": "response", "target_uri": "https://a.example/x",
     "warc_date": "2026-01-02T03:04:05Z", "http_status": 200,
     "content_type": "application/http; msgtype=response",
     "payload": "<html><body>hi &amp; bye</body></html>"},
    {"warc_type": "conversion", "target_uri": "https://a.example/x",
     "warc_date": "2026-01-02T03:04:05Z", "content_type": "text/plain",
     "payload": "hi & bye"},
]


def test_iter_parses_plain_and_multimember_gzip():
    for compress in (False, True):
        recs = list(iter_warc_records(build_warc(RECS, compress=compress)))
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "response", "conversion"]
        assert recs[1]["target_uri"] == "https://a.example/x"
        assert recs[2]["block"] == b"hi & bye"
        # response block still carries the HTTP envelope at this layer
        assert recs[1]["block"].startswith(b"HTTP/1.1 200")


def test_whole_file_gzip_and_binary_safe_payload():
    # payload containing CRLFCRLF and a fake version line must not
    # resync the parser: Content-Length framing wins
    tricky = [{"warc_type": "conversion", "target_uri": "u",
               "payload": b"a\r\n\r\nWARC/1.0\r\nfake"}]
    data = gzip.compress(build_warc(tricky))
    recs = list(iter_warc_records(data))
    assert len(recs) == 1
    assert recs[0]["block"] == b"a\r\n\r\nWARC/1.0\r\nfake"


def test_corrupt_content_length_skips_one_record_not_the_file():
    # record #2 (response) gets a non-numeric Content-Length; the parser
    # must reseek the NEXT version line and still yield the records that
    # follow, not abandon the rest of the file
    data = build_warc(RECS)
    good = list(iter_warc_records(data))
    resp_hdr = b"Content-Length: " + str(
        len(good[1]["block"])).encode("ascii")
    corrupted = data.replace(resp_hdr, b"Content-Length: abc", 1)
    assert corrupted != data
    recs = list(iter_warc_records(corrupted))
    types = [r["warc_type"] for r in recs]
    # the corrupt response is dropped; warcinfo and conversion survive.
    # (reseek can also surface a spurious record if the skipped body
    # contains a "WARC/" line — framing is gone for that one record —
    # but this fixture's body doesn't, so exactly the two good records.)
    assert types == ["warcinfo", "conversion"]
    assert recs[1]["block"] == b"hi & bye"


def test_missing_content_length_skips_record():
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\nno-length-here" +
           build_warc([RECS[2]]))
    recs = list(iter_warc_records(raw))
    assert [r["warc_type"] for r in recs] == ["conversion"]


def test_truncated_tail_yields_good_prefix():
    data = build_warc(RECS)
    recs = list(iter_warc_records(data[:len(data) - 60]))
    # last record's block is cut; forward-only parse still returns what
    # framing allows without raising
    assert [r["warc_type"] for r in recs][:2] == ["warcinfo", "response"]


def test_parse_warc_records_dataframe(spark):
    files = spark.createDataFrame(
        [("f0.warc", build_warc(RECS)),
         ("f1.warc.gz", build_warc(RECS, compress=True)),
         ("empty", None)],
        "path string, content binary")
    out = parse_warc_records(files, warc_types=("response", "conversion"))
    rows = sorted(out.collect(), key=lambda r: (r.source_path, r.record_ix))
    # record_ix is the physical position in the file: the filtered-out
    # warcinfo record at position 0 still occupies index 0, so the same
    # record keeps its index under any warc_types filter
    assert [(r.source_path, r.record_ix, r.warc_type) for r in rows] == [
        ("f0.warc", 1, "response"), ("f0.warc", 2, "conversion"),
        ("f1.warc.gz", 1, "response"), ("f1.warc.gz", 2, "conversion")]
    resp = rows[0]
    # HTTP envelope split off: payload is the body, status extracted
    assert bytes(resp.payload) == b"<html><body>hi &amp; bye</body></html>"
    assert resp.http_status == 200
    conv = rows[1]
    assert bytes(conv.payload) == b"hi & bye"
    assert conv.http_status is None
    assert conv.warc_date == "2026-01-02T03:04:05Z"


def test_parse_keeps_all_types_when_unfiltered(spark):
    files = spark.createDataFrame([("f", build_warc(RECS))],
                                  "path string, content binary")
    types = [r.warc_type for r in parse_warc_records(files).collect()]
    assert sorted(types) == ["conversion", "response", "warcinfo"]
