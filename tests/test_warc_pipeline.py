"""WARC/WET end-to-end through run_filter_job: container-format parity.

The same fixture corpus is presented three ways — pages parquet, raw
WARC (response records carrying the html bytes), WET (conversion
records carrying the text) — and the filter job must produce identical
per-url verdicts and scrubbed text from all three.
"""

from __future__ import annotations

import os

from datacanary_spark.plans import checkpoint as cp
from datacanary_spark.sources.fixtures import (
    generate_pages_pandas,
    write_pages_parquet,
)
from datacanary_spark.sources.warc import build_warc

N_DOCS = 60
FILES = 3


def _warc_date(ts) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _write_corpora(tmp_path):
    pdf = generate_pages_pandas(N_DOCS, seed=42)
    pq = tmp_path / "pages"
    write_pages_parquet(str(pq), n_docs=N_DOCS, seed=42)

    warc_dir, wet_dir = tmp_path / "warc", tmp_path / "wet"
    warc_dir.mkdir(), wet_dir.mkdir()
    per = (len(pdf) + FILES - 1) // FILES
    for fx in range(FILES):
        chunk = pdf.iloc[fx * per:(fx + 1) * per]
        warc_recs, wet_recs = [], []
        for r in chunk.itertuples(index=False):
            meta = {"target_uri": r.url, "warc_date": _warc_date(r.warc_ts)}
            warc_recs.append({"warc_type": "response", "http_status": 200,
                              "content_type": "application/http",
                              "payload": bytes(r.html), **meta})
            wet_recs.append({"warc_type": "conversion",
                             "content_type": "text/plain",
                             "payload": r.text.encode("utf-8"), **meta})
        gz = fx % 2 == 1  # exercise both plain and gzipped files
        suffix = ".gz" if gz else ""
        (warc_dir / f"seg-{fx}.warc{suffix}").write_bytes(
            build_warc(warc_recs, compress=gz))
        (wet_dir / f"seg-{fx}.warc.wet{suffix}").write_bytes(
            build_warc(wet_recs, compress=gz))
    return pq, warc_dir, wet_dir


def _verdicts(spark, out):
    rows = spark.read.parquet(os.path.join(out, "data")).select(
        "url", "keep", "scrubbed_text").collect()
    return {r.url: (r.keep, r.scrubbed_text) for r in rows}


def test_warc_and_wet_match_parquet_pipeline(spark, tmp_path):
    pq, warc_dir, wet_dir = _write_corpora(tmp_path)

    s_pq = cp.run_filter_job(spark, str(pq), str(tmp_path / "out_pq"),
                             n_chunks=2)
    s_warc = cp.run_filter_job(
        spark, str(warc_dir), str(tmp_path / "out_warc"), n_chunks=2,
        input_format="warc", extract_from_html=True, extractor="wrapper")
    s_wet = cp.run_filter_job(
        spark, str(wet_dir), str(tmp_path / "out_wet"), n_chunks=2,
        input_format="wet")
    assert s_pq["docs"] == s_warc["docs"] == s_wet["docs"] == N_DOCS

    v_pq = _verdicts(spark, str(tmp_path / "out_pq"))
    v_warc = _verdicts(spark, str(tmp_path / "out_warc"))
    v_wet = _verdicts(spark, str(tmp_path / "out_wet"))
    assert v_pq == v_warc == v_wet
    assert len(v_pq) == N_DOCS


def test_warc_ts_parsed_and_format_recorded(spark, tmp_path):
    _, warc_dir, _ = _write_corpora(tmp_path)
    out = str(tmp_path / "out")
    cp.run_filter_job(spark, warc_dir.as_posix(), out, n_chunks=1,
                      input_format="warc", extract_from_html=True)
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.where("warc_ts IS NULL").count() == 0

    # resume with a different format is refused (chunk assignment is
    # format-dependent)
    import pytest
    with pytest.raises(RuntimeError, match="input_format"):
        cp.run_filter_job(spark, warc_dir.as_posix(), out, n_chunks=1)


def test_http_errors_dropped_by_default(spark, tmp_path):
    """A crawl's 404/500 response bodies are not corpus pages: the
    default http_ok_only drops them; --keep-http-errors keeps them."""
    from datacanary_spark.plans.pipeline import pages_from_warc

    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    recs = [
        {"warc_type": "response", "http_status": 200,
         "target_uri": "https://ok.example/a",
         "payload": b"<html><body><p>fine page</p></body></html>"},
        {"warc_type": "response", "http_status": 404,
         "target_uri": "https://gone.example/b",
         "payload": b"<html><body><p>page not found</p></body></html>"},
        {"warc_type": "response", "http_status": 500,
         "target_uri": "https://err.example/c",
         "payload": b"<html><body><p>server error</p></body></html>"},
        # no HTTP envelope at all -> status NULL -> kept (absence of an
        # envelope is not evidence of an error)
        {"warc_type": "response",
         "target_uri": "https://raw.example/d",
         "payload": b"<html><body><p>raw block</p></body></html>"},
    ]
    (warc_dir / "f.warc").write_bytes(build_warc(recs))

    pages = pages_from_warc(spark, str(warc_dir / "f.warc"),
                            record_types=("response",), ok_only=True)
    urls = {r.url for r in pages.select("url").collect()}
    assert urls == {"https://ok.example/a", "https://raw.example/d"}
    # status passes through for downstream stages that want it
    assert "http_status" in pages.columns

    out_default = str(tmp_path / "out_default")
    s = cp.run_filter_job(spark, str(warc_dir), out_default, n_chunks=1,
                          input_format="warc", extract_from_html=True,
                          extractor="real")
    assert s["docs"] == 2

    out_keep = str(tmp_path / "out_keep")
    s2 = cp.run_filter_job(spark, str(warc_dir), out_keep, n_chunks=1,
                           input_format="warc", extract_from_html=True,
                           extractor="real", http_ok_only=False)
    assert s2["docs"] == 4


def test_resume_guards_filter_semantics(spark, tmp_path):
    """A job started with one extractor/rule set must refuse to resume
    under different semantics — chunks would mix incompatible verdicts."""
    import pytest

    _, warc_dir, _ = _write_corpora(tmp_path)
    out = str(tmp_path / "out")
    cp.run_filter_job(spark, warc_dir.as_posix(), out, n_chunks=1,
                      input_format="warc", extract_from_html=True,
                      extractor="wrapper")
    for kwargs, key in [
        (dict(extractor="real"), "extractor"),
        (dict(structure_rules=True), "structure_rules"),
        (dict(http_ok_only=False), "http_ok_only"),
    ]:
        base = dict(input_format="warc", extract_from_html=True,
                    extractor="wrapper")
        base.update(kwargs)
        with pytest.raises(RuntimeError, match=key):
            cp.run_filter_job(spark, warc_dir.as_posix(), out,
                              n_chunks=1, **base)
    # extract_from_html=False on warc input is rejected even earlier —
    # it would produce an all-NULL text column and an empty corpus
    with pytest.raises(ValueError, match="extract_from_html"):
        cp.run_filter_job(spark, warc_dir.as_posix(), out, n_chunks=1,
                          input_format="warc", extract_from_html=False,
                          extractor="wrapper")


def test_warc_curate_requires_extraction(spark, tmp_path):
    """curate over raw WARC without HTML extraction would silently keep
    nothing (text is NULL for every response record) — both entry
    points reject the combination before parsing any container."""
    import pytest

    from datacanary_spark.plans.curate import run_curation_job

    _, warc_dir, _ = _write_corpora(tmp_path)
    with pytest.raises(ValueError, match="extract_from_html"):
        run_curation_job(spark, warc_dir.as_posix(),
                         str(tmp_path / "cur"), input_format="warc",
                         extract_from_html=False)


def test_curate_from_warc_matches_parquet(spark, tmp_path):
    """Raw crawl -> curated corpus in one job: curate --input-format warc
    must produce the identical corpus to curating the parquet twin."""
    from datacanary_spark.plans.curate import run_curation_job

    pq, warc_dir, _ = _write_corpora(tmp_path)

    s_pq = run_curation_job(spark, str(pq), str(tmp_path / "cur_pq"))
    s_warc = run_curation_job(
        spark, str(warc_dir), str(tmp_path / "cur_warc"),
        input_format="warc", extract_from_html=True, extractor="wrapper")
    assert s_pq["docs_in"] == s_warc["docs_in"] == N_DOCS
    assert s_pq["final_docs"] == s_warc["final_docs"]

    def corpus(out):
        rows = spark.read.parquet(os.path.join(out, "corpus")) \
            .select("url", "text").collect()
        return {r.url: r.text for r in rows}

    assert corpus(str(tmp_path / "cur_pq")) \
        == corpus(str(tmp_path / "cur_warc"))


def test_real_extractor_through_filter_job(spark, tmp_path):
    """WARC of realistic pages (wrapper + entities) through the REAL
    extractor: scrubbed output must match running the plain text."""
    texts = ["a & b < c", "plain words here", "x > y"]
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    recs = []
    for i, t in enumerate(texts):
        enc = (t.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))
        html = (f"<html><head><script>no()</script></head>"
                f"<body><p>{enc}</p></body></html>").encode()
        recs.append({"warc_type": "response", "http_status": 200,
                     "target_uri": f"https://r.example/{i}",
                     "warc_date": "2026-01-01T00:00:00Z",
                     "payload": html})
    (warc_dir / "f.warc").write_bytes(build_warc(recs))
    out = str(tmp_path / "out")
    cp.run_filter_job(spark, str(warc_dir), out, n_chunks=1,
                      input_format="warc", extract_from_html=True,
                      extractor="real")
    got = {r.url: r.scrubbed_text for r in
           spark.read.parquet(os.path.join(out, "data"))
                .select("url", "scrubbed_text").collect()}
    assert got == {f"https://r.example/{i}": t
                   for i, t in enumerate(texts)}
