"""JSONL pages ingestion: format parity with parquet through the
filter job, reader semantics (base64 html, ISO timestamps, corrupt
lines), and curate-from-jsonl."""

from __future__ import annotations

import gzip
import os

from datacanary_spark.plans import checkpoint as cp
from datacanary_spark.sources.fixtures import (
    write_pages_jsonl,
    write_pages_parquet,
)
from datacanary_spark.sources.io import read_pages_jsonl

N_DOCS = 60


def _verdicts(spark, out):
    rows = spark.read.parquet(os.path.join(out, "data")).select(
        "url", "keep", "scrubbed_text").collect()
    return {r.url: (r.keep, r.scrubbed_text) for r in rows}


def test_jsonl_matches_parquet_pipeline(spark, tmp_path):
    pq = str(tmp_path / "pages")
    jl = str(tmp_path / "jsonl")
    write_pages_parquet(pq, n_docs=N_DOCS, seed=42)
    write_pages_jsonl(jl, n_docs=N_DOCS, seed=42, files=3)

    s_pq = cp.run_filter_job(spark, pq, str(tmp_path / "out_pq"),
                             n_chunks=2)
    s_jl = cp.run_filter_job(spark, jl, str(tmp_path / "out_jl"),
                             n_chunks=2, input_format="jsonl")
    assert s_pq["docs"] == s_jl["docs"] == N_DOCS
    assert _verdicts(spark, str(tmp_path / "out_pq")) == \
        _verdicts(spark, str(tmp_path / "out_jl"))


def test_read_pages_jsonl_semantics(spark, tmp_path):
    d = tmp_path / "jl"
    d.mkdir()
    lines = [
        '{"url":"http://a.example/1","warc_ts":"2024-03-01T12:30:00",'
        '"html":"PGI+eDwvYj4=","text":"hello","lang":"en"}',
        # no html, no ts
        '{"url":"http://a.example/2","text":"t2","lang":"de"}',
        'this is not json at all {{{',
        # null url AND null text -> dropped as unusable
        '{"lang":"fr"}',
        # text present, url missing -> kept (usable content)
        '{"text":"orphan text"}',
        # valid JSON, malformed FIELDS: bad ts and non-base64 html must
        # become NULL (ANSI to_timestamp would abort; unbase64 would
        # silently decode garbage)
        '{"url":"http://a.example/4","warc_ts":"20240301t",'
        '"html":"<p>not base64</p>","text":"t4","lang":"en"}',
    ]
    (d / "a.jsonl").write_text("\n".join(lines) + "\n")
    # gzip twin in the same dir — transparent by extension
    (d / "b.jsonl.gz").write_bytes(gzip.compress(
        b'{"url":"http://a.example/3","text":"t3","lang":"en"}\n'))

    from datacanary_spark.plans.checkpoint import _chunk_files

    files = _chunk_files(str(d), 1, "jsonl")[0]
    rows = {r["url"]: r for r in read_pages_jsonl(spark, files).collect()}
    assert set(rows) == {"http://a.example/1", "http://a.example/2",
                         "http://a.example/3", "http://a.example/4", None}
    assert rows["http://a.example/4"]["warc_ts"] is None
    assert rows["http://a.example/4"]["html"] is None
    r1 = rows["http://a.example/1"]
    assert bytes(r1["html"]) == b"<b>x</b>"
    assert r1["warc_ts"].year == 2024 and r1["warc_ts"].minute == 30
    assert rows["http://a.example/2"]["html"] is None
    assert rows[None]["text"] == "orphan text"
    # schema matches the parquet pages shape
    got = dict(read_pages_jsonl(spark, files).dtypes)
    assert got == {"url": "string", "warc_ts": "timestamp",
                   "html": "binary", "text": "string", "lang": "string"}
    # directory form (Hadoop-FS aware) reads the same rows and ignores
    # half-written temp uploads
    from datacanary_spark.sources.io import read_pages_jsonl_dir

    (d / "upload.jsonl.gz.tmp").write_bytes(b"\x1f\x8b garbage")
    via_dir = {r["url"] for r in
               read_pages_jsonl_dir(spark, str(d)).collect()}
    assert via_dir == set(rows)


def test_curate_from_jsonl_matches_parquet(spark, tmp_path):
    from datacanary_spark.plans.curate import run_curation_job

    pq = str(tmp_path / "pages")
    jl = str(tmp_path / "jsonl")
    write_pages_parquet(pq, n_docs=N_DOCS, seed=42)
    write_pages_jsonl(jl, n_docs=N_DOCS, seed=42, files=2,
                      gzip_files=False)
    s1 = run_curation_job(spark, pq, str(tmp_path / "c_pq"))
    s2 = run_curation_job(spark, jl, str(tmp_path / "c_jl"),
                          input_format="jsonl")
    assert s1["final_docs"] == s2["final_docs"] > 0
    a = {(r["url"], r["text"]) for r in
         spark.read.parquet(str(tmp_path / "c_pq") + "/corpus").collect()}
    b = {(r["url"], r["text"]) for r in
         spark.read.parquet(str(tmp_path / "c_jl") + "/corpus").collect()}
    assert a == b


def test_streaming_jsonl_matches_batch(spark, tmp_path):
    """The streaming front-end over JSONL dumps produces the same
    verdict rows as the batch reader + filter, and a restart after new
    files land processes only the new files."""
    from datacanary_spark.plans.pipeline import (
        broadcast_models,
        filter_pages,
    )
    from datacanary_spark.streaming.filter_stream import run_filter_stream

    jl = str(tmp_path / "jl")
    write_pages_jsonl(jl, n_docs=30, seed=42, files=2)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_filter_stream(spark, jl, out, ckpt, input_format="jsonl")
    got = {r["url"]: (r["keep"], r["scrubbed_text"]) for r in
           spark.read.parquet(out + "/verdicts").collect()}
    from datacanary_spark.plans.checkpoint import _chunk_files

    batch = filter_pages(
        read_pages_jsonl(spark, _chunk_files(jl, 1, "jsonl")[0]),
        broadcast_models(spark))
    want = {r["url"]: (r["keep"], r["scrubbed_text"])
            for r in batch.collect()}
    assert got == want and len(got) == 30
    # restart with one new file: only the delta is processed (write
    # the drop to a staging dir, then land it under a fresh name so
    # the already-tracked files are untouched)
    import os as _os

    stage = str(tmp_path / "stage")
    write_pages_jsonl(stage, n_docs=10, seed=43, files=1, start_id=1000)
    _os.rename(stage + "/part-0000.jsonl.gz", jl + "/part-new.jsonl.gz")
    run_filter_stream(spark, jl, out, ckpt, input_format="jsonl")
    n2 = spark.read.parquet(out + "/verdicts").count()
    assert n2 == 40
