"""WARC / WET record splitting — the Common-Crawl ingestion source.

Common Crawl publishes crawls as gzipped WARC files (ISO 28500: a
concatenation of records, each a version line + named headers + a
Content-Length-delimited block) and WET files (the same container
holding ``conversion`` records whose block is already extracted text).
A 100-TB webtext job starts by turning those containers into one row
per page; everything downstream (language-ID, quality filter, dedup,
scrub) is ordinary DataFrame work over that table.

Spark shape: read the files with ``spark.read.format("binaryFile")``
(one row per file: ``path``, ``content``), then ``parse_warc_records``
fans each file out to its records with ``mapInPandas`` — pure-Python
parsing, Arrow-batched, no per-row Python UDF. Parallelism is
per-file, which is the standard Common-Crawl granularity (the corpus
is ~64k x ~1 GiB segment files per crawl; a 1000-executor cluster
keeps every core busy on file count alone). Records stream out of the
generator one input row at a time, so executor memory is bounded by
one decompressed file, never a whole partition of them.

Reference anchor: the reference engine ingests already-tabular pages
(``/root/reference/src/datacanary/analyser.py`` reads CSV/parquet);
WARC splitting is part of this repo's web-pipeline surface, not a
reference port.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Output of parse_warc_records: one row per WARC record.
RECORD_SCHEMA = T.StructType([
    T.StructField("source_path", T.StringType(), True),
    T.StructField("record_ix", T.LongType(), True),       # physical 0-based
                                                          # position per file,
                                                          # counted pre-filter
    T.StructField("warc_type", T.StringType(), True),     # response/conversion/…
    T.StructField("target_uri", T.StringType(), True),    # WARC-Target-URI
    T.StructField("warc_date", T.StringType(), True),     # WARC-Date, ISO-8601
    T.StructField("content_type", T.StringType(), True),  # record Content-Type
    T.StructField("http_status", T.IntegerType(), True),  # response records only
    T.StructField("payload", T.BinaryType(), True),        # HTTP body / WET text
])

_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(data: bytes) -> bytes:
    """Transparently decompress gzipped WARC bytes.

    Common-Crawl WARCs are *multi-member* gzip (one member per record);
    ``gzip.decompress`` walks concatenated members, so both per-record
    and whole-file compression come out right.
    """
    if data[:2] == _GZIP_MAGIC:
        return gzip.decompress(data)
    return data


def _split_http_payload(block: bytes) -> tuple[int | None, bytes]:
    """Split an HTTP response block into (status, body).

    WARC ``response`` records store the raw HTTP exchange: status line,
    headers, CRLFCRLF, body. Anything that does not parse as HTTP is
    returned whole with status None (robust to truncated crawls).
    """
    if not block.startswith(b"HTTP/"):
        return None, block
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        return None, block
    try:
        status = int(head.split(b"\r\n", 1)[0].split(b" ")[1])
    except (IndexError, ValueError):
        return None, block
    return status, body


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per record from raw (possibly gzipped) WARC bytes.

    Tolerant, forward-only parse: find each ``WARC/`` version line,
    read headers to the blank line, take exactly ``Content-Length``
    bytes of block, skip the record terminator. Malformed trailing
    garbage ends the scan instead of raising — a truncated crawl file
    should yield its good prefix, not kill the task.
    """
    data = _maybe_gunzip(data)
    pos = 0
    n = len(data)
    while pos < n:
        # seek the next version line (skips inter-record CRLFs)
        vstart = data.find(b"WARC/", pos)
        if vstart < 0:
            return
        hend = data.find(b"\r\n\r\n", vstart)
        if hend < 0:
            return
        headers: dict[str, str] = {}
        lines = data[vstart:hend].split(b"\r\n")
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace"))
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            # one record with a missing/corrupt Content-Length must not
            # discard the rest of the file: reseek the next version line
            # after this one and keep parsing
            pos = vstart + 5
            continue
        bstart = hend + 4
        block = data[bstart:bstart + clen]
        yield {
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "block": block,
        }
        pos = bstart + clen


def parse_warc_records(files: DataFrame, path_col: str = "path",
                       content_col: str = "content",
                       warc_types: tuple[str, ...] | None = None) -> DataFrame:
    """Fan a (path, content) DataFrame of WARC/WET files out to records.

    ``warc_types`` keeps only those record types (e.g. ``("response",)``
    for WARC page fetches, ``("conversion",)`` for WET text); None keeps
    everything including ``warcinfo``/``request`` bookkeeping records.
    For ``response`` records the HTTP envelope is split off: ``payload``
    is the body and ``http_status`` the status code; other record types
    pass their block through with status NULL.
    """
    keep = tuple(warc_types) if warc_types else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf[path_col], pdf[content_col]):
                if content is None:
                    continue
                rows = []
                # record_ix is the PHYSICAL position in the file (counted
                # before the type filter) so the same record keeps the
                # same index regardless of which warc_types a caller asks
                # for — stable lineage / cross-run join key
                for ix, rec in enumerate(iter_warc_records(bytes(content))):
                    if keep is not None and rec["warc_type"] not in keep:
                        continue
                    status, body = (
                        _split_http_payload(rec["block"])
                        if rec["warc_type"] == "response"
                        else (None, rec["block"]))
                    rows.append((path, ix, rec["warc_type"],
                                 rec["target_uri"], rec["warc_date"],
                                 rec["content_type"], status, body))
                if rows:
                    # one output batch per input file: bounds memory to a
                    # single decompressed file, streams across files
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in RECORD_SCHEMA])

    return files.select(path_col, content_col).mapInPandas(
        gen, schema=RECORD_SCHEMA)


def build_warc(records: list[dict], compress: bool = False) -> bytes:
    """Serialize records into WARC/1.0 bytes (test/fixture twin of the
    parser — also how the e2e oracle query constructs its input).

    Each record dict: ``warc_type`` (required), optional ``target_uri``,
    ``warc_date``, ``content_type``, ``http_status`` (wraps the payload
    in an HTTP envelope when set), and ``payload`` bytes. ``compress``
    emits one gzip member per record, Common-Crawl style.
    """
    out = bytearray()
    for rec in records:
        payload = rec.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        status = rec.get("http_status")
        if status is not None:
            payload = (f"HTTP/1.1 {status} OK\r\n"
                       f"Content-Length: {len(payload)}\r\n\r\n"
                       ).encode("ascii") + payload
        headers = [f"WARC/1.0\r\nWARC-Type: {rec['warc_type']}"]
        if rec.get("target_uri"):
            headers.append(f"WARC-Target-URI: {rec['target_uri']}")
        if rec.get("warc_date"):
            headers.append(f"WARC-Date: {rec['warc_date']}")
        if rec.get("content_type"):
            headers.append(f"Content-Type: {rec['content_type']}")
        headers.append(f"Content-Length: {len(payload)}")
        member = ("\r\n".join(headers) + "\r\n\r\n").encode("ascii") \
            + payload + b"\r\n\r\n"
        out += gzip.compress(member) if compress else member
    return bytes(out)
