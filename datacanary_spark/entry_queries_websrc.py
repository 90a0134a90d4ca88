"""Driver-contract queries: WARC/WET ingestion (sources/warc.py) and
real HTML -> text extraction (functions/htmltext.py).

Registered into datacanary_spark.entry_queries.{QUERIES,ORACLE_SQL}.
Neither WARC container framing nor HTML parsing is expressible in
DuckDB SQL, so both queries use the fixture-construction pattern
(like ``incremental_ingest_accepted``): the INPUT is built
deterministically from the documents table by a formula both sides
share, the Spark side runs the real operator end-to-end over that
input, and the oracle computes what a correct run must produce
directly from the formula. A parser/extractor bug surfaces as a
count/byte mismatch, not a trivially-true comparison.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _t, register
from datacanary_spark.functions.htmltext import (
    encode_html_entities,
    make_html_to_text_udf,
)

# ---------------------------------------------------------------------------
# WARC ingest: docs -> WET-style conversion records -> parse -> account
# ---------------------------------------------------------------------------

_WARC_DOCS = 300      # fixture slice (every sf has >= 300 docs)
_DOCS_PER_FILE = 50   # multi-record files; odd files gzipped per-record

_WARC_SQL = f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(strlen(text)) AS BIGINT) AS sum_payload_bytes,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE doc_id < {_WARC_DOCS} AND text IS NOT NULL
    GROUP BY lang
"""


@register("warc_ingest_by_lang", _WARC_SQL)
def warc_ingest_by_lang(spark, sf_dir):
    """End-to-end WARC source: pack the first {N} docs into multi-record
    WARC files (a warcinfo header record plus one WET ``conversion``
    record per doc; every odd file per-record-gzipped, Common-Crawl
    style), split them back out with ``parse_warc_records``, recover
    doc ids from WARC-Target-URI, and account per language via a
    broadcast join to the documents table. The oracle computes the
    same accounting straight from the table — equal counts and payload
    BYTES prove framing, type filtering, gzip members, and UTF-8
    payload integrity in one pass. Fixture packing is driver-side by
    construction (it builds the input, like incremental ingest's temp
    store); the parse itself is the distributed mapInPandas path.
    """
    from datacanary_spark.sources.warc import build_warc, parse_warc_records

    d = _t(spark, sf_dir, "documents")
    docs = (d.where((F.col("doc_id") < _WARC_DOCS)
                    & F.col("text").isNotNull())
             .select("doc_id", "text").orderBy("doc_id").collect())
    files = []
    for fx in range(0, len(docs), _DOCS_PER_FILE):
        chunk = docs[fx:fx + _DOCS_PER_FILE]
        recs = [{"warc_type": "warcinfo",
                 "content_type": "application/warc-fields",
                 "payload": b"software: datacanary-spark\r\n"}]
        recs += [{"warc_type": "conversion",
                  "target_uri": f"https://corpus.example/doc/{r.doc_id}",
                  "warc_date": "2026-01-01T00:00:00Z",
                  "content_type": "text/plain",
                  "payload": r.text} for r in chunk]
        gz = (fx // _DOCS_PER_FILE) % 2 == 1
        name = f"crawl-{fx // _DOCS_PER_FILE:05d}.warc" + (".gz" if gz else "")
        files.append((name, build_warc(recs, compress=gz)))
    fdf = spark.createDataFrame(files, "path string, content binary") \
               .repartition(8)
    recs = parse_warc_records(fdf, warc_types=("conversion",))
    ids = recs.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
         .cast("long").alias("doc_id"),
        F.length("payload").alias("_bytes"))
    langs = d.where(F.col("doc_id") < _WARC_DOCS).select("doc_id", "lang")
    return (ids.join(F.broadcast(langs), "doc_id")
               .groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_records"),
                    F.sum("_bytes").alias("sum_payload_bytes"),
                    F.min("doc_id").alias("min_doc"),
                    F.max("doc_id").alias("max_doc")))


# ---------------------------------------------------------------------------
# HTML extraction round-trip: text -> realistic page -> extract -> text
# ---------------------------------------------------------------------------

_HTML_SQL = """
    WITH n AS (
      SELECT lang, doc_id,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
      FROM documents WHERE text IS NOT NULL
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_roundtrip,
           CAST(sum(strlen('Doc ' || doc_id || chr(10) || norm))
                AS BIGINT) AS sum_bytes
    FROM n WHERE norm <> '' GROUP BY lang
"""


@register("html_extract_roundtrip", _HTML_SQL)
def html_extract_roundtrip(spark, sf_dir):
    """Real extractor over realistic pages: each doc's text (whitespace-
    normalized so the round-trip is well-defined) is entity-encoded and
    embedded in a full page — head with title and a script containing a
    bare ``<``, an ``<h1>``, the ``<p>`` body, an HTML comment — then
    extracted back with the pure-Python ``html_to_text`` pandas UDF.
    The oracle asserts EVERY doc round-trips (n_roundtrip == n_docs)
    and pins the exact output byte count, so any drift in tag
    stripping, entity decoding, whitespace policy, or head/script/
    comment removal shows up as a value mismatch. Distributed
    end-to-end: one narrow projection + one Arrow-batched UDF + one
    aggregate — the 100-TB extraction plan shape.
    """
    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    d = d.withColumn(
        "_norm", F.trim(F.regexp_replace("text", r"\s+", " "))) \
         .where(F.col("_norm") != "")
    page = F.concat(
        F.lit("<html><head><title>Title</title>"
              "<script>if (1 < 2) track();</script></head>"
              "<body><h1>Doc "), F.col("doc_id").cast("string"),
        F.lit("</h1><p>"), encode_html_entities(F.col("_norm")),
        F.lit("</p><!-- hidden --></body></html>"))
    d = d.withColumn("_html", F.encode(page, "utf-8"))
    d = d.withColumn("_extracted", make_html_to_text_udf()(F.col("_html")))
    expected = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"),
                        F.lit("\n"), F.col("_norm"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("_extracted") == expected).cast("long"))
         .alias("n_roundtrip"),
        F.sum(F.octet_length("_extracted")).alias("sum_bytes"))


# ---------------------------------------------------------------------------
# Multimodal decode: real PGM bytes -> Netpbm codec -> per-lang accounting
# ---------------------------------------------------------------------------

_MM_DOCS = 240

_MM_SQL = f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(CASE WHEN doc_id % 10 = 7 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_ok,
           CAST(sum(CASE WHEN doc_id % 10 = 7 THEN NULL
                         ELSE 4 + doc_id % 5 END) AS BIGINT) AS sum_width,
           CAST(sum(CASE WHEN doc_id % 10 = 7 THEN NULL
                         ELSE 3 + doc_id % 4 END) AS BIGINT) AS sum_height,
           CAST(sum(CASE WHEN doc_id % 10 = 7 THEN NULL
                         ELSE (4 + doc_id % 5) * (3 + doc_id % 4) END)
                AS BIGINT) AS sum_bytes
    FROM documents WHERE doc_id < {_MM_DOCS} GROUP BY lang
"""


@register("multimodal_decode_stats", _MM_SQL)
def multimodal_decode_stats(spark, sf_dir):
    """End-to-end REAL image decode through the multimodal seam: each
    doc becomes a genuine binary PGM (P5) image — width ``4 + id%5``,
    height ``3 + id%4``, uniform gray ``id % 251`` — built as real
    bytes in an Arrow-batched pandas UDF; every ``id % 10 == 7`` image
    has its raster truncated by one byte. ``decode_media`` (the
    mapInPandas path used for crawl media) runs the pure-Python Netpbm
    codec over them; corrupt rows must surface as contained ok=false
    rows, never task failures. The oracle recomputes the accounting
    (count, ok-count, decoded width/height/byte sums) straight from
    the construction formula, so a header-parse, truncation-detect, or
    batching bug shows up as a value mismatch. Plan shape: narrow
    projection -> one pandas UDF -> mapInPandas -> broadcast join ->
    one aggregate — the 100-TB media-ingest shape.
    """
    from datacanary_spark.operators.multimodal import (
        NetpbmImageCodec,
        decode_media,
    )

    d = (_t(spark, sf_dir, "documents")
         .where(F.col("doc_id") < _MM_DOCS).select("doc_id", "lang"))

    @F.pandas_udf("binary")
    def _pgm(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h, v = 4 + i % 5, 3 + i % 4, i % 251
            body = bytes([v]) * (w * h)
            if i % 10 == 7:
                body = body[:-1]  # truncated raster -> decode error
            out.append(b"P5 %d %d 255\n" % (w, h) + body)
        return pd.Series(out)

    media = d.select(F.col("doc_id").alias("media_id"),
                     F.lit("image").alias("kind"),
                     _pgm(F.col("doc_id")).alias("payload")).repartition(8)
    dec = decode_media(media, codec=NetpbmImageCodec())
    langs = d.select(F.col("doc_id").alias("media_id"), "lang")
    ok = F.col("ok")
    return (dec.join(F.broadcast(langs), "media_id")
               .groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_media"),
                    F.sum(ok.cast("long")).alias("n_ok"),
                    F.sum(F.when(ok, F.col("width"))).alias("sum_width"),
                    F.sum(F.when(ok, F.col("height"))).alias("sum_height"),
                    F.sum(F.when(ok, F.col("n_bytes"))).alias("sum_bytes")))


# ---------------------------------------------------------------------------
# Multimodal resize: real rasters -> nearest-neighbor thumbnail accounting
# ---------------------------------------------------------------------------

_RS_OUT = 8  # output dims (8x8)

# doc i renders a PGM whose pixel at (r, c) is (i%251 + r*w + c) % 256 —
# non-uniform, so the oracle's replay of the NN index arithmetic
# ((out_row*h)//8, (out_col*w)//8) pins WHICH source pixels the resize
# sampled, not just how many bytes came out.
_RS_SQL = f"""
    WITH m AS (
      SELECT doc_id, lang,
             4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
             doc_id % 251 AS v
      FROM documents WHERE doc_id < {_MM_DOCS}),
    ok AS (SELECT * FROM m WHERE doc_id % 10 <> 7),
    px AS (
      SELECT o.lang,
             (o.v + ((i.range * o.h) // {_RS_OUT}) * o.w
                  + ((j.range * o.w) // {_RS_OUT})) % 256 AS p
      FROM ok o, range(0, {_RS_OUT}) i, range(0, {_RS_OUT}) j)
    SELECT m.lang,
           CAST(count(DISTINCT m.doc_id) AS BIGINT) AS n_media,
           CAST((SELECT count(*) FROM ok WHERE ok.lang IS NOT DISTINCT
                 FROM m.lang) AS BIGINT) AS n_ok,
           CAST((SELECT count(*) FROM ok WHERE ok.lang IS NOT DISTINCT
                 FROM m.lang) * {_RS_OUT * _RS_OUT} AS BIGINT)
               AS sum_out_bytes,
           CAST((SELECT sum(p) FROM px WHERE px.lang IS NOT DISTINCT
                 FROM m.lang) AS BIGINT) AS sum_pix
    FROM m GROUP BY m.lang
"""


@register("multimodal_resize_stats", _RS_SQL)
def multimodal_resize_stats(spark, sf_dir):
    """Nearest-neighbor raster resize end-to-end
    (``operators/multimodal.resize_media``): each doc becomes a real
    binary PGM whose pixel at (r, c) is ``(id%251 + r*w + c) % 256``;
    every ``id % 10 == 7`` raster is truncated and must surface as a
    contained ok=false row. The 8x8 thumbnails' byte SUM is compared
    against the oracle's replay of the exact NN index arithmetic
    ``src = ((out*dim) // 8)`` — a sampling-geometry, channel, or
    containment bug is a value mismatch. Plan shape: pandas-UDF build
    -> mapInPandas resize -> pandas-UDF byte sum -> broadcast join ->
    one aggregate."""
    from datacanary_spark.operators.multimodal import (
        NetpbmImageCodec,
        resize_media,
    )

    d = (_t(spark, sf_dir, "documents")
         .where(F.col("doc_id") < _MM_DOCS).select("doc_id", "lang"))

    @F.pandas_udf("binary")
    def _pgm(ids: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for i in ids:
            i = int(i)
            w, h, v = 4 + i % 5, 3 + i % 4, i % 251
            grid = (v + np.arange(h)[:, None] * w
                    + np.arange(w)[None, :]) % 256
            body = grid.astype(np.uint8).tobytes()
            if i % 10 == 7:
                body = body[:-1]  # truncated raster -> contained error
            out.append(b"P5 %d %d 255\n" % (w, h) + body)
        return pd.Series(out)

    @F.pandas_udf("long")
    def _bytesum(b: pd.Series) -> pd.Series:
        import numpy as np
        return b.map(lambda x: None if x is None
                     else int(np.frombuffer(bytes(x), np.uint8)
                              .astype(np.int64).sum()))

    media = d.select(F.col("doc_id").alias("media_id"),
                     F.lit("image").alias("kind"),
                     _pgm(F.col("doc_id")).alias("payload"),
                     F.lit(None).cast("map<string,string>").alias("meta")) \
             .repartition(8)
    rs = resize_media(media, out_w=_RS_OUT, out_h=_RS_OUT,
                      codec=NetpbmImageCodec())
    langs = d.select(F.col("doc_id").alias("media_id"), "lang")
    ok = F.col("ok")
    rs = rs.withColumn("_ps", F.when(ok, _bytesum(F.col("body"))))
    return (rs.join(F.broadcast(langs), "media_id")
              .groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n_media"),
                   F.sum(ok.cast("long")).alias("n_ok"),
                   F.sum(F.when(ok, F.octet_length("body"))
                          .otherwise(F.lit(0)).cast("long"))
                    .alias("sum_out_bytes"),
                   F.sum("_ps").alias("sum_pix")))


# ---------------------------------------------------------------------------
# HTML page-structure signals: formula-built pages -> expression signals
# ---------------------------------------------------------------------------

_SIG_DOCS = 300

_SIG_ANCHOR = "((doc_id % 4) * ((doc_id % 4) + 3)) // 2"
_SIG_TEXT = (f"4 + length(CAST(doc_id AS VARCHAR)) + {_SIG_ANCHOR}"
             " + 1 + doc_id % 9")

_SIG_SQL = f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_noindex,
           CAST(sum(doc_id % 4) AS BIGINT) AS sum_links,
           CAST(sum({_SIG_ANCHOR}) AS BIGINT) AS sum_anchor_chars,
           CAST(sum({_SIG_TEXT}) AS BIGINT) AS sum_text_chars,
           CAST(sum(8 * (doc_id % 3)) AS BIGINT) AS sum_script_chars,
           round(avg(CAST({_SIG_ANCHOR} AS DOUBLE) / ({_SIG_TEXT})), 6)
               AS avg_link_density
    FROM documents WHERE doc_id < {_SIG_DOCS} GROUP BY lang
"""


@register("html_signals_by_lang", _SIG_SQL)
def html_signals_by_lang(spark, sf_dir):
    """Page-structure signals end-to-end (operators/html_signals.py):
    each doc renders as real binary HTML — title ``Doc {id}``, a
    robots-noindex meta on every 7th page, ``id % 4`` anchors with
    anchor texts of length ``k+1``, an ``(1 + id % 9)``-char body
    paragraph, and an ``8 * (id % 3)``-char inline script. The REAL
    regex signal expressions (title/robots/anchor/visible-text/script
    extraction) run over those bytes; the oracle recomputes every
    aggregate straight from the construction arithmetic, so a regex,
    stripping, or null-handling bug surfaces as a value mismatch.
    Expression-only plan: narrow scan -> codegen projection -> one
    group-by Exchange — the per-page signal shape at crawl scale.
    """
    from datacanary_spark.operators.html_signals import page_signals

    d = (_t(spark, sf_dir, "documents")
         .where(F.col("doc_id") < _SIG_DOCS).select("doc_id", "lang"))
    i = F.col("doc_id")

    def anchor(k: int):
        host = ((i * 3 + k) % 11).cast("string")
        return F.when(
            i % 4 >= k,
            F.concat(F.lit('<a href="https://h'), host,
                     F.lit('.example/">'), F.lit("a" * (k + 1)),
                     F.lit("</a>"))).otherwise(F.lit(""))

    meta = F.when(i % 7 == 0,
                  F.lit('<meta name="robots" content="noindex">')) \
            .otherwise(F.lit(""))
    body = F.concat(F.lit("<p>"),
                    F.lit("x" * 9).substr(F.lit(1), i % 9 + 1),
                    F.lit("</p>"))
    script = F.concat(F.lit("<script>"),
                      F.lit("v" * 16).substr(F.lit(1), (i % 3) * 8),
                      F.lit("</script>"))
    html = F.concat(F.lit("<html><head><title>Doc "), i.cast("string"),
                    F.lit("</title>"), meta, F.lit("</head><body>"),
                    anchor(1), anchor(2), anchor(3), body, script,
                    F.lit("</body></html>"))
    pages = d.select("lang", F.encode(html, "utf-8").alias("html"))
    sig = page_signals(pages)
    return (sig.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_pages"),
                    F.sum(F.col("has_noindex").cast("long"))
                     .alias("n_noindex"),
                    F.sum(F.col("n_links").cast("long")).alias("sum_links"),
                    F.sum("anchor_chars").alias("sum_anchor_chars"),
                    F.sum("text_chars").alias("sum_text_chars"),
                    F.sum("script_chars").alias("sum_script_chars"),
                    F.bround(F.avg("link_density"), 6)
                     .alias("avg_link_density")))


# ---------------------------------------------------------------------------
# canonical-link dedup: formula-declared <link rel=canonical> -> collapse
# ---------------------------------------------------------------------------

_CD_DOCS = 300

_CD_SQL = f"""
    WITH m AS (
      SELECT doc_id, lang,
             'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p'
                 || CAST(doc_id AS VARCHAR) AS url,
             CASE
               WHEN doc_id % 5 = 4 THEN NULL
               WHEN doc_id % 3 <> 0 AND doc_id % 7 = 6
                 THEN 'https://ext.example/e'
                      || CAST(doc_id - doc_id % 3 AS VARCHAR)
               ELSE 'https://h' || CAST((doc_id - doc_id % 3) % 7 AS VARCHAR)
                    || '.example/p' || CAST(doc_id - doc_id % 3 AS VARCHAR)
             END AS decl
      FROM documents WHERE doc_id < {_CD_DOCS}),
    k AS (SELECT *, COALESCE(decl, url) AS ckey FROM m),
    g AS (SELECT ckey, CAST(count(*) AS BIGINT) AS n,
                 max(CASE WHEN url = ckey THEN 1 ELSE 0 END) AS has_self,
                 min(CASE WHEN url = ckey THEN doc_id END) AS self_id,
                 min(doc_id) AS min_id
          FROM k GROUP BY ckey),
    s AS (SELECT ckey, n,
                 CASE WHEN has_self = 1 THEN self_id ELSE min_id END AS sid
          FROM g)
    SELECT k.lang,
           CAST(count(*) AS BIGINT) AS n_survivors,
           CAST(sum(s.sid) AS BIGINT) AS sum_survivor_ids,
           CAST(sum(s.n) AS BIGINT) AS n_pages_absorbed
    FROM s JOIN k ON k.doc_id = s.sid
    GROUP BY k.lang
"""


@register("canonical_dedup_by_lang", _CD_SQL)
def canonical_dedup_by_lang(spark, sf_dir):
    """Publisher-declared duplicate collapse end-to-end
    (``operators/dedup.canonical_dedup``): each doc renders real HTML
    whose ``<link rel="canonical">`` (attribute order alternating by
    parity, exercising both regex forms) points at its 3-group base
    doc; every 5th doc declares nothing (own-url identity) and the
    ``%7=6`` non-base docs point at an EXTERNAL never-crawled target
    (min-id fallback — no self row in the group). The oracle replays
    the declaration formula and the survivor rule (self row wins, else
    min id), so an extraction-regex, grouping, fallback, or
    variant-count bug is a value mismatch. One shuffle on the
    canonical key; sum_survivor_ids pins the exact survivor SET.
    """
    from datacanary_spark.operators.dedup import canonical_dedup

    d = (_t(spark, sf_dir, "documents")
         .where(F.col("doc_id") < _CD_DOCS).select("doc_id", "lang"))
    i = F.col("doc_id")
    base = i - i % 3
    url = F.concat(F.lit("https://h"), (i % 7).cast("string"),
                   F.lit(".example/p"), i.cast("string"))
    base_url = F.concat(F.lit("https://h"), (base % 7).cast("string"),
                        F.lit(".example/p"), base.cast("string"))
    ext = F.concat(F.lit("https://ext.example/e"), base.cast("string"))
    decl = F.when(i % 5 == 4, F.lit(None).cast("string")) \
            .when((i % 3 != 0) & (i % 7 == 6), ext) \
            .otherwise(base_url)
    rel_first = F.concat(F.lit('<link rel="canonical" href="'), decl,
                         F.lit('">'))
    href_first = F.concat(F.lit('<link href="'), decl,
                          F.lit('" rel="canonical">'))
    link = F.when(decl.isNull(), F.lit("")) \
            .otherwise(F.when(i % 2 == 0, rel_first).otherwise(href_first))
    html = F.concat(F.lit("<html><head>"), link,
                    F.lit("</head><body>x</body></html>"))
    pages = d.select("doc_id", "lang", url.alias("url"),
                     F.encode(html, "utf-8").alias("html"))
    out = canonical_dedup(pages, count_col="n_variants")
    return (out.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_survivors"),
                    F.sum("doc_id").alias("sum_survivor_ids"),
                    F.sum("n_variants").alias("n_pages_absorbed")))


# ---------------------------------------------------------------------------
# Perceptual dHash near-dup (operators/media_hash.py): plant FAKEMM
# images whose dHash is constructed EXACTLY (each group g in 0..7 gets
# target hash 0xFF << 8g; every third member flips one bit), run the
# real decode -> luma grid -> dHash -> hamming-banded candidate join ->
# bit_count verify, and account pairs per group. Cross-group hashes
# differ by >= 14 bits (>> max_distance 2) but DO collide on all-zero
# bands -- the verify stage must kill exactly those. The oracle derives
# the pair set in closed form: all within-group pairs, distance 1 iff
# exactly one member is a bit-flipped variant (i//8 % 3 == 2).
# ---------------------------------------------------------------------------

_PH_DOCS = 240


_PH_SQL = f"""
    WITH m AS (
      SELECT doc_id AS i, doc_id % 8 AS grp,
             CAST(floor(doc_id / 8) AS BIGINT) % 3 AS v
      FROM documents WHERE doc_id < {_PH_DOCS}
    ),
    pairs AS (
      SELECT a.grp AS grp, a.i AS id_a, b.i AS id_b,
             CASE WHEN (a.v = 2) <> (b.v = 2) THEN 1 ELSE 0 END AS d
      FROM m a JOIN m b ON a.grp = b.grp AND a.i > b.i
    )
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(id_a + id_b) AS BIGINT) AS id_sum,
           CAST(sum(d) AS BIGINT) AS dist_sum
    FROM pairs GROUP BY grp
"""


@register("image_phash_pairs", _PH_SQL)
def image_phash_pairs(spark, sf_dir):
    """End-to-end perceptual near-dup: 240 planted 9x8 FAKEMM images
    (pixel walk encodes each target hash exactly; see
    tests/test_media_hash.py::grid_image) through the REAL
    decode+dHash mapInPandas pass and the hamming-banded pair join at
    max_distance=2. id_sum/dist_sum pin exact pair membership AND
    exact distances, so a hash-bit, banding, or verify bug cannot
    cancel out. Payload construction is driver-side by design (240
    rows -- the fixture-construction pattern of warc_ingest_by_lang);
    decode, hashing, banding, and verification are the distributed
    operator paths."""
    from datacanary_spark.operators.media_hash import (
        HASH_H, HASH_W, dhash_media, encode_hash_image as grid_image,
        phash_near_pairs,
    )
    from datacanary_spark.operators.multimodal import encode_fake_media

    ids = [r.doc_id for r in
           _t(spark, sf_dir, "documents").where(F.col("doc_id") < _PH_DOCS)
           .select("doc_id").collect()]
    rows = []
    for i in sorted(int(x) for x in ids):
        g, v = i % 8, (i // 8) % 3
        target = 0xFF << (8 * g)
        if v == 2:
            target ^= 1 << (8 * g + 3)
        rows.append((i, encode_fake_media("I", HASH_W, HASH_H, 1,
                                          grid_image(target))))
    media = spark.createDataFrame(rows, "media_id bigint, payload binary") \
                 .repartition(8)
    hashes = dhash_media(media)
    pairs = phash_near_pairs(hashes, max_distance=2, bands=4)
    return (pairs.groupBy((F.col("id_a") % 8).alias("grp"))
                 .agg(F.count(F.lit(1)).alias("n_pairs"),
                      F.sum(F.col("id_a") + F.col("id_b")).alias("id_sum"),
                      F.sum("distance").alias("dist_sum")))


# ---------------------------------------------------------------------------
# Video near-dup (operators/media_hash.py): plant 5-frame FAKEMM videos
# where consecutive doc pairs (2k, 2k+1) overlap on exactly 3 honest
# frame hashes, and EVERY video carries one ubiquitous "black frame"
# hash that the posting cap must drop. The oracle is closed-form:
# pair (2k+1, 2k) with shared_frames = 3 — if the posting cap failed,
# the black frame would make it 4 (and spray pairs across all videos),
# so the cap itself is oracle-pinned.
# ---------------------------------------------------------------------------

_VID_DOCS = 200
_VID_BLACK = 1 << 40      # ubiquitous frame target


_VID_SQL = f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(3 AS BIGINT) AS shared_frames
    FROM documents a JOIN documents b ON a.doc_id = b.doc_id + 1
    WHERE b.doc_id % 2 = 0
      AND a.doc_id < {_VID_DOCS} AND b.doc_id < {_VID_DOCS}
"""


@register("video_near_dup_pairs", _VID_SQL)
def video_near_dup_pairs_q(spark, sf_dir):
    """End-to-end video near-dup: video i carries frames
    ``100*(i//2) + (i%2) + j`` for j in 0..3 plus the shared black
    frame — so videos 2k and 2k+1 overlap on 3 honest hashes and all
    videos overlap on the black one. Runs the real per-frame decode +
    dHash mapInPandas pass and the posting-capped shared-frame join
    (max_posting=50 << 200 videos drops the black frame; min_shared=3
    admits exactly the consecutive pairs)."""
    from datacanary_spark.operators.media_hash import (
        HASH_H, HASH_W, encode_hash_image,
        video_near_dup_pairs, video_phash_frames,
    )
    from datacanary_spark.operators.multimodal import encode_fake_media

    ids = [int(r.doc_id) for r in
           _t(spark, sf_dir, "documents").where(F.col("doc_id") < _VID_DOCS)
           .select("doc_id").collect()]
    rows = []
    for i in sorted(ids):
        targets = [100 * (i // 2) + (i % 2) + j for j in range(4)]
        targets.append(_VID_BLACK)
        body = b"".join(encode_hash_image(t) for t in targets)
        rows.append((i, encode_fake_media("V", HASH_W, HASH_H,
                                          len(targets), body)))
    media = spark.createDataFrame(rows, "media_id bigint, payload binary") \
                 .repartition(8)
    frames = video_phash_frames(media)
    return video_near_dup_pairs(frames, min_shared=3, max_posting=50)


# ---------------------------------------------------------------------------
# Audio near-dup: the 1-D envelope-dHash twin of image_phash_pairs —
# same residue-class group design (target 0xFF << 8g per group g,
# every third member flips one bit), same closed-form oracle, but the
# hash comes from the audio envelope pass and the pairs reuse the SAME
# hamming-banded join. Pins the whole audio path end to end.
# ---------------------------------------------------------------------------

_AU_DOCS = 240


_AU_SQL = f"""
    WITH m AS (
      SELECT doc_id AS i, doc_id % 8 AS grp,
             CAST(floor(doc_id / 8) AS BIGINT) % 3 AS v
      FROM documents WHERE doc_id < {_AU_DOCS}
    ),
    pairs AS (
      SELECT a.grp AS grp, a.i AS id_a, b.i AS id_b,
             CASE WHEN (a.v = 2) <> (b.v = 2) THEN 1 ELSE 0 END AS d
      FROM m a JOIN m b ON a.grp = b.grp AND a.i > b.i
    )
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(id_a + id_b) AS BIGINT) AS id_sum,
           CAST(sum(d) AS BIGINT) AS dist_sum
    FROM pairs GROUP BY grp
"""


@register("audio_phash_pairs", _AU_SQL)
def audio_phash_pairs(spark, sf_dir):
    """End-to-end audio near-dup: 240 planted FAKEMM audio streams
    (constant-window walks encode each target envelope hash exactly)
    through the real envelope-dHash mapInPandas pass and the
    hamming-banded pair join at max_distance=2. Same closed-form
    oracle as image_phash_pairs: pair membership + distances pinned."""
    from datacanary_spark.operators.media_hash import (
        audio_dhash, encode_hash_wave, phash_near_pairs,
    )
    from datacanary_spark.operators.multimodal import encode_fake_media

    ids = [int(r.doc_id) for r in
           _t(spark, sf_dir, "documents").where(F.col("doc_id") < _AU_DOCS)
           .select("doc_id").collect()]
    rows = []
    for i in sorted(ids):
        g, v = i % 8, (i // 8) % 3
        target = 0xFF << (8 * g)
        if v == 2:
            target ^= 1 << (8 * g + 3)
        rows.append((i, encode_fake_media("A", 0, 0, 1,
                                          encode_hash_wave(target))))
    media = spark.createDataFrame(rows, "media_id bigint, payload binary") \
                 .repartition(8)
    hashes = audio_dhash(media)
    pairs = phash_near_pairs(hashes, max_distance=2, bands=4)
    return (pairs.groupBy((F.col("id_a") % 8).alias("grp"))
                 .agg(F.count(F.lit(1)).alias("n_pairs"),
                      F.sum(F.col("id_a") + F.col("id_b")).alias("id_sum"),
                      F.sum("distance").alias("dist_sum")))
