"""Deterministic synthetic Common-Crawl-style pages generator.

Schema per the build contract: ``url:string, warc_ts:timestamp,
html:binary, text:string, lang:string``.

Modeled after the reference's demo-data generator idea — a seeded table
with injected quality defects (/root/reference/src/examples/
create_sample_data.py:8-57 injects nulls, imbalance, duplicate dates,
empty strings, outliers) — generalized to per-document web-text defects:
too-short/too-long docs, symbol spam, low stopword fraction, n-gram
repetition, gibberish (non-language), boilerplate/bullet/ellipsis lines,
and PII / toxicity strings (scrub targets, not drop targets).

Determinism: every document is generated from
``np.random.default_rng((seed, doc_id))`` so any chunk of ids can be
generated independently and identically — this is what makes the
Spark-distributed generator (``pages_spark_df``) produce byte-identical
docs to the local pandas generator regardless of partitioning, and what
makes 10^12-doc generation embarrassingly parallel.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

LANGS = ["en", "fr", "es", "de", "zh"]
LANG_WEIGHTS = [0.50, 0.15, 0.15, 0.10, 0.10]

# Real high-frequency function words per language: these make language-ID
# learnable and drive the stopword-fraction heuristic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
           "on", "are", "as", "with", "his", "they", "at", "be", "this", "have"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "dans", "est", "que",
           "pour", "qui", "sur", "pas", "par", "plus", "avec", "son", "nous", "vous"],
    "es": ["el", "la", "los", "de", "y", "en", "que", "por", "con", "una",
           "para", "del", "se", "las", "como", "mas", "pero", "sus", "esta", "ser"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "sich",
           "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine", "als", "auch"],
    # Synthetic space-separated CJK "words" keep tokenization uniform.
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "就",
           "不", "人", "都", "一", "为", "上", "个", "中", "到", "说"],
}

# Per-language syllable inventories for deterministic content-word pools.
_SYLLABLES: dict[str, list[str]] = {
    "en": ["ing", "tion", "ment", "er", "ly", "con", "pre", "sta", "ver", "al",
           "ter", "ous", "ble", "ist", "ish", "ward", "ness", "ful", "dom", "ade"],
    "fr": ["eau", "eur", "tion", "ment", "age", "ille", "oux", "ais", "ons", "ez",
           "ique", "elle", "oir", "ance", "ette", "isme", "eux", "ain", "ier", "ure"],
    "es": ["cion", "dad", "ero", "ista", "oso", "ura", "ita", "anza", "encia", "miento",
           "illo", "ada", "ente", "able", "orio", "ivo", "eza", "ario", "uelo", "azgo"],
    "de": ["ung", "heit", "keit", "schaft", "lich", "isch", "chen", "lein", "nis", "tum",
           "bar", "sam", "haft", "werk", "zeug", "stein", "berg", "feld", "wald", "hof"],
    "zh": [],  # CJK pool built from a codepoint range instead
}

TOXIC_LEXICON = ["gorram", "frak", "smeg", "feldercarb", "frell", "dren"]

_BOILERPLATE_LINES = [
    "- click here to subscribe to our newsletter",
    "- terms of service apply see details",
    "- cookie policy accept all cookies now",
    "read more about this story here ...",
    "sign up for free and save more ...",
]

N_HOSTS = 1000
_HOT_HOSTS = 5  # Zipf head — drives skew-handling tests

EPOCH = _dt.datetime(2023, 1, 1, 0, 0, 0)


def _content_pool(lang: str, size: int = 400) -> list[str]:
    """Deterministic per-language content-word pool (no RNG needed)."""
    if lang == "zh":
        base = 0x4E50
        return ["".join(chr(base + (i * 7 + j * 131) % 2000) for j in range(2))
                for i in range(size)]
    syl = _SYLLABLES[lang]
    onsets = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t", "v", "z",
              "br", "cl", "dr", "fl", "gr", "pl"]
    vowels = ["a", "e", "i", "o", "u"]
    pool = []
    i = 0
    while len(pool) < size:
        w = (onsets[i % len(onsets)] + vowels[(i // 3) % 5]
             + syl[(i * 13 + 7) % len(syl)])
        if (i * 31 + lang.encode()[0]) % 3 == 0:
            w += syl[(i * 17 + 3) % len(syl)]
        pool.append(w)
        i += 1
    return pool


_POOLS = {lang: _content_pool(lang) for lang in LANGS}

# Defect codes, assigned mutually exclusively per doc.
DEFECTS = ["clean", "too_short", "too_long", "symbol_spam", "low_stopword",
           "repetition", "gibberish", "boilerplate"]
_DEFECT_P = [0.72, 0.06, 0.02, 0.05, 0.05, 0.04, 0.03, 0.03]


def _sample_words(rng: np.random.Generator, lang: str, n: int,
                  stopword_rate: float = 0.40) -> list[str]:
    pool = _POOLS[lang]
    stops = STOPWORDS[lang]
    is_stop = rng.random(n) < stopword_rate
    stop_ix = rng.integers(0, len(stops), n)
    cont_ix = rng.integers(0, len(pool), n)
    return [stops[stop_ix[i]] if is_stop[i] else pool[cont_ix[i]] for i in range(n)]


def _gibberish_words(rng: np.random.Generator, n: int) -> list[str]:
    cons = "bcdfghjklmnpqrstvwxz"
    lens = rng.integers(9, 16, n)
    out = []
    for ln in lens:
        ix = rng.integers(0, len(cons), ln)
        out.append("".join(cons[j] for j in ix))
    return out


def _insert_lines(rng: np.random.Generator, words: list[str]) -> str:
    """Join words into lines of ~10-18 words."""
    lines, i = [], 0
    while i < len(words):
        ln = int(rng.integers(10, 19))
        lines.append(" ".join(words[i:i + ln]))
        i += ln
    return "\n".join(lines)


def make_doc(doc_id: int, seed: int = 42) -> dict:
    """Generate one page deterministically from (seed, doc_id)."""
    rng = np.random.default_rng((seed, doc_id))
    lang = LANGS[rng.choice(len(LANGS), p=LANG_WEIGHTS)]
    defect = DEFECTS[rng.choice(len(DEFECTS), p=_DEFECT_P)]

    n_words = int(rng.integers(60, 400))
    if defect == "too_short":
        n_words = int(rng.integers(5, 40))
    elif defect == "too_long":
        n_words = int(rng.integers(1100, 1500))

    if defect == "gibberish":
        words = _gibberish_words(rng, n_words)
    elif defect == "low_stopword":
        words = _sample_words(rng, lang, n_words, stopword_rate=0.0)
    else:
        words = _sample_words(rng, lang, n_words)

    if defect == "symbol_spam":
        n_sym = max(1, n_words // 5)
        pos = rng.integers(0, len(words), n_sym)
        syms = rng.integers(0, 8, n_sym)
        sym_chars = "#$%&*+=~"
        for p, s in zip(pos, syms):
            words[p] = words[p] + sym_chars[s] + sym_chars[(s + 3) % 8]
    elif defect == "repetition":
        gram = words[:3] if len(words) >= 3 else words
        reps = max(4, n_words // 6)
        at = int(rng.integers(0, max(1, len(words) - 3)))
        words = words[:at] + list(gram) * reps + words[at:]

    text = _insert_lines(rng, words)

    if defect == "boilerplate":
        bp = [_BOILERPLATE_LINES[int(i)] for i in rng.integers(0, len(_BOILERPLATE_LINES), 6)]
        lines = text.split("\n")
        text = "\n".join(bp[:3] + lines + bp[3:])

    # PII / toxicity injection — scrub targets, orthogonal to drop defects.
    if rng.random() < 0.15:
        pii = []
        if rng.random() < 0.7:
            pii.append(f"user{int(rng.integers(0, 10**4))}@mail{int(rng.integers(0, 100))}.com")
        if rng.random() < 0.5:
            pii.append(f"{int(rng.integers(200, 999))}-{int(rng.integers(100, 999))}-{int(rng.integers(1000, 9999))}")
        if rng.random() < 0.3:
            pii.append(f"{int(rng.integers(100, 899))}-{int(rng.integers(10, 99))}-{int(rng.integers(1000, 9999))}")
        if rng.random() < 0.3:
            pii.append(".".join(str(int(x)) for x in rng.integers(1, 255, 4)))
        text = text + "\ncontact " + " or ".join(pii)
    if rng.random() < 0.05:
        tox = [TOXIC_LEXICON[int(i)] for i in rng.integers(0, len(TOXIC_LEXICON), 2)]
        text = text + "\nthis is " + " and ".join(tox)

    # Zipf-skewed host pool: a handful of hot hosts carry ~half the docs.
    if rng.random() < 0.5:
        host_ix = int(rng.integers(0, _HOT_HOSTS))
    else:
        host_ix = int(rng.integers(_HOT_HOSTS, N_HOSTS))
    url = f"https://host{host_ix}.example.com/page/{doc_id}"
    warc_ts = EPOCH + _dt.timedelta(minutes=int(doc_id))
    html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
    return {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}


def generate_pages_pandas(n_docs: int, seed: int = 42, start_id: int = 0) -> pd.DataFrame:
    """Generate [start_id, start_id+n_docs) pages as a pandas DataFrame."""
    rows = [make_doc(i, seed) for i in range(start_id, start_id + n_docs)]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


def pages_spark_df(spark, n_docs: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed generation: mapInPandas over an id range.

    Because each doc derives from (seed, doc_id) only, the output is
    identical to the local generator for any partitioning — at cluster
    scale this generates N docs with zero shuffle and zero driver data.
    """
    from pyspark.sql import functions as F

    from datacanary_spark.schema import PAGES_SCHEMA

    num_partitions = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    ids = spark.range(0, n_docs, 1, num_partitions)
    ids = ids.withColumn("seed", F.lit(seed))

    def gen(batches):
        for pdf in batches:
            for s in pdf["seed"].unique():
                chunk = pdf[pdf["seed"] == s]
                out = pd.DataFrame([make_doc(int(i), int(s)) for i in chunk["id"]],
                                   columns=["url", "warc_ts", "html", "text", "lang"])
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
                yield out

    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)


def docs_as_pages(docs_df):
    """Reshape the testdata ``documents`` table into the PAGES_SCHEMA
    contract (url, warc_ts, html, text, lang).

    THE single definition of the documents→pages reshape shared by
    bench.py's ``filter_pipeline_full`` timing and the entry-query
    twin — if the contract shape changes, the benchmark keeps timing
    the shipped pipeline, not a stale copy."""
    from pyspark.sql import functions as F

    return docs_df.select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"), F.col("lang"))


def write_pages_parquet(path: str, n_docs: int, seed: int = 42,
                        chunk_size: int = 20_000, start_id: int = 0,
                        file_prefix: str = "part") -> None:
    """Write pages to a local parquet directory in bounded-memory chunks.

    ``start_id``/``file_prefix`` let callers land successive batches into
    the SAME directory without clobbering earlier files (streaming-ingest
    simulation: each call is one "crawl drop").
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(start_id, start_id + n_docs, chunk_size):
        n = min(chunk_size, start_id + n_docs - start)
        pdf = generate_pages_pandas(n, seed, start_id=start)
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        # Spark cannot read TIMESTAMP(NANOS) parquet — coerce to micros.
        pq.write_table(
            table,
            os.path.join(path, f"{file_prefix}-{start_id:08d}-{part:05d}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True)
        part += 1


def write_pages_jsonl(path: str, n_docs: int, seed: int = 42,
                      files: int = 2, gzip_files: bool = True,
                      start_id: int = 0) -> None:
    """Write the same seeded pages as JSONL dump files (the published-
    corpus wire format `sources/io.read_pages_jsonl` ingests): one JSON
    object per line — ``warc_ts`` ISO-8601, ``html`` base64 (JSON has
    no binary) — gzip per file when ``gzip_files``. Deterministic twin
    of ``write_pages_parquet`` for format-parity tests."""
    import base64
    import gzip as _gzip
    import json as _json
    import os as _os

    _os.makedirs(path, exist_ok=True)
    pdf = generate_pages_pandas(n_docs, seed=seed, start_id=start_id)
    per = (len(pdf) + files - 1) // files
    for fx in range(files):
        chunk = pdf.iloc[fx * per:(fx + 1) * per]
        lines = []
        for r in chunk.itertuples(index=False):
            lines.append(_json.dumps({
                "url": r.url,
                "warc_ts": r.warc_ts.isoformat(),
                "html": (base64.b64encode(bytes(r.html)).decode("ascii")
                         if r.html is not None else None),
                "text": r.text,
                "lang": r.lang,
            }, ensure_ascii=False))
        blob = ("\n".join(lines) + "\n").encode("utf-8")
        if gzip_files:
            with open(_os.path.join(path, f"part-{fx:04d}.jsonl.gz"),
                      "wb") as f:
                f.write(_gzip.compress(blob))
        else:
            with open(_os.path.join(path, f"part-{fx:04d}.jsonl"),
                      "wb") as f:
                f.write(blob)
