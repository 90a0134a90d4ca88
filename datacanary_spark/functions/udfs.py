"""Arrow-batched pandas UDFs wrapping the quality models + scrubber.

Broadcast lifecycle (SURVEY.md §7 hard-part 7): the driver broadcasts the
pickled ``QualityModels`` ONCE; each Python worker deserializes it ONCE
(module-level cache keyed by broadcast id) and reuses it across every
Arrow batch. No per-batch or per-row deserialization, no model download.

Why pandas UDFs and not Column expressions: langid/perplexity need
numpy gather/reduce over hashed n-gram tables — genuinely inexpressible
as built-in Spark expressions — and scrubbing must run Python ``re`` for
byte-identity with the reference labels. Everything else in the pipeline
stays JVM-side.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Per-worker model cache. KEYING MATTERS: the Broadcast object itself is
# re-unpickled into a NEW Python object for every task, so id(bc) would
# miss every time and re-deserialize the multi-MB model bundle per task.
# bc.value, however, is served from pyspark's per-process broadcast
# registry — the SAME bytes object across tasks in a reused worker — so
# id(bc.value) is a stable per-process key. The entry stores a STRONG
# reference to the blob alongside the model: id() values can be recycled
# after an object is GC'd (e.g. a destroyed broadcast), and pinning the
# blob guarantees its id is never reused while the cache entry is alive —
# a stale-model hit is impossible. The cache is BOUNDED (FIFO, a few
# entries): pinning every blob ever broadcast would leak multi-MB
# bundles in long-lived workers that see many jobs/restarts; more than
# one entry is kept so two model bundles alternating within one job
# don't thrash.
_MODEL_CACHE: dict[int, tuple[Any, Any]] = {}
_MODEL_CACHE_MAX = 4


def _get_models(bc) -> Any:
    blob = bc.value
    key = id(blob)
    entry = _MODEL_CACHE.get(key)
    if entry is not None and entry[0] is blob:
        return entry[1]
    from datacanary_spark.functions.models import QualityModels

    m = blob if isinstance(blob, QualityModels) else QualityModels.from_bytes(blob)
    while len(_MODEL_CACHE) >= _MODEL_CACHE_MAX:
        _MODEL_CACHE.pop(next(iter(_MODEL_CACHE)))
    _MODEL_CACHE[key] = (blob, m)
    return m


LANGID_RESULT = T.StructType([
    T.StructField("lang_pred", T.StringType()),
    T.StructField("lang_conf", T.DoubleType()),
])

SCRUB_RESULT = T.StructType([
    T.StructField("scrubbed_text", T.StringType()),
    T.StructField("scrub_count", T.IntegerType()),
])


def make_langid_udf(models_bc):
    @pandas_udf(LANGID_RESULT)
    def langid(texts: pd.Series) -> pd.DataFrame:
        m = _get_models(models_bc)
        lang, conf = m.langid.predict(texts)
        return pd.DataFrame({"lang_pred": lang, "lang_conf": conf})

    return langid


def make_ppl_udf(models_bc):
    @pandas_udf(T.DoubleType())
    def perplexity(texts: pd.Series) -> pd.Series:
        m = _get_models(models_bc)
        return pd.Series(m.perplexity.score(texts), index=texts.index)

    return perplexity


def make_scrub_udf():
    @pandas_udf(SCRUB_RESULT)
    def scrub(texts: pd.Series) -> pd.DataFrame:
        from datacanary_spark.functions.scrub import scrub_series

        scrubbed, counts = scrub_series(texts)
        return pd.DataFrame({"scrubbed_text": scrubbed,
                             "scrub_count": counts.astype("int32")})

    return scrub


def make_mad_udaf():
    """Median-absolute-deviation as a grouped-agg pandas UDF — the UDAF
    surface (SURVEY §2.6): per-group numpy reduction over one Arrow
    batch stream, no Python per row. MAD is the robust dispersion stat
    the reference's z-score outlier rule lacks (its stddev is
    outlier-inflated by construction — trend_detection.py:51-60);
    genuinely inexpressible as a built-in Spark aggregate (nested
    medians).

    Scale: grouped-agg pandas UDFs buffer ONE GROUP per invocation —
    fine for bounded groups (languages, hosts); for unbounded groups use
    :func:`mad_approx` (two-pass approx_percentile composition, bounded
    sketch state per group).
    """
    import numpy as np

    @pandas_udf(T.DoubleType())
    def mad(values: pd.Series) -> float:
        v = values.dropna().to_numpy(dtype="float64")
        if v.size == 0:
            return None
        return float(np.median(np.abs(v - np.median(v))))

    return mad


def mad_approx(df, value_col: str, group_cols: list[str],
               accuracy: int = 10000, out_col: str = "mad"):
    """Median-absolute-deviation with BOUNDED state — the 10^12-row
    companion to :func:`make_mad_udaf` (which buffers one whole group
    per invocation and is therefore only safe for bounded groups).

    Two passes, each a Greenwald-Khanna ``percentile_approx`` sketch of
    O(accuracy) state per group regardless of group size:

    1. per-group approximate median of ``value_col``;
    2. join the medians back on the group key (same hash partitioning —
       on a cluster the exchange is reused) and sketch the median of
       ``abs(value - median)``.

    Rank error is bounded by 1/accuracy per pass; both sketches return
    an actual data value (no interpolation), so for groups smaller than
    ``accuracy`` each median is exact up to the discrete/interpolated
    median difference on even-sized groups. Agreement with the exact
    UDAF is pinned by a tolerance test at fixture scale.

    Plan shape: two shuffles on the group key and one join — no pandas
    UDF, no per-group buffering, fully whole-stage-codegen eligible.
    """
    med = df.groupBy(*group_cols).agg(
        F.percentile_approx(value_col, 0.5, accuracy).alias("_med")) \
        .select(*[F.col(g).alias(f"_g{i}") for i, g in enumerate(group_cols)],
                "_med")
    # null-SAFE join: groupBy emits a row for the NULL group, and the
    # exact UDAF twin (make_mad_udaf) reports a MAD for it — an equality
    # join here would silently drop every null-keyed row (same fix as
    # cap_per_group / approx_quantile_buckets).
    cond = None
    for i, g in enumerate(group_cols):
        c = F.col(g).eqNullSafe(F.col(f"_g{i}"))
        cond = c if cond is None else (cond & c)
    dev = F.abs(F.col(value_col).cast("double") - F.col("_med").cast("double"))
    return (df.join(med, cond)
              .groupBy(*group_cols)
              .agg(F.percentile_approx(dev, 0.5, accuracy).alias(out_col)))


def make_extract_udf():
    """html(binary) → text. The fixture wraps text as
    ``<html><body>…</body></html>``; extraction strips exactly that
    wrapper (byte-identity contract: extracted == original text per url).
    A real-world extractor (trafilatura-style) would slot in here; the
    Spark-side plumbing (binary in, string out, Arrow batches) is what
    this engine owns.
    """

    @pandas_udf(T.StringType())
    def extract(html: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            s = bytes(b)
            if s.startswith(b"<html><body>") and s.endswith(b"</body></html>"):
                s = s[len(b"<html><body>"):-len(b"</body></html>")]
            return s.decode("utf-8", errors="replace")

        return html.map(one)

    return extract
