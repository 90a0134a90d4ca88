"""Driver-contract queries: host-scoped boilerplate removal
(operators/boilerplate.py) and PII detection geometry
(functions/scrub.py's patterns, counted relationally).

Registered into datacanary_spark.entry_queries.{QUERIES,ORACLE_SQL}.
The documents table carries neither hosts, shared template lines, nor
PII, so — like ``c4_line_dedup`` and ``url_canonical_groups`` — both
queries PLANT deterministic variants identically on the Spark and
DuckDB sides. The boilerplate plant (host = doc_id % 10, so a host's
doc_ids share their last digit) exercises every branch of the
template predicate: a nav line in 100% of the host's docs; a cookie
banner on even doc_ids and a promo line on odd ones (host determines
doc parity, so each is 100% of its hosts' docs and absent from the
rest); a social footer on doc_id % 20 < 10 (~50% of every host's
docs — above min_frac, template); a survey ad on doc_id % 40 < 10
(~25% of every host's docs — enough distinct docs to pass min_docs
but BELOW min_frac=0.4, so the fraction test alone must reject it);
and a per-doc widget line (fails min_docs). The PII plant appends
per-doc emails / phones / SSNs / IPs on fixed doc_id residues.

The PII query is the oracle-checked half of the scrub surface: the
REGEXES are shared verbatim with ``functions/scrub.py`` (whose
byte-identical replacement behavior is golden-tested — Python ``re``
can't run in SQL, but the detection geometry can: Java regex, RE2 and
Python ``re`` agree on these ASCII character-class patterns, which this
query pins continuously).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _t, _ts, register
from datacanary_spark.functions.scrub import SCRUB_PATTERNS
from datacanary_spark.operators import boilerplate as bp
from datacanary_spark.operators import text_analysis as ta

# ---------------------------------------------------------------------------
# Boilerplate: plant per-host template lines, detect, strip, account
# ---------------------------------------------------------------------------

_MIN_DOCS, _MIN_FRAC = 2, 0.4


def _planted(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    host = F.concat(F.lit("h"), F.col("doc_id") % 10)
    # conditional lines yield NULL when absent — concat_ws skips a NULL
    # element AND its separator, matching the SQL twin's
    # CASE ... THEN chr(10) || line ELSE '' END form
    text = F.concat_ws(
        "\n",
        F.concat(F.lit("NAV MENU FOR "), host),
        F.col("text"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit("COOKIE BANNER "), host))
         .otherwise(F.lit("Promo of the day")),
        F.when(F.col("doc_id") % 20 < 10,
               F.concat(F.lit("SOCIAL FOOTER "), host)),
        F.when(F.col("doc_id") % 40 < 10,
               F.concat(F.lit("SURVEY AD "), host)),
        F.concat(F.lit("WIDGET "), F.col("doc_id")))
    return d.select("doc_id", host.alias("host"), text.alias("text"))


@register(
    "boilerplate_strip_by_host",
    f"""
    WITH d AS (
      SELECT doc_id, 'h' || (doc_id % 10) AS host,
             'NAV MENU FOR h' || (doc_id % 10) || chr(10) || text || chr(10)
             || CASE WHEN doc_id % 2 = 0
                     THEN 'COOKIE BANNER h' || (doc_id % 10)
                     ELSE 'Promo of the day' END
             || CASE WHEN doc_id % 20 < 10
                     THEN chr(10) || 'SOCIAL FOOTER h' || (doc_id % 10)
                     ELSE '' END
             || CASE WHEN doc_id % 40 < 10
                     THEN chr(10) || 'SURVEY AD h' || (doc_id % 10)
                     ELSE '' END
             || chr(10) || 'WIDGET ' || doc_id AS text
      FROM documents WHERE text IS NOT NULL
    ),
    lines AS (
      SELECT doc_id, host, ln, trim(ln) AS lnt
      FROM (SELECT doc_id, host, unnest(string_split(text, chr(10))) AS ln
            FROM d)
    ),
    hd AS (SELECT host, count(*) AS host_docs FROM d GROUP BY 1),
    per_line AS (
      SELECT host, md5(lnt) AS k, count(DISTINCT doc_id) AS nd
      FROM lines WHERE lnt <> '' GROUP BY 1, 2
    ),
    bl AS (
      SELECT p.host, p.k, p.nd
      FROM per_line p JOIN hd USING (host)
      WHERE p.nd >= {_MIN_DOCS}
        AND CAST(p.nd AS DOUBLE) / host_docs >= {_MIN_FRAC}
    ),
    marked AS (
      SELECT l.doc_id, l.host, l.ln,
             (b.k IS NULL) AS keep
      FROM lines l
      LEFT JOIN bl b ON b.host = l.host AND l.lnt <> '' AND b.k = md5(l.lnt)
    ),
    per_doc AS (
      SELECT doc_id, host,
             sum(length(ln)) + count(*) - 1 AS orig_len,
             coalesce(sum(length(ln)) FILTER (WHERE keep), 0)
               + greatest(count(*) FILTER (WHERE keep) - 1, 0) AS new_len
      FROM marked GROUP BY 1, 2
    )
    SELECT h.host, h.host_docs,
           CAST(coalesce(c.n_boiler_lines, 0) AS BIGINT) AS n_boiler_lines,
           CAST(coalesce(c.max_line_docs, 0) AS BIGINT) AS max_line_docs,
           CAST(sum(p.orig_len - p.new_len) AS BIGINT) AS chars_removed
    FROM hd h
    JOIN per_doc p USING (host)
    LEFT JOIN (SELECT host, count(*) AS n_boiler_lines, max(nd) AS max_line_docs
               FROM bl GROUP BY 1) c USING (host)
    GROUP BY 1, 2, 3, 4
    """,
)
def boilerplate_strip_by_host(spark, sf_dir):
    """Detect each synthetic host's template lines (nav 100% of host
    docs, banner/promo 100% of even/odd hosts, social footer ~50%;
    the ~25% survey ad has min_docs distinct docs but sits below
    min_frac so the FRACTION test alone must reject it, and the
    per-doc WIDGET line fails min_docs), strip them, and account per
    host: template-line count, widest line, and characters removed by
    the rewrite. Exercises both halves of the operator (detection
    table + order-preserving text rebuild) under the oracle; the strip
    REUSES the detection table (``templates=``) so the corpus pays one
    detection aggregation, not two."""
    from datacanary_spark.plans.caching import CacheScope

    planted = _planted(spark, sf_dir)
    # CacheScope (r06): the detection table feeds BOTH the per-host
    # counts and the strip join — unpersisted, the full explode +
    # count_distinct detection aggregation ran twice per execution.
    # The result is one row per host, so materialize in-scope and
    # return it as a local frame.
    with CacheScope() as scope:
        b = scope.persist(bp.boilerplate_lines(
            planted, min_docs=_MIN_DOCS, min_frac=_MIN_FRAC))
        counts = b.groupBy("host").agg(
            F.count(F.lit(1)).alias("n_boiler_lines"),
            F.max("n_docs_with_line").alias("max_line_docs"))
        stripped = bp.strip_boilerplate(planted, templates=b) \
            .select("doc_id", F.col("text").alias("_st"))
        removed = (planted.join(stripped, "doc_id")
                   .groupBy("host")
                   .agg(F.count(F.lit(1)).alias("host_docs"),
                        F.sum(F.length("text") - F.length("_st"))
                         .alias("chars_removed")))
        from datacanary_spark.entry_queries import _local_result

        return _local_result(
            spark,
            removed.join(counts, "host", "left")
            .select("host", "host_docs",
                    F.coalesce("n_boiler_lines", F.lit(0)).cast("long")
                     .alias("n_boiler_lines"),
                    F.coalesce("max_line_docs", F.lit(0)).cast("long")
                     .alias("max_line_docs"),
                    "chars_removed"),
            "host string, host_docs bigint, n_boiler_lines bigint, "
            "max_line_docs bigint, chars_removed bigint")


# ---------------------------------------------------------------------------
# PII detection geometry (shared regexes with functions/scrub.py)
# ---------------------------------------------------------------------------

_PATS = {name: pat.pattern for name, pat, _ in SCRUB_PATTERNS
         if name in ("email", "phone", "ssn", "ip")}
_P_EMAIL, _P_PHONE, _P_SSN, _P_IP = (
    _PATS["email"], _PATS["phone"], _PATS["ssn"], _PATS["ip"])


def _pii_planted_expr():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" Contact user"), (did % 50).cast("string"),
        F.lit("@mail"), (did % 7).cast("string"), F.lit(".com"),
        F.when(did % 3 == 0,
               F.concat(F.lit(" call 555-867-"),
                        F.lpad((did % 10000).cast("string"), 4, "0")))
         .otherwise(F.lit("")),
        F.when(did % 5 == 0,
               F.concat(F.lit(" ssn 123-45-"),
                        F.lpad((did % 10000).cast("string"), 4, "0")))
         .otherwise(F.lit("")),
        F.when(did % 7 == 0,
               F.concat(F.lit(" from 192.168."),
                        (did % 256).cast("string"), F.lit("."),
                        (did % 254 + 1).cast("string")))
         .otherwise(F.lit("")))


@register(
    "pii_hits_by_lang",
    f"""
    WITH d AS (
      SELECT lang,
             text || ' Contact user' || (doc_id % 50) || '@mail'
                  || (doc_id % 7) || '.com'
                  || CASE WHEN doc_id % 3 = 0 THEN ' call 555-867-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END
                  || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END
                  || CASE WHEN doc_id % 7 = 0 THEN ' from 192.168.'
                            || (doc_id % 256) || '.' || (doc_id % 254 + 1)
                          ELSE '' END AS text
      FROM documents WHERE text IS NOT NULL
    ),
    hits AS (
      SELECT lang,
             len(regexp_extract_all(text, '{_P_EMAIL}')) AS emails,
             len(regexp_extract_all(text, '{_P_PHONE}')) AS phones,
             len(regexp_extract_all(text, '{_P_SSN}')) AS ssns,
             len(regexp_extract_all(text, '{_P_IP}')) AS ips
      FROM d
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(emails) AS BIGINT) AS emails,
           CAST(sum(phones) AS BIGINT) AS phones,
           CAST(sum(ssns) AS BIGINT) AS ssns,
           CAST(sum(ips) AS BIGINT) AS ips,
           CAST(sum(CASE WHEN emails + phones + ssns + ips > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
    FROM hits GROUP BY lang
    """,
)
def pii_hits_by_lang(spark, sf_dir):
    """Count scrub-pattern hits per language over deterministically
    planted PII. ``regexp_count`` stays JVM-side (no UDF) — the scale
    path for detection-only passes (the byte-rewriting scrub itself is
    the golden-tested pandas UDF; its patterns and this query's are the
    same objects)."""
    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = _pii_planted_expr()
    hits = d.select(
        "lang",
        F.regexp_count(t, F.lit(_P_EMAIL)).alias("emails"),
        F.regexp_count(t, F.lit(_P_PHONE)).alias("phones"),
        F.regexp_count(t, F.lit(_P_SSN)).alias("ssns"),
        F.regexp_count(t, F.lit(_P_IP)).alias("ips"))
    total = F.col("emails") + F.col("phones") + F.col("ssns") + F.col("ips")
    return hits.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("emails").alias("emails"),
        F.sum("phones").alias("phones"),
        F.sum("ssns").alias("ssns"),
        F.sum("ips").alias("ips"),
        F.sum(F.when(total > 0, 1).otherwise(0)).cast("long")
         .alias("docs_with_pii"))


# ---------------------------------------------------------------------------
# Character entropy + encoding noise (text_analysis.char_entropy_expr)
# ---------------------------------------------------------------------------

_P_CTRL = ta.CONTROL_CHAR_PATTERN
_LN2 = repr(ta.LN2)


def _noise_planted_expr():
    # plant a BEL control char on doc_id % 6 == 0 and U+FFFD on
    # doc_id % 9 == 0 — the corpus itself carries no encoding damage
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(did % 6 == 0, F.lit("\x07")).otherwise(F.lit("")),
        F.when(did % 9 == 0, F.lit("�")).otherwise(F.lit("")))


@register(
    "char_entropy_noise_by_lang",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             text || CASE WHEN doc_id % 6 = 0 THEN chr(7) ELSE '' END
                  || CASE WHEN doc_id % 9 = 0 THEN chr(65533) ELSE '' END
               AS text
      FROM documents WHERE text IS NOT NULL
    ),
    cc AS (
      SELECT doc_id, lang, ch, count(*) AS c
      FROM (SELECT doc_id, lang,
                   unnest(regexp_split_to_array(text, '')) AS ch
            FROM d)
      WHERE ch <> '' GROUP BY 1, 2, 3
    ),
    ent AS (
      SELECT doc_id, (ln(CAST(sum(c) AS DOUBLE))
                      - sum(c * ln(CAST(c AS DOUBLE)))
                        / CAST(sum(c) AS DOUBLE)) / {_LN2} AS ent
      FROM cc GROUP BY 1
    ),
    noise AS (
      SELECT doc_id, lang,
             CASE WHEN length(text) > 0
                  THEN CAST(len(regexp_extract_all(text, '{_P_CTRL}'))
                            AS DOUBLE) / length(text) END AS cf,
             CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS repl
      FROM d
    )
    SELECT n.lang, count(*) AS n_docs,
           round(avg(e.ent), 4) AS mean_entropy_bits,
           round(avg(n.cf), 6) AS mean_ctrl_frac,
           CAST(sum(n.repl) AS BIGINT) AS docs_with_replacement
    FROM noise n LEFT JOIN ent e USING (doc_id)
    GROUP BY 1
    """,
)
def char_entropy_noise_by_lang(spark, sf_dir):
    """Per-language character-entropy and encoding-noise profile over
    deterministically planted damage: mean Shannon entropy (bits) of
    each doc's char distribution, mean control-char fraction, and how
    many docs carry a U+FFFD replacement char. The entropy is a
    ZERO-SHUFFLE doc-side fold (sorted char array + one F.aggregate),
    so the whole query is one scan + one group-by — the shape that
    survives 10^12 docs."""
    d = _ts(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = _noise_planted_expr()
    per = d.select(
        "lang",
        ta.char_entropy_expr(t).alias("ent"),
        ta.control_char_frac_expr(t).alias("cf"),
        F.when(t.contains("�"), 1).otherwise(0).alias("repl"))
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.bround(F.avg("ent"), 4).alias("mean_entropy_bits"),
        F.bround(F.avg("cf"), 6).alias("mean_ctrl_frac"),
        F.sum("repl").cast("long").alias("docs_with_replacement"))


# ---------------------------------------------------------------------------
# URL-structure features: formula-built urls -> parse_url feature rollup
# ---------------------------------------------------------------------------

_UF_DOCS = 400

_UF_SQL = f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(doc_id % 4) AS BIGINT) AS sum_depth,
           CAST(sum(doc_id % 3) AS BIGINT) AS sum_params,
           CAST(sum(2 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS sum_host_labels,
           CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_index,
           round(avg(CASE WHEN doc_id % 4 = 0 THEN 0.0
                          ELSE CAST(doc_id % 4 AS DOUBLE)
                               / (3 * (doc_id % 4)) END), 6)
               AS avg_digit_frac
    FROM documents WHERE doc_id < {_UF_DOCS} GROUP BY lang
"""


@register("url_features_by_lang", _UF_SQL)
def url_features_by_lang(spark, sf_dir):
    """URL-structure prior end-to-end (text_analysis.url_features):
    each doc gets a formula url — ``www.`` on every 5th host, depth
    ``id % 4`` with one digit per 3-char segment, ``id % 3`` query
    params, root path when depth is 0 — and the REAL parse_url-based
    feature expressions compute depth / param count / host labels /
    path digit fraction / index-page flag from the string. The oracle
    replays the construction arithmetic, so a parse, split, or
    null-handling bug in the feature expressions is a value mismatch.
    Expression-only; the only Exchange is the lang rollup.
    """
    from datacanary_spark.operators.text_analysis import url_features

    d = (_t(spark, sf_dir, "documents")
         .where(F.col("doc_id") < _UF_DOCS).select("doc_id", "lang"))
    i = F.col("doc_id")

    def seg(k: int):
        return F.when(i % 4 >= k,
                      F.concat(F.lit("/d"), ((i + k) % 10).cast("string"))) \
                .otherwise(F.lit(""))

    host = F.concat(
        F.when(i % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("h"), (i % 17).cast("string"), F.lit(".example"))
    path = F.when(i % 4 == 0, F.lit("/")) \
            .otherwise(F.concat(seg(1), seg(2), seg(3)))
    query = F.when(i % 3 == 0, F.lit("")) \
             .when(i % 3 == 1, F.lit("?a0=1")) \
             .otherwise(F.lit("?a0=1&a1=1"))
    url = F.concat(F.lit("https://"), host, path, query)
    feats = url_features(d.select("lang", url.alias("url")))
    return (feats.groupBy("lang")
                 .agg(F.count(F.lit(1)).alias("n_urls"),
                      F.sum(F.col("path_depth").cast("long"))
                       .alias("sum_depth"),
                      F.sum(F.col("n_params").cast("long"))
                       .alias("sum_params"),
                      F.sum(F.col("n_host_labels").cast("long"))
                       .alias("sum_host_labels"),
                      F.sum(F.col("is_index").cast("long")).alias("n_index"),
                      F.bround(F.avg("digit_frac"), 6)
                       .alias("avg_digit_frac")))


# ---------------------------------------------------------------------------
# URL-pattern blocklist (path/query component of UT1-style lists; the
# domain component is blocklist_survivors_by_lang). The plant covers
# every branch: /tag/ path hits, .zip suffix hits, sessionid query
# hits, NULL urls (exempt — never blocked), and clean article urls.
# ---------------------------------------------------------------------------

_URL_BLOCK_PATTERNS = ["/tag/", r"\.zip$", "[?&]sessionid="]

_UPB_SQL = r"""
    WITH raw AS (
      SELECT doc_id, lang,
        CASE WHEN doc_id % 7 = 0
               THEN 'https://h' || (doc_id % 9) || '.com/tag/' || doc_id
             WHEN doc_id % 7 = 1
               THEN 'https://h' || (doc_id % 9) || '.com/dl/f' || doc_id
                    || '.zip'
             WHEN doc_id % 7 = 2
               THEN 'https://h' || (doc_id % 9) || '.com/p?sessionid='
                    || doc_id
             WHEN doc_id % 7 = 3 THEN NULL
             ELSE 'https://h' || (doc_id % 9) || '.com/article/' || doc_id
        END AS url
      FROM documents WHERE doc_id < 350
    ),
    b AS (
      SELECT doc_id, lang,
             coalesce(regexp_matches(
               url, '(?:/tag/)|(?:\.zip$)|(?:[?&]sessionid=)'),
               FALSE) AS blocked
      FROM raw
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked,
           CAST(sum(CASE WHEN NOT blocked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN NOT blocked THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_id_sum
    FROM b GROUP BY lang
"""


@register("url_pattern_block_by_lang", _UPB_SQL)
def url_pattern_block_by_lang(spark, sf_dir):
    """URL-pattern blocklist geometry: planted urls hit each pattern
    class (/tag/ path, .zip suffix, sessionid param) or none; NULL
    urls are exempt. kept_id_sum pins exactly WHICH docs survive
    text_analysis.url_pattern_blocked_expr — the expression
    filter_blocked_url_patterns applies (pure column expression, no
    joins/shuffles: the filter pipelines with the scan)."""
    i = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").where(i < 350)
    h = F.concat(F.lit("https://h"), (i % 9).cast("string"), F.lit(".com"))
    s = i.cast("string")
    url = (F.when(i % 7 == 0, F.concat(h, F.lit("/tag/"), s))
            .when(i % 7 == 1, F.concat(h, F.lit("/dl/f"), s, F.lit(".zip")))
            .when(i % 7 == 2, F.concat(h, F.lit("/p?sessionid="), s))
            .when(i % 7 == 3, F.lit(None).cast("string"))
            .otherwise(F.concat(h, F.lit("/article/"), s)))
    blocked = ta.url_pattern_blocked_expr(_URL_BLOCK_PATTERNS, url)
    kept = (~blocked).cast("long")
    return (d.select("lang", "doc_id", blocked.alias("blocked"), kept.alias("k"))
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.col("blocked").cast("long")).alias("n_blocked"),
                  F.sum("k").alias("n_kept"),
                  F.sum(F.col("k") * F.col("doc_id")).alias("kept_id_sum")))


# ---------------------------------------------------------------------------
# robots.txt crawl policy (operators/robots.py): plant per-host robots
# files + page urls, run the real RFC 9309 parser + longest-match
# filter, account per language. The oracle computes the verdict in
# closed form from the plant formula (robots parsing is not SQL), so a
# parser/precedence bug surfaces as a membership mismatch:
#   host  = floor(doc_id/10) % 9  -> site{h}.example; host 8 serves NO
#           robots.txt (allow-all branch)
#   path  = /p{doc_id%5}/page{doc_id}
#   rules (identical * group on hosts 0..7; a canarybot Disallow-/
#   group that MUST be ignored for agent *):
#     Disallow: /p1/        -> m==1 dropped ...
#     Allow:    /p1/page2   -> ... unless id starts with '2' (plen 9>4)
#     Disallow: /*3$        -> ids ending in 3 dropped (wildcard+anchor;
#                              note id%10==3 => id%5==3, disjoint from
#                              the /p1/ and /p2/ branches)
#     Disallow: /p2/ + Allow: /p2/ -> equal plen 4: Allow wins the tie,
#                              m==2 always kept
# ---------------------------------------------------------------------------

_ROBOTS_DOCS = 500

_ROBOTS_TXT = ("# crawl policy for site{h}.example\r\n"
               "User-agent: canarybot\r\n"
               "Disallow: /\r\n"
               "\r\n"
               "User-agent: *\r\n"
               "Disallow: /p1/\r\n"
               "Allow: /p1/page2\r\n"
               "Disallow: /*3$\r\n"
               "Disallow: /p2/\r\n"
               "Allow: /p2/\r\n"
               "Sitemap: https://site{h}.example/sitemap.xml\r\n")

_ROBOTS_SQL = f"""
    WITH raw AS (
      SELECT doc_id, lang,
             CAST(floor(doc_id / 10) AS BIGINT) % 9 AS h,
             doc_id % 5 AS m,
             CAST(doc_id AS VARCHAR) AS ids
      FROM documents WHERE doc_id < {_ROBOTS_DOCS}
    ),
    verdict AS (
      SELECT doc_id, lang,
             CASE WHEN h = 8 THEN TRUE
                  WHEN m = 1 THEN (ids LIKE '2%')
                  WHEN m = 2 THEN TRUE
                  WHEN ids LIKE '%3' THEN FALSE
                  ELSE TRUE END AS keep
      FROM raw
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_id_sum
    FROM verdict GROUP BY lang
"""


@register("robots_policy_by_lang", _ROBOTS_SQL)
def robots_policy_by_lang(spark, sf_dir):
    """RFC 9309 robots.txt enforcement end-to-end: 8 planted robots
    files (CRLF, comments, a specific-agent group that must be ignored
    for *, wildcard, $ anchor, longest-match override, allow-tie) are
    compiled by the real parser (operators/robots.py pandas UDF over
    the host-count table) and enforced on 500 planted page urls via
    the broadcast rules join + expression-only longest-match.
    kept_id_sum pins exact keep/drop membership per doc."""
    from datacanary_spark.operators.robots import robots_filter

    i = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").where(i < _ROBOTS_DOCS)
    url = F.concat(
        F.lit("https://site"),
        (F.floor(i / 10) % 9).cast("string"),
        F.lit(".example/p"), (i % 5).cast("string"),
        F.lit("/page"), i.cast("string"))
    pages = d.select("doc_id", "lang", url.alias("url"))
    robots = spark.createDataFrame(
        [(f"site{h}.example", _ROBOTS_TXT.replace("{h}", str(h)))
         for h in range(8)],
        "host string, robots_txt string")
    out = robots_filter(pages, robots, agent="*", keep_col="_keep")
    k = F.col("_keep").cast("long")
    return (out.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum(k).alias("n_kept"),
                    F.sum(k * F.col("doc_id")).alias("kept_id_sum")))


# ---------------------------------------------------------------------------
# Luhn card-checksum validation (text_analysis.luhn_valid_expr)
# ---------------------------------------------------------------------------


@register(
    "ccard_luhn_by_lang",
    """
    WITH c AS (
      SELECT lang, doc_id,
             '4' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 14, '0')
                 || CAST(doc_id % 10 AS VARCHAR) AS d
      FROM documents
    ),
    v AS (
      SELECT lang, doc_id,
             (list_sum(list_transform(range(1, length(d) + 1), i ->
                CASE WHEN i % 2 = 0 THEN
                  CASE WHEN CAST(substring(reverse(d), i, 1) AS INT) >= 5
                       THEN CAST(substring(reverse(d), i, 1) AS INT) * 2 - 9
                       ELSE CAST(substring(reverse(d), i, 1) AS INT) * 2
                  END
                ELSE CAST(substring(reverse(d), i, 1) AS INT)
                END)) % 10 = 0) AS ok
      FROM c
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(CASE WHEN ok THEN doc_id ELSE 0 END) AS BIGINT)
               AS sum_valid_ids
    FROM v GROUP BY lang
    """,
)
def ccard_luhn_by_lang(spark, sf_dir):
    """Luhn checksum fold over deterministically constructed 16-digit
    card-shaped strings (issuer '4' + zero-padded doc_id + trailing
    digit — validity falls out of the checksum itself, ~10% of rows).
    sum_valid_ids pins EXACT membership, so a doubling-rule, overflow,
    position-parity, or direction bug cannot cancel. Pure fold
    expression, pipelined with the scan — the detection-only scale
    path; the byte-rewriting scrub twin (card_scrub_entry) is pinned
    against this law by tests."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    card = F.concat(F.lit("4"),
                    F.lpad((i % 1000000).cast("string"), 14, "0"),
                    (i % 10).cast("string"))
    ok = ta.luhn_valid_expr(card)
    return (d.select("lang", "doc_id", ok.alias("ok"))
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.col("ok").cast("int")).cast("long")
                   .alias("n_valid"),
                  F.sum(F.when(F.col("ok"), i).otherwise(F.lit(0)))
                   .cast("long").alias("sum_valid_ids")))
