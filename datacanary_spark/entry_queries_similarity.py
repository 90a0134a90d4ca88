"""Driver-contract queries: similarity search over the embeddings table.

Covers the ANN family: brute-force cosine top-k (exact baseline),
sign-random-projection LSH top-k (the bucketed scale path), and
embedding-cosine near-duplicate pairs over planted perturbed variants.
Oracle SQL mirrors the Spark arithmetic exactly: element-wise double
products with sequential accumulation (DuckDB ``list_dot_product`` ==
Spark ``aggregate(zip_with(...))``), scores rounded to 6 dp on both
sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _t, register
from datacanary_spark.operators import similarity as sim

DIM = 64

_COS = ("list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))")


@register(
    "knn_bruteforce_top5",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
      SELECT query_id, vec_id AS neighbor_id,
             {_COS.format(a='cv', b='qv')} AS s
      FROM c CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS INT) AS rank,
             s
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, round(s, 6) AS score
    FROM ranked WHERE rank <= 5
    """,
)
def knn_bruteforce_top5(spark, sf_dir):
    """Exact cosine top-5 for the first 5 vectors over the whole corpus."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.brute_force_topk(e, queries, k=5)


def _duck_bucket(vec: str, planes) -> str:
    terms = []
    for j, plane in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in plane)
        terms.append(f"CASE WHEN list_dot_product({vec}, [{lits}]) > 0 "
                     f"THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


_PLANES_T0 = sim.random_planes(DIM, 6, table=0)
_PLANES_T1 = sim.random_planes(DIM, 6, table=1)


@register(
    "ann_lsh_top5",
    f"""
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    cb AS (SELECT vec_id, cv, {_duck_bucket('cv', _PLANES_T0)} AS bucket FROM c),
    qb AS (SELECT query_id, qv, {_duck_bucket('qv', _PLANES_T0)} AS bucket FROM q),
    cand AS (
      SELECT query_id, vec_id AS neighbor_id,
             {_COS.format(a='cv', b='qv')} AS s
      FROM cb JOIN qb USING (bucket)
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS INT) AS rank,
             s
      FROM cand
    )
    SELECT query_id, neighbor_id, rank, round(s, 6) AS score
    FROM ranked WHERE rank <= 5
    """,
)
def ann_lsh_top5(spark, sf_dir):
    """LSH-bucketed approximate top-5 (6-bit sign random projection,
    one table): candidates restricted to the query's bucket."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.ann_topk(e, queries, dim=DIM, k=5, n_bits=6, n_tables=1)


_IVF_CENTROIDS = sim.ivf_centroids(DIM, 16)

_DUCK_CENTROIDS = " UNION ALL ".join(
    f"SELECT {j} AS j, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[] AS c"
    for j, c in enumerate(_IVF_CENTROIDS))


@register(
    "ann_ivf_top5",
    f"""
    WITH centroids AS ({_DUCK_CENTROIDS}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    c_assign AS (
      SELECT vec_id, cv, cell FROM (
        SELECT vec_id, cv, j AS cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY list_dot_product(cv, c) DESC, j) AS rn
        FROM c CROSS JOIN centroids) t WHERE rn = 1
    ),
    q_probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT query_id, qv, j AS cell,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY list_dot_product(qv, c) DESC, j) AS rn
        FROM q CROSS JOIN centroids) t WHERE rn <= 4
    ),
    cand AS (
      SELECT query_id, vec_id AS neighbor_id,
             {_COS.format(a='cv', b='qv')} AS s
      FROM c_assign JOIN q_probe USING (cell)
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS INT) AS rank,
             s
      FROM cand
    )
    SELECT query_id, neighbor_id, rank, round(s, 6) AS score
    FROM ranked WHERE rank <= 5
    """,
)
def ann_ivf_top5(spark, sf_dir):
    """IVF-flat approximate top-5 (16 deterministic unit centroids,
    4 probes): the second ANN scale path besides SRP-LSH — corpus
    bucketed by nearest centroid, one shuffle on the cell id. Ties in
    centroid assignment break to the smallest cell id on both engines."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.ivf_topk(e, queries, dim=DIM, k=5, n_centroids=16, n_probe=4)


_PQ_BOOKS = sim.pq_codebooks(DIM, n_sub=8, n_codes=16)

_DUCK_PQ_BOOKS = " UNION ALL ".join(
    f"SELECT {m} AS m, {j} AS j, "
    f"[{', '.join(repr(float(x)) for x in c)}]::DOUBLE[] AS c"
    for m in range(_PQ_BOOKS.shape[0])
    for j, c in enumerate(_PQ_BOOKS[m]))


@register(
    "ann_pq_top5",
    f"""
    WITH books AS ({_DUCK_PQ_BOOKS}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    enc AS (
      SELECT vec_id, m, c FROM (
        SELECT t.vec_id, b.m, b.c,
               row_number() OVER (PARTITION BY t.vec_id, b.m
                 ORDER BY list_dot_product(b.c, b.c)
                          - 2 * list_dot_product(
                              list_slice(t.cv, b.m*8 + 1, b.m*8 + 8), b.c),
                          b.j) AS rn
        FROM c t CROSS JOIN books b) s WHERE rn = 1
    ),
    recon AS (
      SELECT vec_id, flatten(list(c ORDER BY m)) AS rv
      FROM enc GROUP BY vec_id
    ),
    cand AS (
      SELECT query_id, vec_id AS neighbor_id,
             {_COS.format(a='rv', b='qv')} AS s
      FROM recon CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS INT) AS rank,
             s
      FROM cand
    )
    SELECT query_id, neighbor_id, rank, round(s, 6) AS score
    FROM ranked WHERE rank <= 5
    """,
)
def ann_pq_top5(spark, sf_dir):
    """Product-quantized approximate top-5 (8 subspaces x 16 codes over
    the 64-dim embeddings — a 16x at-rest compression of the corpus):
    the third ANN scale path, trading recall for MEMORY rather than for
    candidates.  Scoring is ADC in reconstruction form, so the oracle
    reproduces it as one sequential dot product per pair; code
    assignment ties break to the smallest code id on both engines, and
    the ||c||^2 plan literals come from the same sequential accumulation
    the oracle computes at runtime (similarity._seq_dot)."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.pq_topk(e, queries, dim=DIM, k=5, n_sub=8, n_codes=16)


@register(
    "ann_ivfpq_top5",
    f"""
    WITH centroids AS ({_DUCK_CENTROIDS}),
    books AS ({_DUCK_PQ_BOOKS}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, j AS cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY list_dot_product(cv, centroids.c) DESC, j) AS rn
        FROM c CROSS JOIN centroids) t WHERE rn = 1
    ),
    enc AS (
      SELECT vec_id, m, c FROM (
        SELECT t.vec_id, b.m, b.c,
               row_number() OVER (PARTITION BY t.vec_id, b.m
                 ORDER BY list_dot_product(b.c, b.c)
                          - 2 * list_dot_product(
                              list_slice(t.cv, b.m*8 + 1, b.m*8 + 8), b.c),
                          b.j) AS rn
        FROM c t CROSS JOIN books b) s WHERE rn = 1
    ),
    recon AS (
      SELECT enc.vec_id, a.cell, flatten(list(enc.c ORDER BY enc.m)) AS rv
      FROM enc JOIN c_assign a ON enc.vec_id = a.vec_id
      GROUP BY enc.vec_id, a.cell
    ),
    q_probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT query_id, qv, j AS cell,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY list_dot_product(qv, centroids.c) DESC, j) AS rn
        FROM q CROSS JOIN centroids) t WHERE rn <= 4
    ),
    cand AS (
      SELECT query_id, vec_id AS neighbor_id,
             {_COS.format(a='rv', b='qv')} AS s
      FROM recon JOIN q_probe USING (cell)
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS INT) AS rank,
             s
      FROM cand
    )
    SELECT query_id, neighbor_id, rank, round(s, 6) AS score
    FROM ranked WHERE rank <= 5
    """,
)
def ann_ivfpq_top5(spark, sf_dir):
    """IVFPQ composed top-5 (16 coarse cells x 4 probes for candidate
    pruning + 8x16 PQ codes for compressed ADC scoring — the FAISS
    IVFPQ layout, index row = (cell, codes)): candidate set is
    identical to ann_ivf_top5's cell equi-join, scores are
    ann_pq_top5's reconstruction dot — the oracle composes the same
    two CTE blocks and must agree exactly."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.ivf_pq_topk(e, queries, dim=DIM, k=5, n_centroids=16,
                           n_probe=4, n_sub=8, n_codes=16)


@register(
    "embedding_near_dup_pairs",
    f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 1000
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.1 + 0.01) AS v
      FROM embeddings WHERE vec_id % 7 = 0 AND vec_id < 1000
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS.format(a='a.v', b='b.v')}, 6) AS score
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE {_COS.format(a='a.v', b='b.v')} >= 0.9
    """,
)
def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dups: planted perturbed variants
    (v*1.1 + 0.01, cosine ≈ 0.995) must pair with their originals;
    the natural corpus has no pair above 0.52. Corpus capped at
    vec_id < 1000 — the exact-quadratic demo is test-scale by design
    (no-op at sf0.01's 500 rows); the scale path is use_lsh=True."""
    corpus = _planted_corpus(spark, sf_dir)
    return sim.embedding_near_dup_pairs(corpus, threshold=0.9)


def _planted_corpus(spark, sf_dir):
    """Embeddings capped at vec_id<1000 plus perturbed variants of every
    7th vector (v*1.1 + 0.01 — cosine ≈ 0.995 to its original)."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    base = e.select("vec_id",
                    F.transform(F.col("embedding"),
                                lambda x: x.cast("double")).alias("embedding"))
    aug = e.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"),
                    lambda x: x.cast("double") * 1.1 + 0.01).alias("embedding"))
    return base.unionByName(aug)


_DUCK_PLANTED_CORPUS = """
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 1000
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.1 + 0.01) AS v
      FROM embeddings WHERE vec_id % 7 = 0 AND vec_id < 1000
    )
"""


@register(
    "embedding_near_dup_lsh_pairs",
    f"""
    WITH {_DUCK_PLANTED_CORPUS},
    b AS (
      SELECT vec_id, v, 0 AS tbl, {_duck_bucket('v', _PLANES_T0)} AS bucket
      FROM corpus
      UNION ALL
      SELECT vec_id, v, 1 AS tbl, {_duck_bucket('v', _PLANES_T1)} AS bucket
      FROM corpus
    ),
    cand AS (
      SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
      FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
                       AND l.vec_id < r.vec_id
    )
    SELECT id_a, id_b, round({_COS.format(a='ca.v', b='cb.v')}, 6) AS score
    FROM cand
    JOIN corpus ca ON ca.vec_id = id_a
    JOIN corpus cb ON cb.vec_id = id_b
    WHERE {_COS.format(a='ca.v', b='cb.v')} >= 0.9
    """,
)
def embedding_near_dup_lsh_pairs(spark, sf_dir):
    """The SCALE path of embedding near-dup (use_lsh=True): candidate
    pairs must share a 6-bit SRP bucket in one of 2 tables, shrinking
    the join from n² to sum(bucket²) — one shuffle on (table, bucket).
    Same planted corpus as the exact variant; the result is the exact
    pair set intersected with LSH candidate recall, identically on both
    engines (plan-literal hyperplanes, same double arithmetic)."""
    corpus = _planted_corpus(spark, sf_dir)
    return sim.embedding_near_dup_pairs(
        corpus, threshold=0.9, dim=DIM, use_lsh=True, n_bits=6, n_tables=2)


_SD_CENTROIDS = sim.ivf_centroids(DIM, 8)

_DUCK_SD_CENTROIDS = " UNION ALL ".join(
    f"SELECT {j} AS j, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[] AS c"
    for j, c in enumerate(_SD_CENTROIDS))


@register(
    "semdedup_cell_stats",
    f"""
    WITH centroids AS ({_DUCK_SD_CENTROIDS}),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 1000
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.1 + 0.01) AS v
      FROM embeddings WHERE vec_id % 7 = 0 AND vec_id < 1000
    ),
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT vec_id, v, j AS cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY list_dot_product(v, c) DESC, j) AS rn
        FROM corpus CROSS JOIN centroids) t WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_COS.format(a='a.v', b='b.v')} >= 0.9
    )
    SELECT CAST(s.cell AS INT) AS cell,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
    GROUP BY s.cell
    """,
)
def semdedup_cell_stats(spark, sf_dir):
    """SemDeDup semantic dedup over the planted corpus: 8 deterministic
    unit centroids, within-cell cosine prune at 0.9 — every planted
    variant (cos ≈ 0.995 to its original, same argmax cell) must be
    dropped, natural corpus (max pairwise 0.52) kept. Per-cell member/
    dropped/kept counts; one shuffle on cell, pair cost sum(cell²)."""
    corpus = _planted_corpus(spark, sf_dir)
    r = sim.semdedup(corpus, dim=DIM, threshold=0.9, n_centroids=8)
    keep = F.col("semdedup_keep")
    return r.groupBy(F.col("cell").cast("int").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum((~keep).cast("int")).cast("long").alias("n_dropped"),
        F.sum(keep.cast("int")).cast("long").alias("n_kept"),
    )
