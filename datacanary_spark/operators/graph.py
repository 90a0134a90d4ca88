"""Distributed connected components over similarity edges.

Near-duplicate deduplication is transitive in practice: if A~B and B~C
the three documents are one cluster even when A~C falls below the
pairwise threshold (chains of perturbed copies are common in crawl
data). ``near_dup_pairs`` yields the EDGES; this module turns them
into CLUSTERS with the alternating large-star / small-star algorithm
(Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
Components in MapReduce and Beyond", SoCC 2014) — the shape used by
production MinHash-dedup pipelines, chosen over naive label
propagation because it converges in O(log^2 n) rounds independent of
component DIAMETER (a 10k-hop chain of crawl re-posts converges in ~14
rounds, not 10k).

Each round is two shuffles (a groupBy-min and the join back), all
JVM-side Column expressions — no UDFs. Every round is
``localCheckpoint``-ed: a plain persist keeps the full LOGICAL plan,
which doubles per round and overwhelms the planner within ~10
iterations (observed as a planner stack overflow); the checkpoint
truncates the plan to the materialized edge set, so round N+1 plans
against a flat scan. Superseded rounds drop their last reference and
Spark's ContextCleaner reclaims the blocks (each is only
O(edge-set) sized, and there are O(log n) rounds total); the returned
assignment is itself checkpointed so the caller never re-runs the
iteration.

At 10^12-doc scale the edge set is far smaller than the corpus (only
docs with a near-dup candidate appear), the per-round state is
O(edges), and convergence detection is a single count+checksum
aggregate per round — no driver-side edge materialization anywhere.

No counterpart exists in the reference (its dedup surface is
single-process pandas, `/root/reference/src/datacanary/analyser.py`);
this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "components_of_pairs",
           "cluster_survivors"]


def _canonical_edges(edges: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """(u, v) with u > v, null-free, self-loop-free, distinct."""
    u, v = F.col(id_a), F.col(id_b)
    return (edges
            .where(u.isNotNull() & v.isNotNull() & (u != v))
            .select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
            .distinct())


def _symmetric(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """For every node n: connect each STRICTLY LARGER neighbor to
    min(N(n) ∪ {n}). Output keeps the (larger, smaller) orientation."""
    sym = _symmetric(e)
    mins = (sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least(F.col("u"), F.col("_mn")).alias("_mn")))
    return (sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("_mn").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """For every node n over its SMALLER neighbors N: connect each
    member of N ∪ {n} (except the min itself) to min(N)."""
    directed = e.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("_mn"))
    to_min = (directed.join(mins, "u")
              .select(F.col("v").alias("u"), F.col("_mn").alias("v")))
    self_to_min = mins.select("u", F.col("_mn").alias("v"))
    return (to_min.unionByName(self_to_min)
            .where(F.col("u") != F.col("v"))
            .distinct())


def _signature(e: DataFrame) -> tuple[int, str]:
    """Order-independent edge-set fingerprint for convergence detection:
    (count, sum of xxhash64 over the canonical pair). decimal(38,0) sum
    — a bigint sum of 64-bit hashes overflows under ANSI mode."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.col("u"), F.col("v"))
              .cast("decimal(38,0)")).alias("h")).collect()[0]
    return int(row["n"]), str(row["h"]) if row["h"] is not None else "0"


# Single-sourced from plans/caching.py (one copy of the py4j
# LogicalRDD release hack to keep in sync with Spark versions);
# the local names are kept for this module's call sites.
from datacanary_spark.plans.caching import (  # noqa: E402
    _LocalCheckpointHandle as _CheckpointHandle,
    release_local_checkpoint as _release_local_checkpoint,
)


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", *,
                         max_iterations: int = 50,
                         scope=None) -> DataFrame:
    """Component assignment for every node appearing in ``edges``.

    Returns ``(id, component)`` — one row per distinct node, where
    ``component`` is the MINIMUM node id reachable from it (a stable,
    partition-order-independent representative; min-id is what makes
    dedup survivor selection deterministic on a cluster). Node ids may
    be any orderable type (the min is Spark's ordering for that type);
    both columns come back in the input id type.

    Rounds alternate large-star and small-star; convergence is reached
    when a round's edge set equals the previous round's (checked by
    count + order-independent checksum — two aggregates, no
    driver-side edge collection). The converged graph is a forest of
    depth-1 stars, so the edge list IS the assignment.

    ``max_iterations`` is a diverged-input backstop (the algorithm
    provably converges in O(log^2 n) rounds); hitting it raises rather
    than returning a partial clustering.

    Block lifetimes: each round's checkpoint is explicitly unpersisted
    once the next round's is materialized (eager), so peak storage is
    TWO rounds of edges, not the whole iteration history. The RETURNED
    frame's checkpoint must outlive the call; pass a ``CacheScope`` as
    ``scope`` to release it deterministically on scope exit — with the
    caveat that a localCheckpoint CANNOT recompute after release
    (lineage is truncated), so the result, like everything derived
    from it, is only usable inside the scope.
    """
    spark = edges.sparkSession
    id_type = edges.schema[id_a].dataType.simpleString()
    empty = spark.createDataFrame(
        [], f"id {id_type}, component {id_type}")

    # Lazy checkpoints (r06): each round's ``_signature`` aggregate is a
    # full-coverage action, so it both MATERIALIZES the checkpoint and
    # returns the convergence fingerprint in ONE Spark job — the eager
    # form ran a separate count() job per round (2 jobs/round → 1), and
    # the old standalone ``isEmpty`` probe is subsumed by the first
    # signature's count. Plan truncation is unchanged: localCheckpoint
    # builds the LogicalRDD at call time regardless of eagerness.
    cur = _canonical_edges(edges, id_a, id_b).localCheckpoint(eager=False)
    prev_sig = _signature(cur)
    if prev_sig[0] == 0:
        _release_local_checkpoint(cur)
        return empty
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        sig = _signature(nxt)
        # nxt is now materialized; last round's blocks can free
        _release_local_checkpoint(cur)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in "
            f"{max_iterations} rounds — this exceeds the provable "
            f"O(log^2 n) bound and indicates nondeterministic input "
            f"(e.g. edges recomputed differently per scan)")
    # Converged: every edge is (child, root). Children point at their
    # root; roots get a self-assignment row. Checkpointed so no caller
    # action ever re-runs the iteration.
    children = cur.select(F.col("u").alias("id"),
                          F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("id"),
                       F.col("v").alias("component")).distinct()
    out = children.unionByName(roots).localCheckpoint(eager=True)
    _release_local_checkpoint(cur)
    if scope is not None:
        scope.track(_CheckpointHandle(out))
    return out


def components_of_pairs(df: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id",
                        max_iterations: int = 50,
                        scope=None) -> DataFrame:
    """``df`` with a ``component`` column: the min reachable id through
    ``pairs`` (columns ``id_a``/``id_b``), or the row's own id when it
    has no similarity edge (singleton cluster).

    The survivor rule ``component == id`` then keeps exactly one doc
    per transitive near-dup cluster — including every edge-free doc —
    which is the standard cluster-level dedup on top of
    :func:`~datacanary_spark.operators.dedup.near_dup_pairs`.
    """
    asg = connected_components(pairs, max_iterations=max_iterations,
                               scope=scope)
    asg = asg.select(F.col("id").alias(id_col),
                     F.col("component").alias("_comp"))
    return (df.join(asg, on=id_col, how="left")
            .withColumn("component",
                        F.coalesce(F.col("_comp"), F.col(id_col)))
            .drop("_comp"))


def cluster_survivors(df: DataFrame, pairs: DataFrame, rank_col: Column,
                      id_col: str = "doc_id",
                      max_iterations: int = 50,
                      persist=True) -> DataFrame:
    """``df`` with ``component`` and ``is_survivor`` columns: within
    each transitive near-dup cluster exactly one row survives — the one
    maximizing ``rank_col``, ties broken by smallest id. Edge-free docs
    are singleton clusters and always survive.

    This is the "keep the best copy" cluster dedup production corpora
    run after MinHash (rank by a trained quality-classifier score, a
    heuristic quality score, or plain document length); ``rank_col``
    is any deterministic NUMERIC, NON-NULL Column over ``df``'s rows
    (coalesce upstream — a NULL rank would sort as best). Ids may be
    any orderable type (numeric doc ids, url strings).

    The pick is an aggregate ``min(struct(-rank, id))`` per component
    (min of negated rank = max rank, then the lexicographic tie-break
    lands on the smallest id) — never a per-component window — so a
    mega-cluster (boilerplate mirrored across millions of pages, the
    skew case at crawl scale) costs a partial-aggregate merge instead
    of sorting the whole cluster in one task.

    Both the pick aggregate and the output read the corpus-assignment
    join, so it is pinned via ``persist`` (bool or a CacheScope —
    same lifetime contract as ``dedup.lsh_candidate_pairs``: with
    ``True`` the blocks live until the caller unpersists); pass
    ``persist=False`` only if recomputing that join twice is cheaper
    than caching it.
    """
    from datacanary_spark.plans.caching import CacheScope, maybe_persist

    # a CacheScope persist also adopts the component iteration's final
    # localCheckpoint, so the whole clustering releases on scope exit
    cc_scope = persist if isinstance(persist, CacheScope) else None
    withc = maybe_persist(
        components_of_pairs(df, pairs, id_col=id_col,
                            max_iterations=max_iterations,
                            scope=cc_scope), persist)
    pick = (withc.groupBy("component")
            .agg(F.min(F.struct((-rank_col).alias("neg_r"),
                                F.col(id_col).alias("id")))
                 .alias("_best"))
            .select("component",
                    F.col("_best.id").alias("_survivor_id")))
    return (withc.join(pick, on="component", how="left")
            .withColumn("is_survivor",
                        F.col(id_col) == F.col("_survivor_id"))
            .drop("_survivor_id"))
