"""Deterministic cache lifetimes for operators that persist internally.

Several operators (``lsh_candidate_pairs``, ``jaccard_for_pairs``,
``embedding_near_dup_pairs``, ``decontaminate``) persist an
intermediate frame because BOTH sides of a self-join read it — without
the cache the expensive upstream (MinHash signatures, hyperplane
projections, shingle sets) is recomputed per side. The returned frame
is lazy, so the operator itself has no safe unpersist point: with a
plain ``persist=True`` the MEMORY_AND_DISK blocks live until the caller
clears the cache, and a long-lived session invoking these repeatedly
accumulates cached frames.

``CacheScope`` closes that hole. It is accepted anywhere a ``persist``
flag is (it is truthy, so ``if persist:`` call sites keep working): the
operator routes its persist through the scope, and leaving the ``with``
block unpersists everything the scope tracked — including on error.

    with CacheScope() as scope:
        pairs = lsh_candidate_pairs(docs, persist=scope)
        pairs.write.parquet(out)          # materialize INSIDE the scope
    # all blocks released here

Scale note: unpersist is a driver-side metadata call (plus async block
eviction); the pattern costs nothing at 10^12 rows and bounds executor
storage memory to one pipeline stage's working set instead of the whole
session's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def release_local_checkpoint(df: DataFrame,
                             blocking: bool = False) -> None:
    """Free a ``localCheckpoint(eager=True)`` frame's blocks NOW.
    ``DataFrame.unpersist`` only talks to the SQL CacheManager and is a
    no-op for checkpoint persistence, so this reaches the LogicalRDD
    plan node's RDD directly. Best-effort: on any reflection surprise
    the blocks are left to the ContextCleaner. The frame is UNUSABLE
    afterwards — truncated lineage cannot recompute. The SINGLE copy of
    this py4j hack; operators/graph.py imports it too."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(blocking)
    except Exception:
        pass


class _LocalCheckpointHandle:
    """Adapter so a CacheScope can release a localCheckpoint frame
    (its ``unpersist_all`` calls ``.unpersist(blocking)`` on tracked
    items)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        release_local_checkpoint(self._df, blocking)


class CacheScope:
    """Tracks frames persisted through it; unpersists them on exit.

    Truthy (so it can be passed wherever a boolean ``persist`` flag is
    expected), reusable as a context manager, and idempotent:
    ``unpersist_all`` clears its list, so a manual call followed by the
    ``with``-exit is safe.
    """

    def __init__(self, storage_level: StorageLevel | None = None):
        self._level = storage_level or StorageLevel.MEMORY_AND_DISK
        self._frames: list[DataFrame] = []

    def persist(self, df: DataFrame,
                storage_level: StorageLevel | None = None) -> DataFrame:
        df = df.persist(storage_level or self._level)
        self._frames.append(df)
        return df

    def checkpoint(self, df: DataFrame) -> DataFrame:
        """Materialize ``df`` AND truncate its logical plan
        (``localCheckpoint(eager=True)``) — the stage-boundary form of
        ``persist`` for long compositions.

        A plain persist keeps the full analyzed plan, and in a
        many-stage pipeline each join-bearing stage embeds the
        upstream tree 2–3×, so the plan grows MULTIPLICATIVELY — the
        all-stages curate composition reached an 8M-char analyzed plan
        by its 8th stage and a >1 GiB plan string (driver OOM inside
        ``persist``) by its 15th. The checkpoint cuts the plan to a
        LogicalRDD scan, so stage N+1 plans against a flat scan
        whatever N is (same cure operators/graph.py applies per CC
        round). Blocks release on scope exit like any persisted frame.

        Tradeoff (document at call sites): truncated lineage cannot
        recompute — on executor loss the job fails and retries from
        its job-level checkpoint instead of regenerating blocks. For a
        curation batch that restart-level retry is the designed story
        (plans/checkpoint.py); do NOT use this for frames that must
        survive partial executor failure without a retry.
        """
        if self._level != StorageLevel.MEMORY_AND_DISK:
            # localCheckpoint takes no storage level in PySpark — a
            # scope constructed to bound storage (e.g. DISK_ONLY)
            # would silently get MEMORY_AND_DISK blocks here; refuse
            # rather than break the constructor's contract
            raise ValueError(
                "CacheScope.checkpoint only supports the default "
                "MEMORY_AND_DISK level (localCheckpoint accepts no "
                "storage level); use persist() on this scope instead")
        out = df.localCheckpoint(eager=True)
        self._frames.append(_LocalCheckpointHandle(out))
        return out

    def track(self, item) -> "object":
        """Register an ALREADY-persisted frame — or any object with an
        ``unpersist(blocking)`` method, e.g. graph._CheckpointHandle
        for localCheckpoint frames — for release on scope exit, without
        re-persisting it. For checkpointed frames note the stronger
        caveat: after release they cannot recompute (truncated
        lineage), so they are only usable inside the scope."""
        self._frames.append(item)
        return item

    def unpersist_all(self, blocking: bool = False) -> None:
        while self._frames:
            self._frames.pop().unpersist(blocking)

    def __bool__(self) -> bool:
        return True

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.unpersist_all()


def maybe_persist(df: DataFrame, persist,
                  storage_level: StorageLevel | None = None) -> DataFrame:
    """One call site for the tri-state persist contract:

    - ``False``/``None`` → no-op (caller manages caching);
    - ``True``           → plain ``df.persist`` (caller owns lifetime);
    - a ``CacheScope``   → persist through the scope (scope owns lifetime).
    """
    if not persist:
        return df
    if isinstance(persist, CacheScope):
        return persist.persist(df, storage_level)
    return df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
