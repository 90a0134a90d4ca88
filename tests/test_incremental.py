"""Batch-incremental dedup store (plans/incremental.py).

The two load-bearing properties:

1. SPLIT INVARIANCE — ingesting the corpus in K id-ordered batches
   produces exactly the accepted set of a single full-batch ingest.
2. RULE FIDELITY — the accepted set equals an independent pure-Python
   simulation of the documented precedence rule computed from the same
   signatures (so the Spark joins implement the rule, not something
   that merely agrees on this corpus by luck).

Plus the operational contract: idempotent re-ingest, crash resume
(data dirs written but meta not committed), parameter/ordering guards,
and the null/empty-text exemptions.
"""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from datacanary_spark.plans.incremental import SignatureStore

N_HASHES = 16
BANDS = 4
THRESHOLD = 0.5
K_SHINGLE = 5


def _words(seed: str, n: int) -> str:
    out = []
    h = seed
    for _ in range(n):
        h = hashlib.md5(h.encode()).hexdigest()
        out.append(h[:6])
    return " ".join(out)


@pytest.fixture(scope="module")
def corpus(spark):
    """60 docs: near-dup families (shared prefix + small suffixes),
    exact dups, unrelated docs, one null and two empty texts."""
    rows = []
    doc_id = 0
    for fam in range(6):
        base = _words(f"fam{fam}", 60)
        for v in range(4):  # 4 variants per family: high mutual overlap
            suffix = _words(f"fam{fam}v{v}", 4)
            rows.append((doc_id, base + " " + suffix))
            doc_id += 1
    for u in range(24):  # unrelated singletons
        rows.append((doc_id, _words(f"solo{u}", 50)))
        doc_id += 1
    rows.append((doc_id, rows[3][1])); doc_id += 1      # exact dup
    rows.append((doc_id, rows[30][1])); doc_id += 1     # exact dup
    rows.append((doc_id, None)); doc_id += 1            # null text
    rows.append((doc_id, "")); doc_id += 1              # empty text
    rows.append((doc_id, "")); doc_id += 1              # empty dup
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _ingest_split(spark, corpus, root, splits):
    store = SignatureStore.create(
        spark, root, k_shingle=K_SHINGLE, n_hashes=N_HASHES,
        bands=BANDS, threshold=THRESHOLD)
    accepted = []
    for b, (lo, hi) in enumerate(splits):
        batch = corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        acc = store.ingest(batch, b)
        accepted += [r.doc_id for r in acc.select("doc_id").collect()]
    return store, sorted(accepted)


def test_incremental_equals_full_batch(spark, corpus, tmp_path):
    n = corpus.count()
    _, acc_full = _ingest_split(spark, corpus, str(tmp_path / "full"),
                                [(0, n)])
    _, acc_inc = _ingest_split(spark, corpus, str(tmp_path / "inc"),
                               [(0, 10), (10, 37), (37, n)])
    assert acc_inc == acc_full
    # dedup really happened: exact dups + near-dup family variants gone
    assert len(acc_full) < n - 4


def test_accepted_matches_python_rule_simulation(spark, corpus, tmp_path):
    store, acc = _ingest_split(spark, corpus, str(tmp_path / "sim"),
                               [(0, 20), (20, 65)])
    # independent simulation from the STORED signatures (all exact
    # survivors, accepted or not) applying the documented rule in id
    # order: drop on seen content hash; else drop if any PRECEDING
    # banded doc shares a band and est >= threshold.
    sigs = {r.doc_id: list(r.sig)
            for r in store.signatures().collect()}
    docs = {r.doc_id: r.text for r in corpus.collect()}
    rows_per_band = N_HASHES // BANDS

    def bands_of(sig):
        return {(b, "|".join(sig[b * rows_per_band:(b + 1) * rows_per_band]))
                for b in range(BANDS)}

    seen_hashes: set[str] = set()
    prev_banded: list[int] = []
    expected = []
    for did in sorted(docs):
        text = docs[did]
        if text is not None:
            h = hashlib.md5(text.encode()).hexdigest()
            if h in seen_hashes:
                continue
            seen_hashes.add(h)
        if did not in sigs:          # null/empty: no similarity identity
            expected.append(did)
            continue
        sig, bset = sigs[did], bands_of(sigs[did])
        hit = False
        for p in prev_banded:
            if bset & bands_of(sigs[p]):
                est = sum(a == b for a, b in zip(sig, sigs[p])) / N_HASHES
                if est >= THRESHOLD:
                    hit = True
                    break
        prev_banded.append(did)      # dropped docs still block later ones
        if not hit:
            expected.append(did)
    assert acc == sorted(expected)


def test_null_and_empty_text_rules(spark, corpus, tmp_path):
    n = corpus.count()
    _, acc = _ingest_split(spark, corpus, str(tmp_path / "nulls"), [(0, n)])
    null_id, first_empty, second_empty = n - 3, n - 2, n - 1
    assert null_id in acc            # null text: exempt from both tiers
    assert first_empty in acc        # empty: no shingles -> near-dup exempt
    assert second_empty not in acc   # but exact-duplicate of first empty


def test_reingest_committed_batch_is_idempotent(spark, corpus, tmp_path):
    root = str(tmp_path / "idem")
    store, _ = _ingest_split(spark, corpus, root, [(0, 30), (30, 65)])
    batch0 = corpus.where(F.col("doc_id") < 30)
    again = store.ingest(batch0, 0)
    reopened = SignatureStore.open(spark, root)
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == \
        sorted(r.doc_id for r in reopened.accepted_ids()
               .where(F.col("_batch") == 0).select("doc_id").collect())
    assert reopened.committed_batches() == [0, 1]


def test_crash_before_commit_then_retry(spark, corpus, tmp_path):
    root = str(tmp_path / "crash")
    n = corpus.count()
    store = SignatureStore.create(
        spark, root, k_shingle=K_SHINGLE, n_hashes=N_HASHES,
        bands=BANDS, threshold=THRESHOLD)
    batch0 = corpus.where(F.col("doc_id") < 40)
    store.ingest(batch0, 0)

    # simulate a crash DURING batch 1: data dirs written, meta not updated
    from datacanary_spark.plans.caching import CacheScope

    batch1 = corpus.where(F.col("doc_id") >= 40)
    scope = CacheScope()
    try:
        crashed = store._ingest_uncached(batch1, 1, "doc_id", "text", scope)
        crashed_ids = sorted(r.doc_id
                             for r in crashed.select("doc_id").collect())
    finally:
        scope.unpersist_all()
    meta = json.loads((tmp_path / "crash" / "meta.json").read_text())
    assert meta["committed"] == [0]  # batch 1 really is uncommitted

    # retry through a fresh handle: overwrites orphans, commits, and the
    # result matches what the crashed attempt would have produced
    retried = SignatureStore.open(spark, root).ingest(batch1, 1)
    assert sorted(r.doc_id for r in retried.select("doc_id").collect()) \
        == crashed_ids
    assert SignatureStore.open(spark, root).committed_batches() == [0, 1]


def test_guards(spark, corpus, tmp_path):
    root = str(tmp_path / "guards")
    store = SignatureStore.create(spark, root, threshold=THRESHOLD)
    store.ingest(corpus.where(F.col("doc_id") < 10), 5)
    with pytest.raises(ValueError, match="precedence is batch order"):
        store.ingest(corpus.where(F.col("doc_id") >= 10), 3)
    with pytest.raises(ValueError, match="pinned"):
        store.ingest(
            corpus.select(F.col("doc_id").cast("string").alias("doc_id"),
                          "text"), 6)
    with pytest.raises(ValueError, match="already exists"):
        SignatureStore.create(spark, root)
    with pytest.raises(ValueError, match="bands must divide"):
        SignatureStore.create(spark, str(tmp_path / "g2"), n_hashes=16,
                              bands=5)


def test_bucketed_band_table_same_result_and_no_store_exchange(
        spark, corpus, tmp_path):
    """bucket_bands mode: identical accepted sets, and the store side of
    the candidate join is read pre-distributed (one fewer Exchange than
    the derive-from-sigs path on the same join)."""
    n = corpus.count()
    _, acc_plain = _ingest_split(spark, corpus, str(tmp_path / "plain"),
                                 [(0, 30), (30, n)])
    root = str(tmp_path / "bucketed")
    store = SignatureStore.create(
        spark, root, k_shingle=K_SHINGLE, n_hashes=N_HASHES,
        bands=BANDS, threshold=THRESHOLD, bucket_bands=4)
    try:
        accepted = []
        for b, (lo, hi) in enumerate([(0, 30), (30, n)]):
            batch = corpus.where((F.col("doc_id") >= lo)
                                 & (F.col("doc_id") < hi))
            acc = store.ingest(batch, b)
            accepted += [r.doc_id for r in acc.select("doc_id").collect()]
        assert sorted(accepted) == acc_plain

        # reopen from disk in the same session: table rediscovered
        reopened = SignatureStore.open(spark, root)
        bands_bucketed = reopened.store_band_rows()
        assert bands_bucketed.count() > 0

        # plan lock: joining fresh (non-bucketed) rows against the store
        # bands shuffles ONLY the fresh side in bucketed mode
        from datacanary_spark.operators.dedup import band_rows_from_sig

        def n_exchanges(df):
            return df._jdf.queryExecution().executedPlan() \
                .toString().count("Exchange hashpartitioning")

        # force SMJ: a broadcast join would shuffle NEITHER side and the
        # bucketed distribution would be invisible to the plan compare
        # (DataFrames must be BUILT under the conf — queryExecution is
        # cached per frame)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = band_rows_from_sig(reopened.signatures().limit(5),
                                       "doc_id", "sig", N_HASHES, BANDS) \
                .withColumnRenamed("doc_id", "probe_id")
            joined_bucketed = probe.join(reopened.store_band_rows(),
                                         ["band_ix", "band_key"])
            derived = band_rows_from_sig(reopened.signatures(), "doc_id",
                                         "sig", N_HASHES, BANDS)
            joined_derived = probe.join(derived, ["band_ix", "band_key"])
            assert joined_bucketed.count() > 0
            assert n_exchanges(joined_bucketed) == \
                n_exchanges(joined_derived) - 1
            plan = joined_bucketed._jdf.queryExecution().executedPlan() \
                .toString()
            assert "Bucketed: true" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # compaction rebuilds the bucketed table from consolidated sigs
        # as a NEW generation: same row count (no retry duplicates
        # here), still EXTERNAL at the store root (an overwrite-in-place
        # rebuild silently relocated it into the session warehouse —
        # caught in review), old generation dropped
        n_before = reopened.store_band_rows().count()
        stats = reopened.compact()
        assert stats["compacted"]
        after = SignatureStore.open(spark, root)
        assert after._bands_gen() == 1
        assert after.store_band_rows().count() == n_before
        desc = {r.col_name: r.data_type for r in spark.sql(
            f"DESCRIBE FORMATTED {after._bands_table()}").collect()}
        assert desc.get("Type") == "EXTERNAL"
        assert desc.get("Location", "").rstrip("/").endswith("bands_g1")
        assert not spark.catalog.tableExists(after._bands_table(0))
        assert sorted(accepted) == sorted(
            r.doc_id for r in after.accepted_ids()
            .select("doc_id").collect())
    finally:
        for g in (0, 1):
            spark.sql(f"DROP TABLE IF EXISTS {store._bands_table(g)}")


def test_id_col_name_pinned(spark, corpus, tmp_path):
    store = SignatureStore.create(spark, str(tmp_path / "idcol"),
                                  threshold=THRESHOLD)
    store.ingest(corpus.where(F.col("doc_id") < 10), 0)
    renamed = corpus.where(F.col("doc_id") >= 10) \
        .withColumnRenamed("doc_id", "url")
    with pytest.raises(ValueError, match="pinned"):
        store.ingest(renamed, 1, id_col="url")


def test_compact_preserves_results_and_consolidates(spark, corpus, tmp_path):
    """compact() shrinks the identity dirs to one and changes NOTHING
    observable: a post-compaction ingest matches the same ingest into an
    uncompacted twin, and old-batch resume still replays."""
    import os

    n = corpus.count()
    splits = [(0, 15), (15, 30), (30, 50)]
    root_a = str(tmp_path / "compacted")
    root_b = str(tmp_path / "plain")
    store_a, _ = _ingest_split(spark, corpus, root_a, splits)
    store_b, _ = _ingest_split(spark, corpus, root_b, splits)

    stats = store_a.compact()
    assert stats["compacted"] and stats["dirs_before"] == 3
    assert sorted(os.listdir(tmp_path / "compacted" / "sigs")) == \
        ["compacted=1"]
    # identity content survives consolidation exactly
    assert stats["n_hashes"] == store_b.exact_hashes().count()
    assert stats["n_sigs"] == store_b.signatures().count()

    # a fourth batch dedups identically against both stores
    batch3 = corpus.where(F.col("doc_id") >= 50)
    acc_a = sorted(r.doc_id for r in
                   SignatureStore.open(spark, root_a)
                   .ingest(batch3, 3).select("doc_id").collect())
    acc_b = sorted(r.doc_id for r in store_b.ingest(batch3, 3)
                   .select("doc_id").collect())
    assert acc_a == acc_b

    # resume of a pre-compaction batch still replays from accepted/
    replay = SignatureStore.open(spark, root_a).ingest(
        corpus.where((F.col("doc_id") >= 15) & (F.col("doc_id") < 30)), 1)
    assert replay.count() > 0

    # compacting the compacted store is a no-op... after batch 3 there
    # are two dirs again; a second compact consolidates to compacted=2
    stats2 = SignatureStore.open(spark, root_a).compact()
    assert stats2["compacted"] and stats2["dirs_before"] == 2
    s = SignatureStore.open(spark, root_a)
    assert s._data_dirs() == ["compacted=2"]
    assert s.compact() == {"compacted": False, "dirs_before": 1}


def test_committed_batch_replay_with_different_docs_raises(
        spark, corpus, tmp_path):
    """A committed batch id replayed with DIFFERENT documents must fail
    loudly — the silent path would discard the new docs (lost streaming
    checkpoint / manual-vs-stream batch-counter collision)."""
    store = SignatureStore.create(spark, str(tmp_path / "fp"),
                                  threshold=THRESHOLD)
    b0 = corpus.where(F.col("doc_id") < 20)
    store.ingest(b0, 0)
    # identical composition: fine (the idempotent-resume contract)
    assert store.ingest(b0, 0).count() > 0
    with pytest.raises(ValueError, match="DIFFERENT composition"):
        store.ingest(corpus.where(F.col("doc_id") >= 20), 0)


def test_stream_setup_on_empty_input(spark, tmp_path):
    import os

    from datacanary_spark.streaming.ingest_stream import run_ingest_stream

    empty = str(tmp_path / "empty_in")
    os.makedirs(empty)
    store_root = str(tmp_path / "estore")
    # no store yet: must NOT create one from an empty setup run
    with pytest.raises(ValueError, match="not creating a store"):
        run_ingest_stream(spark, empty, store_root,
                          str(tmp_path / "eout"), str(tmp_path / "eckpt"))
    assert not os.path.exists(f"{store_root}/meta.json")
    # store exists (e.g. consumed files archived): quietly nothing to do
    SignatureStore.create(spark, store_root, threshold=0.5)
    run_ingest_stream(spark, empty, store_root,
                      str(tmp_path / "eout"), str(tmp_path / "eckpt"))


def test_band_table_read_before_first_ingest_raises_clearly(spark, tmp_path):
    """Reading the bucketed band table of a store that has never
    ingested must raise a clear error, not emit CREATE TABLE DDL with
    the literal column type 'None'."""
    import pytest

    from datacanary_spark.plans.incremental import SignatureStore

    store = SignatureStore.create(spark, str(tmp_path / "store"),
                                  bucket_bands=4)
    with pytest.raises(ValueError, match="first ingest"):
        store.store_band_rows()
