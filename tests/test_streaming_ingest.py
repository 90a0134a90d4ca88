"""Streaming front-end of the incremental dedup store
(streaming/ingest_stream.py): micro-batches become store batches, the
result equals a manual batch-by-batch replay, and a restart with new
files ingests only the new files against the accumulated store."""

from __future__ import annotations

import hashlib



from datacanary_spark.plans.incremental import SignatureStore
from datacanary_spark.streaming.ingest_stream import run_ingest_stream


def _doc(seed: str, n: int = 40) -> str:
    out, h = [], seed
    for _ in range(n):
        h = hashlib.md5(h.encode()).hexdigest()
        out.append(h[:6])
    return " ".join(out)


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_ingest_matches_manual_replay_and_restarts(spark, tmp_path):
    inp = str(tmp_path / "in")
    store_root = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = [(i, _doc(f"d{i}")) for i in range(20)]
    # file2: 5 exact dups of file1 docs + 5 fresh docs
    dups = [(100 + i, base[i][1]) for i in range(5)]
    fresh = [(200 + i, _doc(f"f{i}")) for i in range(5)]
    _write_file(spark, f"{inp}/f1.parquet", base)
    _write_file(spark, f"{inp}/f2.parquet", dups + fresh)

    run_ingest_stream(spark, inp, store_root, out, ckpt,
                      threshold=0.5, max_files_per_trigger=1)

    store = SignatureStore.open(spark, store_root)
    batches = store.committed_batches()
    assert len(batches) >= 2  # one micro-batch per file

    # replay the OBSERVED batch compositions manually into a fresh
    # store; accepted sets must match batch for batch
    manual_root = str(tmp_path / "manual")
    manual = SignatureStore.create(spark, manual_root, threshold=0.5)
    for b in batches:
        streamed = spark.read.parquet(f"{out}/batch_id={b}")
        batch_ids = [r.doc_id for r in streamed.select("doc_id").collect()]
        # reconstruct this micro-batch's input = accepted ∪ dropped;
        # dropped ids are recoverable from the full input minus every
        # OTHER batch's input — simpler: the store records them
        acc = manual.ingest(
            spark.createDataFrame(
                [(i, t) for (i, t) in base + dups + fresh
                 if i in _input_ids_of_batch(spark, store, b)],
                "doc_id bigint, text string"), b)
        manual_ids = sorted(r.doc_id for r in acc.select("doc_id").collect())
        assert sorted(batch_ids) == manual_ids

    # all 5 exact dups were dropped across the run; fresh docs kept
    all_accepted = spark.read.parquet(*[f"{out}/batch_id={b}"
                                        for b in batches])
    ids = {r.doc_id for r in all_accepted.select("doc_id").collect()}
    assert {100, 101, 102, 103, 104}.isdisjoint(ids)
    assert {200, 201, 202, 203, 204} <= ids

    # restart with one new file: only the new file becomes a new batch
    extra = [(300, base[0][1]), (301, _doc("new"))]  # one dup, one fresh
    _write_file(spark, f"{inp}/f3.parquet", extra)
    run_ingest_stream(spark, inp, store_root, out, ckpt,
                      threshold=0.5, max_files_per_trigger=1)
    store2 = SignatureStore.open(spark, store_root)
    new_batches = [b for b in store2.committed_batches() if b not in batches]
    assert len(new_batches) == 1
    acc3 = {r.doc_id for r in spark.read.parquet(
        f"{out}/batch_id={new_batches[0]}").select("doc_id").collect()}
    assert acc3 == {301}  # 300 deduped against the store across restarts


def _input_ids_of_batch(spark, store: SignatureStore, batch_id: int) -> set:
    """A batch's input ids as the store recorded them: accepted ids ∪
    ids whose signature/hash rows were written by that batch. Exact
    dups of earlier content appear in neither sigs nor accepted, so
    fall back to 'accepted of THIS batch' ∪ 'sig rows of this batch'
    ∪ exact-dropped reconstruction is not possible from the store
    alone — instead read the accepted dir and the sigs dir and accept
    that exact-dropped docs are absent (the manual replay then sees
    the same effective input: exact-dropped docs influence nothing
    downstream of their absence)."""
    acc = spark.read.parquet(f"{store.root}/accepted/batch_id={batch_id}")
    sig = spark.read.parquet(f"{store.root}/sigs/batch_id={batch_id}")
    ids = {r.doc_id for r in acc.select("doc_id").collect()}
    ids |= {r.doc_id for r in sig.select("doc_id").collect()}
    return ids


def test_ingest_stream_read_failures_surface_or_noop(spark, tmp_path):
    """With an existing store, a MISSING input dir is the benign
    'no new drop yet' case (clean no-op); a CORRUPT input file is a
    real failure and must raise, not silently report a clean drain."""
    import pytest

    inp = str(tmp_path / "in")
    store_root = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_file(spark, f"{inp}/f1.parquet", [(1, _doc("a")), (2, _doc("b"))])
    run_ingest_stream(spark, inp, store_root, out, ckpt, threshold=0.5)
    store = SignatureStore.open(spark, store_root)
    n_batches = len(store.committed_batches())

    # benign: input dir gone (archived) -> no-op, store untouched
    missing = str(tmp_path / "nonexistent")
    run_ingest_stream(spark, missing, store_root, out, ckpt, threshold=0.5)
    assert len(SignatureStore.open(spark, store_root).committed_batches()) \
        == n_batches

    # real failure: unreadable bytes where parquet is expected
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "x.parquet").write_bytes(b"not parquet at all")
    with pytest.raises(Exception) as ei:
        run_ingest_stream(spark, str(bad), store_root, out, ckpt,
                          threshold=0.5)
    assert not isinstance(ei.value, ValueError) or "no readable parquet" \
        not in str(ei.value)
