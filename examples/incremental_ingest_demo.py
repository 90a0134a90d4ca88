"""Library-composition example: the continuous-crawl ingestion loop.

Three simulated crawl drops land as parquet dirs; each is deduplicated
against EVERYTHING already accepted via a persisted SignatureStore —
drop 2 re-crawls half of drop 1 (exact dups), drop 3 carries lightly
edited variants (near-dups caught by MinHash signature estimate). The
demo then compacts the store and shows the batch ledger. The same flow
runs from the CLI:

    python -m datacanary_spark ingest --store S --input D1 \
        --output O1 --batch-id 0
    python -m datacanary_spark ingest-stream --store S --input DIR \
        --output O --checkpoint CK          # one micro-batch per drop
    python -m datacanary_spark ingest --store S --compact

Usage: python examples/incremental_ingest_demo.py [n_docs_per_drop]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _doc(seed: str, n: int = 50) -> str:
    out, h = [], seed
    for _ in range(n):
        h = hashlib.md5(h.encode()).hexdigest()
        out.append(h[:6])
    return " ".join(out)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from datacanary_spark.plans.incremental import SignatureStore
    from datacanary_spark.session import get_spark

    spark = get_spark(app_name="incremental_ingest_demo",
                      master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="ingest_demo_")
    try:
        store = SignatureStore.create(spark, f"{work}/store",
                                      threshold=0.5)

        drop1 = [(i, _doc(f"d{i}")) for i in range(n)]
        # drop 2: re-crawl of half of drop 1 + new pages
        drop2 = [(n + i, drop1[i][1]) for i in range(n // 2)] + \
                [(2 * n + i, _doc(f"e{i}")) for i in range(n // 2)]
        # drop 3: lightly edited variants of drop 1 (near-dups) + new
        drop3 = [(3 * n + i, drop1[i][1] + " minor edit")
                 for i in range(n // 2)] + \
                [(4 * n + i, _doc(f"f{i}")) for i in range(n // 2)]

        for b, rows in enumerate([drop1, drop2, drop3]):
            batch = spark.createDataFrame(rows,
                                          "doc_id bigint, text string")
            accepted = store.ingest(batch, b)
            print(f"drop {b}: {len(rows)} in -> "
                  f"{accepted.count()} accepted "
                  f"(store batches: {store.committed_batches()})")

        stats = store.compact()
        print(f"compacted: {stats}")
        print(f"total identities: {store.exact_hashes().count()} hashes, "
              f"{store.signatures().count()} signatures")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
