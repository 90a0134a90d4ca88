"""Shared no-Spark hardware control for the scaling benchmarks.

A fixed total of C-implemented md5 work (hashlib releases the GIL)
split across N threads measures the box's OWN thread-scaling ceiling —
no JVM, no allocation, no shuffle. If this doesn't scale, no
hash-dominated Spark stage on the box can: the limit is the
(virtualized) hardware, not the operator. Both scaling reports
(scripts/scaling_dedup.py, scripts/scaling_bench.py) consume THIS
probe so their "hardware ceiling" baselines stay comparable across
BENCH artifacts.
"""

from __future__ import annotations

import hashlib
import threading
import time

# ~3 GB hashed in 64 KiB blocks — long enough to dominate thread
# start/join cost, short enough to run inside every bench round
TOTAL_ITERS = 48000
BLOCK_BYTES = 65536


def md5_thread_secs(thread_levels: tuple[int, ...]) -> dict[int, float]:
    """Wall seconds to hash the fixed total at each thread level."""

    def work(n_iter: int) -> None:
        b = b"x" * BLOCK_BYTES
        for _ in range(n_iter):
            hashlib.md5(b).digest()

    secs: dict[int, float] = {}
    for nt in thread_levels:
        ths = [threading.Thread(target=work, args=(TOTAL_ITERS // nt,))
               for _ in range(nt)]
        t0 = time.perf_counter()
        [t.start() for t in ths]
        [t.join() for t in ths]
        secs[nt] = time.perf_counter() - t0
    return secs


def efficiency(secs: dict[int, float], lo: int, hi: int) -> float:
    """Strong-scaling efficiency lo→hi: ideal is 1.0 (hi/lo× speedup)."""
    return round(secs[lo] / secs[hi] / (hi / lo), 3)
