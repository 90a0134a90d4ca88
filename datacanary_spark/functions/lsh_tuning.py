"""MinHash-LSH parameter selection: pick (bands, rows) for a target
Jaccard threshold.

The banded-signature scheme (operators/dedup.py::lsh_candidate_pairs)
matches a pair with probability ``P(s) = 1 − (1 − s^r)^b`` at true
Jaccard similarity ``s`` (Leskovec, Rajaraman & Ullman, *Mining of
Massive Datasets* ch. 3). The S-curve's inflection sits near
``t ≈ (1/b)^(1/r)``; choosing (b, r) is the calibration step every
production near-dup pass performs before burning a 100-TB pipeline
run on a mis-tuned threshold. This module is pure driver-side math —
no Spark — consumed by ``choose_bands`` callers that then pass
``bands``/``n_hashes`` into the dedup operators.
"""

from __future__ import annotations


def lsh_match_probability(s: float, bands: int, rows: int) -> float:
    """P(candidate pair) at true Jaccard ``s`` under (bands, rows)."""
    if not 0.0 <= s <= 1.0:
        raise ValueError(f"similarity must be in [0, 1]: {s}")
    return 1.0 - (1.0 - s ** rows) ** bands


def lsh_threshold(bands: int, rows: int) -> float:
    """The S-curve's approximate inflection similarity ``(1/b)^(1/r)``
    — pairs above it are likely candidates, below it likely not."""
    return (1.0 / bands) ** (1.0 / rows)


def false_rates(threshold: float, bands: int, rows: int,
                steps: int = 1000) -> tuple[float, float]:
    """(false_positive_area, false_negative_area) of the S-curve
    around ``threshold``: FP = ∫₀ᵗ P(s) ds (pairs BELOW the threshold
    that still become candidates and cost verify-join work), FN =
    ∫ₜ¹ (1 − P(s)) ds (pairs ABOVE it that LSH misses — unrecoverable,
    unlike FPs which the exact Jaccard verify filters). Trapezoidal
    integration, the same objective datasketch optimizes."""
    fp = fn = 0.0
    for i in range(steps):
        s0 = i / steps
        s1 = (i + 1) / steps
        p0 = lsh_match_probability(s0, bands, rows)
        p1 = lsh_match_probability(s1, bands, rows)
        mid = (p0 + p1) / 2 * (s1 - s0)
        if s1 <= threshold:
            fp += mid
        elif s0 >= threshold:
            fn += (s1 - s0) - mid
        else:  # straddling segment: split at the threshold
            left = (threshold - s0) / (s1 - s0)
            fp += mid * left
            fn += ((s1 - s0) - mid) * (1 - left)
    return fp, fn


def choose_bands(n_hashes: int, threshold: float,
                 fp_weight: float = 0.5,
                 fn_weight: float = 0.5) -> tuple[int, int]:
    """Best (bands, rows) with ``bands · rows == n_hashes`` for a
    target Jaccard ``threshold``: minimizes ``fp_weight·FP_area +
    fn_weight·FN_area``. Weight FN higher when a miss is expensive
    (decontamination — a leaked benchmark doc is unrecoverable) and FP
    higher when the verify join dominates cost (the usual 100-TB
    near-dup pass, where every candidate costs a shingle-set Jaccard).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1): {threshold}")
    if n_hashes < 2:
        raise ValueError(f"need n_hashes >= 2: {n_hashes}")
    best, best_cost = None, float("inf")
    for bands in range(1, n_hashes + 1):
        if n_hashes % bands:
            continue
        rows = n_hashes // bands
        fp, fn = false_rates(threshold, bands, rows)
        cost = fp_weight * fp + fn_weight * fn
        if cost < best_cost:
            best, best_cost = (bands, rows), cost
    return best
