"""Shared program-count bucketing helpers.

Dynamic-shape knobs (k for kmeans/metrics) are bucketed to powers of two so
one compiled program serves a whole range of values — the sweep over
k in {4..8} costs 2 compiled programs instead of 5 (the bulk of the ~40
cold-start compiles measured in round 2).  The helper lives here because
cluster.kmeans and metrics.internal must bucket IDENTICALLY for the
program-count win to hold across both layers (advisor round 3)."""
from __future__ import annotations


def bucket_k(k: int) -> int:
    """Smallest power of two >= k (minimum 2)."""
    b = 2
    while b < k:
        b *= 2
    return b
