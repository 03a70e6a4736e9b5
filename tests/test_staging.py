"""Host staging prefetcher."""
import time

import pytest

from vae_hmc_tpu.io.staging import batched_indices, prefetch_batches


def test_batched_indices():
    assert batched_indices(10, 4) == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]


def test_prefetch_order_and_completeness():
    batches = batched_indices(23, 5)
    seen = list(prefetch_batches(lambda ix: sum(ix), batches, depth=3))
    assert [idx for idx, _ in seen] == batches
    assert [v for _, v in seen] == [sum(b) for b in batches]


def test_prefetch_overlaps_producer_and_consumer():
    def slow_produce(ix):
        time.sleep(0.05)
        return ix

    batches = batched_indices(40, 5)          # 8 batches x 50 ms = 400 ms
    t0 = time.perf_counter()
    for _, _ in prefetch_batches(slow_produce, batches, depth=2):
        time.sleep(0.05)                      # consumer also 50 ms/batch
    elapsed = time.perf_counter() - t0
    # serial would be ~0.8 s; overlapped ~0.45 s
    assert elapsed < 0.7, f"no overlap: {elapsed:.2f}s"


def test_prefetch_propagates_exceptions():
    def boom(ix):
        if ix[0] >= 5:
            raise ValueError("decode failed")
        return ix

    with pytest.raises(ValueError, match="decode failed"):
        list(prefetch_batches(boom, batched_indices(10, 5)))
