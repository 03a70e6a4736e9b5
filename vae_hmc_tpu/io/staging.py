"""Host->device staging with background prefetch.

For file-backed sources, host decode (mp3/wav -> PCM -> resample) and device
compute (STFT->mel->...) are serial in the naive loop; this module overlaps
them: a background thread decodes batch i+1..i+depth while the device
processes batch i — a software double-buffer at the batch level (the
reference decodes strictly serially per track, scripts/06:92-141).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Sequence, Tuple


def prefetch_batches(
    produce: Callable[[Sequence[int]], object],
    index_batches: Sequence[Sequence[int]],
    depth: int = 2,
) -> Iterator[Tuple[Sequence[int], object]]:
    """Yield (idx_batch, produce(idx_batch)) with `depth` batches produced
    ahead on a background thread.  Exceptions propagate to the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _SENTINEL = object()

    def worker():
        try:
            for idx in index_batches:
                q.put((idx, produce(idx)))
        except BaseException as e:      # propagate to consumer
            q.put((_SENTINEL, e))
            return
        q.put((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        idx, payload = q.get()
        if idx is _SENTINEL:
            if payload is not None:
                raise payload
            return
        yield idx, payload


def batched_indices(n: int, batch: int) -> List[List[int]]:
    return [list(range(s, min(s + batch, n))) for s in range(0, n, batch)]
