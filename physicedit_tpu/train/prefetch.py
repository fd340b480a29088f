"""Host-side dataset prefetching for the training loop.

The reference hides its video-decode latency behind 8 DataLoader worker
processes (scripts/train/train_physicedit.py:512).  The TPU-idiomatic
equivalent is a bounded thread-pool prefetcher: ``dataset[i]`` (ffmpeg /
imageio decode of <=49 frames + PIL work — GIL-releasing C code) runs in
background threads while the chip executes preprocess + train_step, so
the device never waits on the decoder.  Threads, not processes: samples
are large (decoded frame stacks), and process IPC would re-serialise
them; the decode path holds the GIL only briefly.

Order is preserved exactly (the resume bookkeeping in train/trainer.py
records the epoch position, so samples must arrive in index order), and
``None`` samples (filtered items) pass through unchanged.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor


def prefetch_samples(dataset, indices, num_workers: int = 2,
                     depth: int | None = None):
    """Yield ``(i, dataset[i])`` in order with background prefetch.

    num_workers <= 0 degrades to the plain synchronous loop.  ``depth``
    bounds in-flight samples (default 2x workers) so decoded frame stacks
    don't pile up in host RAM ahead of a slow consumer.
    """
    if num_workers <= 0:
        for i in indices:
            yield i, dataset[i]
        return
    if depth is None:
        depth = 2 * num_workers
    pool = ThreadPoolExecutor(max_workers=num_workers)
    try:
        queue: collections.deque = collections.deque()
        it = iter(indices)

        def fill():
            while len(queue) < depth:
                try:
                    i = next(it)
                except StopIteration:
                    return
                queue.append((i, pool.submit(dataset.__getitem__, i)))

        fill()
        while queue:
            i, fut = queue.popleft()
            sample = fut.result()  # re-raises decode errors in order
            fill()
            yield i, sample
    finally:
        # Abandonment (exception in the consuming train loop) must not
        # block on up-to-`depth` queued video decodes: cancel what hasn't
        # started, wait only for the in-flight workers.
        pool.shutdown(wait=True, cancel_futures=True)
