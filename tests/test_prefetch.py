"""train/prefetch.py: ordered background dataset decoding.

The reference hides video decode behind DataLoader workers
(train_physicedit.py:512); our thread-pool prefetcher must preserve index
order exactly (resume bookkeeping depends on it), pass None samples
through, bound in-flight depth, and re-raise decode errors at the failing
index.
"""

import threading
import time

import pytest

from physicedit_tpu.train.prefetch import prefetch_samples


class SlowDataset:
    def __init__(self, n, fail_at=None):
        self.n = n
        self.fail_at = fail_at
        self.in_flight = 0
        self.max_in_flight = 0
        self.lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self.lock:
            self.in_flight += 1
            self.max_in_flight = max(self.max_in_flight, self.in_flight)
        time.sleep(0.01)
        with self.lock:
            self.in_flight -= 1
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError(f"decode failed at {i}")
        return None if i % 3 == 2 else {"idx": i}


def test_order_and_values_match_synchronous():
    ds = SlowDataset(17)
    sync = list(prefetch_samples(ds, range(4, 17), num_workers=0))
    pre = list(prefetch_samples(ds, range(4, 17), num_workers=3))
    assert [i for i, _ in pre] == list(range(4, 17))
    assert pre == sync  # None passthrough included


def test_depth_bounds_in_flight():
    ds = SlowDataset(40)
    list(prefetch_samples(ds, range(40), num_workers=2, depth=4))
    assert ds.max_in_flight <= 4
    assert ds.max_in_flight >= 2  # it actually prefetched concurrently


def test_decode_error_surfaces_in_order():
    ds = SlowDataset(10, fail_at=5)
    seen = []
    with pytest.raises(ValueError, match="decode failed at 5"):
        for i, _ in prefetch_samples(ds, range(10), num_workers=2):
            seen.append(i)
    assert seen == [0, 1, 2, 3, 4]
