"""Background batch prefetching.

The reference overlaps host IO with GPU compute via torch DataLoader
workers; here a small thread pool builds the next batches (npz decode +
augment + pad, incl. the native C++ kernels) while the device step runs.
"""
from __future__ import annotations

import queue
import threading


class PrefetchLoader:
    """Wrap a ``make_batch(step_index) -> batch`` callable with lookahead.

    Usage:
        loader = PrefetchLoader(make_batch, num_steps, lookahead=2)
        for batch in loader:
            ...
    """

    def __init__(self, make_batch, num_steps: int, lookahead: int = 2):
        self.make_batch = make_batch
        self.num_steps = num_steps
        self.q: queue.Queue = queue.Queue(maxsize=lookahead)
        self._err = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for i in range(self.num_steps):
                self.q.put(self.make_batch(i))
        except Exception as e:  # surfaced on next __next__
            self._err = e
        finally:
            self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item
