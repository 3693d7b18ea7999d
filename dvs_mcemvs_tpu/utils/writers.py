"""Bounded worker pool for per-chunk output writes.

The full_seq scheduler's save step — device→host transfer, PNG encoding,
point-list serialization — is host work that the reference runs inline in
its chunk loop (main.cpp:173-302).  A one-chunk-deep overlap (r2-r4) hides
device compute behind ONE save, but once chunks are fast the saves
themselves serialize the loop.  This pool runs saves on a few worker
threads with bounded in-flight depth (backpressure keeps device output
buffers from piling up), so sustained throughput is bounded by device
compute or aggregate write bandwidth, whichever is larger — not their sum.

Workers' exceptions are re-raised on the submitting thread at the next
submit()/drain(), so a failed write still fails the run.
"""

from __future__ import annotations

import collections
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Deque


class SaveWorkerPool:
    """Submit-ordered bounded thread pool (default 2 workers, 4 in flight).

    Chunk saves are independent files, so workers may complete out of
    order; `submit` applies backpressure by draining the OLDEST pending
    future once `max_inflight` is reached (preserving a bounded memory
    footprint of device results awaiting transfer).
    """

    def __init__(self, workers: int = 2, max_inflight: int = 4):
        self._ex = ThreadPoolExecutor(max_workers=workers,
                                      thread_name_prefix="chunk-save")
        self._pending: Deque[Future] = collections.deque()
        self._max_inflight = max(1, max_inflight)

    def submit(self, fn: Callable, *args, **kwargs) -> None:
        while len(self._pending) >= self._max_inflight:
            self._pending.popleft().result()  # re-raises worker exceptions
        self._pending.append(self._ex.submit(fn, *args, **kwargs))

    def drain(self) -> None:
        """Block until every submitted save has finished."""
        while self._pending:
            self._pending.popleft().result()

    def shutdown(self) -> None:
        self.drain()
        self._ex.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        # On error, don't block on stragglers' results — just stop cleanly.
        if exc_type is None:
            self.shutdown()
        else:
            self._ex.shutdown(wait=True, cancel_futures=True)
        return False
