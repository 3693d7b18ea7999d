"""SaveWorkerPool: ordering-independent bounded chunk-save pool (the
full_seq output pipeline since r5; cli.py --save_workers)."""

import threading
import time

import pytest

from dvs_mcemvs_tpu.utils.writers import SaveWorkerPool


def test_all_submitted_work_completes():
    done = []
    lock = threading.Lock()
    with SaveWorkerPool(workers=2, max_inflight=3) as pool:
        for k in range(20):
            def work(k=k):
                time.sleep(0.002)
                with lock:
                    done.append(k)
            pool.submit(work)
    assert sorted(done) == list(range(20))


def test_backpressure_bounds_inflight():
    peak = [0]
    active = [0]
    lock = threading.Lock()
    with SaveWorkerPool(workers=2, max_inflight=3) as pool:
        for _ in range(12):
            def work():
                with lock:
                    active[0] += 1
                    peak[0] = max(peak[0], active[0])
                time.sleep(0.01)
                with lock:
                    active[0] -= 1
            pool.submit(work)
    # At most max_inflight tasks can be pending at once (2 running + queue).
    assert peak[0] <= 3


def test_worker_exception_reraises():
    pool = SaveWorkerPool(workers=1, max_inflight=1)
    pool.submit(lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        # Either the backpressure drain on the next submit or the final
        # drain must surface the failure.
        pool.submit(lambda: None)
        pool.drain()
    pool._ex.shutdown(wait=True, cancel_futures=True)
