"""Native event store: ingest, windows, reads, prefetch, cache reuse."""

import os

import numpy as np
import pytest

pytest.importorskip("ctypes")

from dvs_mcemvs_tpu.mapper import Events

try:
    from dvs_mcemvs_tpu.io import evstore
    evstore._load()
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - no compiler in env
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")


@pytest.fixture()
def stream():
    rng = np.random.default_rng(3)
    n = 20_000
    t = np.sort(rng.uniform(100.0, 104.0, n))
    x = rng.integers(0, 640, n).astype(np.int32)
    y = rng.integers(0, 480, n).astype(np.int32)
    p = rng.integers(0, 2, n).astype(np.int8)
    return Events(x, y, t, p)


def test_roundtrip(tmp_path, stream):
    path = str(tmp_path / "s.evs")
    evstore.write_store(path, stream)
    with evstore.EventStore(path) as s:
        assert s.count == stream.num
        t0, t1 = s.time_range
        assert t0 == pytest.approx(stream.t[0])
        assert t1 == pytest.approx(stream.t[-1])
        out = s.read(0, s.count)
        np.testing.assert_array_equal(out.x, stream.x)
        np.testing.assert_array_equal(out.y, stream.y)
        np.testing.assert_array_equal(out.p, stream.p)
        # f32 relative time round-trip: sub-ms accurate
        np.testing.assert_allclose(out.t, stream.t, atol=5e-4)


def test_window_matches_numpy(tmp_path, stream):
    path = str(tmp_path / "s.evs")
    evstore.write_store(path, stream)
    with evstore.EventStore(path) as s:
        for (a, b) in [(100.5, 101.5), (100.0, 104.0), (103.9, 104.1),
                       (99.0, 99.5)]:
            got = s.window(a, b)
            # reference slice on the store's own (quantized) timestamps
            full = s.read(0, s.count)
            lo = np.searchsorted(full.t, a, side="left")
            hi = np.searchsorted(full.t, b, side="right")
            assert got.num == hi - lo
            np.testing.assert_array_equal(got.x, full.x[lo:hi])


def test_prefetch_nonblocking(tmp_path, stream):
    path = str(tmp_path / "s.evs")
    evstore.write_store(path, stream)
    with evstore.EventStore(path) as s:
        assert s.prefetch(100.0, 104.0) in (True, False)
        # wait for it to settle, then read normally
        import time
        for _ in range(100):
            if not s.prefetch_busy:
                break
            time.sleep(0.01)
        ev = s.window(100.0, 104.0)
        assert ev.num == stream.num


def test_open_or_build_cache(tmp_path, stream):
    src = tmp_path / "events.npz"
    src.write_bytes(b"placeholder")
    s = evstore.open_or_build(str(src), stream)
    assert s.count == stream.num
    s.close()
    # second open hits the cache without events
    s2 = evstore.open_or_build(str(src))
    assert s2.count == stream.num
    s2.close()
    with pytest.raises(ValueError):
        evstore.open_or_build(str(tmp_path / "missing.npz"))
