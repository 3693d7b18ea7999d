"""Bounded-memory streaming ingest (VERDICT r2 item 6): h5 -> .evs store
building must never materialize the stream, and the streamed store must be
window-for-window identical to the in-RAM reader path."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from dvs_mcemvs_tpu.io import events as eventsmod, evstore
from dvs_mcemvs_tpu.io.events import TimeOrigin

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_h5(path, n=200_000, t_offset=0, seed=0):
    rng = np.random.default_rng(seed)
    t_us = np.sort(rng.integers(0, 10_000_000, n)).astype(np.int64)
    with h5py.File(path, "w") as f:
        g = f.create_group("events")
        g["t"] = t_us
        g["x"] = rng.integers(0, 640, n).astype(np.uint16)
        g["y"] = rng.integers(0, 480, n).astype(np.uint16)
        g["p"] = rng.integers(0, 2, n).astype(np.uint8)
        if t_offset:
            f["t_offset"] = np.int64(t_offset)
    return t_us


def test_streamed_store_matches_reader_windows(tmp_path):
    """NormalizedStore windows over a stream-built cache == the windowed
    in-RAM h5 reader (same offset + origin semantics)."""
    try:
        evstore._load()
    except Exception as e:
        pytest.skip(f"native store unavailable: {e}")
    p = str(tmp_path / "ev.h5")
    _write_h5(p, t_offset=5_000_000)
    offset = 0.25

    origin_a = TimeOrigin()
    store = evstore.NormalizedStore(evstore.open_or_build_h5(p),
                                    offset, origin_a)
    origin_b = TimeOrigin()
    full = eventsmod.read_events_h5(p, offset=offset, origin=origin_b)
    assert origin_a.t0 == pytest.approx(origin_b.t0, abs=1e-9)
    assert store.count == full.num

    for (a, b) in [(0.0, 10.0), (2.0, 3.0), (0.0, 0.5), (9.0, 9.9)]:
        w = store.window(a, b)
        ref = full.time_window(a, b)
        # store timestamps are f32-relative: equal to within f32 eps of the
        # 10 s span (~1 µs), and the selected events are identical.
        assert w.num == ref.num, f"window ({a},{b})"
        np.testing.assert_array_equal(w.x, ref.x)
        np.testing.assert_array_equal(w.y, ref.y)
        np.testing.assert_allclose(w.t, ref.t, atol=4e-6)
        assert store.window_count(a, b) == ref.num

    head = store.head(100, 2.0, 3.0)
    ref = full.time_window(2.0, 3.0)
    np.testing.assert_array_equal(head.x, ref.x[:100])


def test_streaming_build_is_rss_bounded(tmp_path):
    """Stream-building a 2e7-event store must cost O(chunk) memory, not the
    ~340 MB a full materialization takes (the whole point of VERDICT item
    6).  Measured as VmHWM delta in a fresh subprocess."""
    try:
        evstore._load()
    except Exception as e:
        pytest.skip(f"native store unavailable: {e}")
    script = textwrap.dedent(f"""
        import numpy as np, h5py, os, sys
        sys.path.insert(0, {REPO!r})

        def hwm_kb():
            with open('/proc/self/status') as f:
                for ln in f:
                    if ln.startswith('VmHWM'):
                        return int(ln.split()[1])

        path = {str(tmp_path / 'big.h5')!r}
        N, C = 20_000_000, 1_000_000
        rng = np.random.default_rng(0)
        with h5py.File(path, 'w') as f:
            g = f.create_group('events')
            g.create_dataset('t', shape=(N,), dtype=np.int64)
            g.create_dataset('x', shape=(N,), dtype=np.uint16)
            g.create_dataset('y', shape=(N,), dtype=np.uint16)
            g.create_dataset('p', shape=(N,), dtype=np.uint8)
            t0 = 0
            for lo in range(0, N, C):
                hi = min(N, lo + C)
                dt = rng.integers(0, 3, hi - lo)
                t = t0 + np.cumsum(dt)
                t0 = int(t[-1])
                g['t'][lo:hi] = t
                g['x'][lo:hi] = rng.integers(0, 640, hi - lo, dtype=np.uint16)
                g['y'][lo:hi] = rng.integers(0, 480, hi - lo, dtype=np.uint16)
                g['p'][lo:hi] = rng.integers(0, 2, hi - lo, dtype=np.uint8)

        from dvs_mcemvs_tpu.io import evstore
        from dvs_mcemvs_tpu.io.events import H5EventSource
        evstore._load()  # build/load the .so before the measurement
        before = hwm_kb()
        with H5EventSource(path) as src:
            evstore.write_store_streaming(
                str(path) + '.evs', src, chunk=1 << 20)
        after = hwm_kb()
        st = evstore.EventStore(str(path) + '.evs')
        assert st.count == N, st.count
        print((after - before) * 1024)
    """)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    delta_bytes = int(out.stdout.strip().splitlines()[-1])
    # Full columns would be >= 20M * (8+2+2+1) = 260 MB; the streaming path
    # must stay an order of magnitude under (chunk buffers + h5 cache).
    assert delta_bytes < 120 * 1024 * 1024, f"RSS delta {delta_bytes/1e6} MB"


def test_unsorted_h5_is_rejected(tmp_path):
    try:
        evstore._load()
    except Exception as e:
        pytest.skip(f"native store unavailable: {e}")
    p = str(tmp_path / "bad.h5")
    with h5py.File(p, "w") as f:
        g = f.create_group("events")
        g["t"] = np.array([5, 3, 9], np.int64)
        g["x"] = np.zeros(3, np.uint16)
        g["y"] = np.zeros(3, np.uint16)
        g["p"] = np.zeros(3, np.uint8)
    from dvs_mcemvs_tpu.io.events import H5EventSource

    with H5EventSource(p) as src:
        with pytest.raises(ValueError, match="not time-sorted"):
            evstore.write_store_streaming(str(tmp_path / "bad.evs"), src)


def test_cli_full_seq_streams_h5(tmp_path):
    """CLI full_seq over h5 inputs takes the streaming-store path and
    produces the same chunk artifacts as the in-RAM path."""
    try:
        evstore._load()
    except Exception as e:
        pytest.skip(f"native store unavailable: {e}")
    from dvs_mcemvs_tpu import cli
    from dvs_mcemvs_tpu.utils import synthetic

    fix = synthetic.write_fixture(str(tmp_path / "data"))
    # Convert the npz fixtures to h5 so the streaming path triggers.
    for i in (0, 1):
        d = np.load(fix[f"events{i}"])
        h5p = str(tmp_path / f"events_{i}.h5")
        with h5py.File(h5p, "w") as f:
            g = f.create_group("events")
            g["t"] = (d["t"] * 1e6).astype(np.int64)
            g["x"] = d["x"].astype(np.uint16)
            g["y"] = d["y"].astype(np.uint16)
            g["p"] = d["p"].astype(np.uint8)

    def run(out, left, right, extra=()):
        args = [
            "--platform=cpu", "--calib_type=esim",
            f"--bag_filename_left={left}",
            f"--bag_filename_right={right}",
            f"--bag_filename_pose={fix['poses']}",
            f"--out_path={out}", "--dimZ=20", "--min_depth=1",
            "--max_depth=4", "--process_method=1", "--full_seq",
            "--start_time_s=0.1", "--stop_time_s=0.9", "--duration=0.4",
            "--out_skip=0.3", "--nosave_dense", "--nosave_pointcloud",
            "--nocheckpoint", "--num_devices=1",
        ] + list(extra)
        assert cli.main(args) == 0

    out_h5 = str(tmp_path / "out_h5")
    run(out_h5, str(tmp_path / "events_0.h5"), str(tmp_path / "events_1.h5"))
    out_ram = str(tmp_path / "out_ram")
    run(out_ram, str(tmp_path / "events_0.h5"), str(tmp_path / "events_1.h5"),
        ["--nouse_event_store"])

    h5_files = sorted(f for f in os.listdir(out_h5)
                      if f.endswith("depth_points_fused.txt"))
    ram_files = sorted(f for f in os.listdir(out_ram)
                       if f.endswith("depth_points_fused.txt"))
    assert h5_files and h5_files == ram_files
    # .evs caches live next to the h5 sources, not in the run dir.
    assert os.path.exists(str(tmp_path / "events_0.h5.evs"))
    for fa, fb in zip(h5_files, ram_files):
        a = np.loadtxt(os.path.join(out_h5, fa))
        b = np.loadtxt(os.path.join(out_ram, fb))
        assert a.shape == b.shape
        # Store timestamps are f32-relative (native/evstore.cpp header), so
        # a window-boundary event can shift by one packet vs the f64 RAM
        # path; a handful of tie-pixel depth flips is expected, wholesale
        # disagreement is not.
        frac_diff = np.mean(~np.isclose(a, b, atol=1e-4))
        assert frac_diff < 0.005, f"{fa}: {frac_diff:.4%} differ"
