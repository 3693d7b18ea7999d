import numpy as np
import jax.numpy as jnp
import pytest

from dvs_mcemvs_tpu import pipeline
from dvs_mcemvs_tpu.mapper import DsiShape, Events, evaluate_dsi, get_depth_map, make_mapper
from dvs_mcemvs_tpu.ops import extract, grid as gridops, se3, trajectory as trajmod
from dvs_mcemvs_tpu.ops.camera import PinholeCamera
from dvs_mcemvs_tpu.ops.se3 import SE3
from dvs_mcemvs_tpu.utils import synthetic


@pytest.fixture(scope="module")
def small_rig():
    cam = PinholeCamera(width=64, height=48, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
    rig = synthetic.SyntheticRig(cam=cam, baseline=0.2, travel=0.4,
                                 plane_depths=(1.5, 2.5))
    rng = np.random.default_rng(3)
    pts = synthetic.make_scene(rig, rng, n_pts=1500)
    ev0 = synthetic.simulate_events(rig, pts, 0, n_samples=30, rng=rng)
    ev1 = synthetic.simulate_events(rig, pts, 1, n_samples=30, rng=rng)
    ts, q, p = synthetic.rig_poses(rig)
    traj0 = trajmod.from_arrays(ts, q, p)
    traj1 = trajmod.from_arrays(ts, q, p + np.array([rig.baseline, 0, 0]))
    shape = DsiShape(dim_z=16, min_depth=1.0, max_depth=4.0)
    mappers = [make_mapper(cam, shape), make_mapper(cam, shape)]
    return rig, mappers, [ev0, ev1], [traj0, traj1]


VOPTS = pipeline.VotingOptions(packet_size=128)


def test_process_1_recovers_plane_depths(small_rig):
    rig, mappers, events, trajs = small_rig
    res = pipeline.process_1(mappers, events, trajs, ts=0.5,
                             stereo_fusion=gridops.FUSE_HM, vopts=VOPTS)
    assert res.fused_dsi.shape == mappers[0].dsi_shape
    assert set(res.dsis) == {"camera0", "camera1"}
    dm = get_depth_map(mappers[0], res.fused_dsi, extract.DepthMapOptions())
    mask = np.asarray(dm.mask) > 0
    assert mask.sum() > 100
    ys, xs = np.nonzero(mask)
    d = np.asarray(dm.depth)[ys, xs]
    gt = synthetic.ground_truth_depth(rig, mappers[0].vcam,
                                      rig.camera_position(0.5)[0], xs, ys, d)
    med = np.median(np.abs(d - gt))
    assert med <= (4.0 - 1.0) / 16 + 1e-6, f"median err {med}"


def test_dsi_additivity_over_event_partition(small_rig):
    """Voting is a pure sum over events: packet-aligned halves sum to the
    whole (the property event/data sharding relies on)."""
    _, mappers, events, trajs = small_rig
    m, ev, trj = mappers[0], events[0], trajs[0]
    T_rv_w = pipeline.place_reference_view(trj, 0.5)
    P = 128
    K = (ev.num - 1) // P
    half = (K // 2) * P
    full = evaluate_dsi(m, ev.slice(0, K * P + 1), trj, T_rv_w, packet_size=P)
    a = evaluate_dsi(m, ev.slice(0, half + 1), trj, T_rv_w, packet_size=P)
    b = evaluate_dsi(m, ev.slice(half, K * P + 1), trj, T_rv_w, packet_size=P)
    np.testing.assert_allclose(np.asarray(a) + np.asarray(b), np.asarray(full),
                               rtol=1e-5, atol=1e-4)


@pytest.fixture(scope="module")
def tri_rig():
    """Three inline cameras (evimo2-shaped rig: calib.cpp:678-807)."""
    cam = PinholeCamera(width=64, height=48, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
    rig = synthetic.SyntheticRig(cam=cam, baseline=0.15, travel=0.4,
                                 plane_depths=(1.5, 2.5))
    rng = np.random.default_rng(5)
    pts = synthetic.make_scene(rig, rng, n_pts=1500)
    events = [synthetic.simulate_events(rig, pts, i, n_samples=30, rng=rng)
              for i in range(3)]
    ts, q, p = synthetic.rig_poses(rig)
    trajs = [trajmod.from_arrays(ts, q, p + np.array([rig.baseline * i, 0, 0]))
             for i in range(3)]
    shape = DsiShape(dim_z=16, min_depth=1.0, max_depth=4.0)
    mappers = [make_mapper(cam, shape) for _ in range(3)]
    return rig, mappers, events, trajs


def test_process_1_trinocular_recovers_plane_depths(tri_rig):
    """End-to-end 3-camera process_1 (reference process1.cpp:105-191 runs
    evimo2 rigs; its GM/AM/RMS silently drop camera 2, ours must not)."""
    rig, mappers, events, trajs = tri_rig
    res = pipeline.process_1(mappers, events, trajs, ts=0.5,
                             stereo_fusion=gridops.FUSE_HM, vopts=VOPTS)
    assert set(res.dsis) == {"camera0", "camera1", "camera2"}
    dm = get_depth_map(mappers[0], res.fused_dsi, extract.DepthMapOptions())
    mask = np.asarray(dm.mask) > 0
    assert mask.sum() > 100
    ys, xs = np.nonzero(mask)
    d = np.asarray(dm.depth)[ys, xs]
    gt = synthetic.ground_truth_depth(rig, mappers[0].vcam,
                                      rig.camera_position(0.5)[0], xs, ys, d)
    med = np.median(np.abs(d - gt))
    assert med <= (4.0 - 1.0) / 16 + 1e-6, f"median err {med}"


@pytest.mark.parametrize("fusion", [gridops.FUSE_GM, gridops.FUSE_AM,
                                    gridops.FUSE_RMS, gridops.FUSE_HM])
def test_process_1_trinocular_uses_third_camera(tri_rig, fusion):
    """All fusion functions are n-ary here — the reference no-ops camera 2
    for GM/AM/RMS (process1.cpp:178-183). The fused DSI must equal the n-ary
    fusion of all three per-camera DSIs and differ from the 2-camera one."""
    rig, mappers, events, trajs = tri_rig
    res = pipeline.process_1(mappers, events, trajs, ts=0.5,
                             stereo_fusion=fusion, vopts=VOPTS)
    d3 = [res.dsis[f"camera{i}"] for i in range(3)]
    np.testing.assert_allclose(np.asarray(res.fused_dsi),
                               np.asarray(gridops.fuse_many(d3, fusion)),
                               rtol=1e-5, atol=1e-4)
    two = np.asarray(gridops.fuse_many(d3[:2], fusion))
    assert not np.allclose(np.asarray(res.fused_dsi), two, rtol=1e-3,
                           atol=1e-3), "third camera did not contribute"


def test_process_2_am_order_invariance(small_rig):
    """With AM for both axes, camera-then-time equals time-then-camera."""
    _, mappers, events, trajs = small_rig
    res = pipeline.process_2(
        mappers, events, trajs, ts=0.5,
        stereo_fusion=gridops.FUSE_AM, temporal_fusion=pipeline.TEMPORAL_AM,
        num_intervals=2, vopts=VOPTS)
    np.testing.assert_allclose(
        np.asarray(res.fused_dsi), np.asarray(res.dsis["camera_time"]),
        rtol=1e-5, atol=1e-4)
    assert {"left_temporal", "right_temporal", "camera_time"} <= set(res.dsis)


def test_process_5_shuffled_runs(small_rig):
    _, mappers, events, trajs = small_rig
    res = pipeline.process_5(
        mappers, events, trajs, ts=0.5,
        stereo_fusion=gridops.FUSE_HM, temporal_fusion=pipeline.TEMPORAL_HM,
        num_intervals=2, vopts=VOPTS)
    assert np.asarray(res.fused_dsi).max() > 0


def test_split_subintervals_counts():
    ev = Events(np.arange(10), np.arange(10), np.linspace(0, 1, 10))
    subs = pipeline.split_subintervals(ev, 3)
    assert [s.num for s in subs] == [3, 3, 3]
    np.testing.assert_array_equal(subs[1].x, [3, 4, 5])


def test_split_subintervals_shifted_wraparound():
    ev = Events(np.arange(12), np.arange(12), np.linspace(0, 1, 12))
    subs = pipeline.split_subintervals_shifted(ev, 4, shift=2)
    assert [s.num for s in subs] == [3, 3, 3, 3]
    np.testing.assert_array_equal(subs[0].x, [6, 7, 8])
    np.testing.assert_array_equal(subs[1].x, [9, 10, 11])
    np.testing.assert_array_equal(subs[2].x, [0, 1, 2])
    # all events covered exactly once
    allx = np.sort(np.concatenate([s.x for s in subs]))
    np.testing.assert_array_equal(allx, np.arange(12))


def test_full_seq_windows():
    opts = pipeline.FullSeqOptions(start_time=10.0, stop_time=12.0,
                                   duration=0.5, out_skip=1.0)
    ws = list(pipeline.full_seq_windows(opts))
    assert len(ws) == 2
    t0, t1, ts = ws[0]
    assert (t0, t1, ts) == (10.0, 10.5, 10.25)
    opts_f = pipeline.FullSeqOptions(start_time=10.0, stop_time=12.0,
                                     duration=0.5, out_skip=1.0,
                                     forward_looking=True)
    assert list(pipeline.full_seq_windows(opts_f))[0][2] == 10.5


def test_run_full_seq_yields_chunks(small_rig):
    rig, mappers, events, trajs = small_rig
    opts = pipeline.FullSeqOptions(start_time=0.1, stop_time=0.9,
                                   duration=0.4, out_skip=0.4)
    chunks = list(pipeline.run_full_seq(
        mappers, events, trajs, opts, pipeline.process_1,
        stereo_fusion=gridops.FUSE_HM, vopts=VOPTS))
    assert len(chunks) == 2
    for k, ts, res in chunks:
        assert np.asarray(res.fused_dsi).max() > 0


def test_bucket_padding_exact_and_stable_shapes(small_rig):
    """pad="bucket" votes exactly the same events as an unpadded call that
    covers them (zero-weight padding adds nothing), and quantizes traced
    shapes so different chunk sizes inside one bucket share one compile."""
    from dvs_mcemvs_tpu.mapper import bucket_capacity, _evaluate_dsi_jit

    _, mappers, events, trajs = small_rig
    m, ev, trj = mappers[0], events[0], trajs[0]
    T_rv_w = pipeline.place_reference_view(trj, 0.5)
    P = 128
    E = 6 * P  # not a power-of-two packet count -> bucket pads to 8*P

    assert bucket_capacity(6 * P, P) == 8 * P
    assert bucket_capacity(8 * P, P) == 8 * P
    assert bucket_capacity(8 * P + 1, P) == 16 * P

    # pad="none" votes events [0, K*P) with K=(E'-1)//P: E'=E+1 covers E.
    ref = evaluate_dsi(m, ev.slice(0, E + 1), trj, T_rv_w, packet_size=P,
                       pad="none")
    got = evaluate_dsi(m, ev.slice(0, E), trj, T_rv_w, packet_size=P,
                       pad="bucket")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)

    # Same-bucket sizes share one compiled executable.
    before = _evaluate_dsi_jit._cache_size()
    evaluate_dsi(m, ev.slice(0, E - 37), trj, T_rv_w, packet_size=P,
                 pad="bucket")
    evaluate_dsi(m, ev.slice(0, E - 201), trj, T_rv_w, packet_size=P,
                 pad="bucket")
    assert _evaluate_dsi_jit._cache_size() == before


def test_temporal_fusion_normalizes_by_surviving_intervals(small_rig, monkeypatch):
    """A skipped (too-small) sub-interval must not bias the temporal HM/AM:
    the finalize divides by the count of intervals that actually voted
    (VERDICT r2 weak #4)."""
    _, mappers, events, trajs = small_rig
    P = 128

    # 3 nominal sub-intervals, the middle one undersized (< one packet) so
    # it is skipped; the surviving two are the same slices a 2-interval run
    # sees below.
    n = (events[0].num // (2 * P)) * P
    cut = [(0, n), (n, n + 4), (n, 2 * n)]

    def uneven_split(ev, k):
        assert k == 3
        return [ev.slice(lo, hi) for lo, hi in cut]

    monkeypatch.setattr(pipeline, "split_subintervals", uneven_split)
    res3 = pipeline.process_2(
        mappers, events, trajs, ts=0.5, stereo_fusion=gridops.FUSE_HM,
        temporal_fusion=pipeline.TEMPORAL_AM, num_intervals=3, vopts=VOPTS)
    monkeypatch.undo()

    def even_split(ev, k):
        assert k == 2
        return [ev.slice(0, n), ev.slice(n, 2 * n)]

    monkeypatch.setattr(pipeline, "split_subintervals", even_split)
    res2 = pipeline.process_2(
        mappers, events, trajs, ts=0.5, stereo_fusion=gridops.FUSE_HM,
        temporal_fusion=pipeline.TEMPORAL_AM, num_intervals=2, vopts=VOPTS)

    np.testing.assert_allclose(np.asarray(res3.fused_dsi),
                               np.asarray(res2.fused_dsi),
                               rtol=1e-6, atol=1e-6)
