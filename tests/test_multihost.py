"""True multi-process distributed semantics: 2 JAX processes (Gloo CPU
collectives, 4 virtual devices each) feeding process-LOCAL event slices
through `sharded_step_inputs_multihost` must reproduce the single-process
run exactly.

This is the test the reference cannot have (it is single-process by
construction — SURVEY.md §5 distributed-backend row); it certifies the
input path is multi-host-correct, not just mesh-correct.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from dvs_mcemvs_tpu.parallel import make_mesh, sharded

from _multihost_child import MESH_EVENT, PACKET, build_inputs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process(tmp_path):
    out_path = tmp_path / "mh.npz"
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # children set their own device count

    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), "2", str(port), str(out_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    # Poll both children against one shared deadline: if either exits
    # non-zero (e.g. 42 = backend unavailable) its peer may be blocked on
    # the coordinator barrier forever — kill it instead of waiting out the
    # full timeout.
    import time
    deadline = time.time() + 600
    while any(p.poll() is None for p in procs) and time.time() < deadline:
        if any(p.poll() not in (None, 0) for p in procs):
            break
        time.sleep(0.2)
    if any(p.poll() is None for p in procs):  # failed peer or deadline
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = [p.communicate(timeout=60) for p in procs]
    for p, (so, se) in zip(procs, outs):
        if p.returncode == 42:
            pytest.skip(f"jax.distributed backend unavailable: {se[-300:]}")
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{so[-2000:]}\n{se[-4000:]}"
    assert out_path.exists()
    got = np.load(out_path)

    # Single-process reference over the identical global stream.  The
    # children's halves are exact multiples of the shard quantum, so the
    # global buffer (and its packetization) is identical — only the psum
    # reduction order may differ.
    mappers, evs, trajs, T_rv_w = build_inputs()
    mesh = make_mesh(MESH_EVENT, 2)
    spec = sharded.rig_spec_from_mappers(mappers)
    cfg = sharded.ShardedStepConfig(fusion_method=2, packet_size=PACKET)
    step = sharded.make_sharded_step(mesh, spec, cfg)
    args = sharded.sharded_step_inputs(
        mappers, evs, trajs, T_rv_w, MESH_EVENT, PACKET)
    ref = step(*args)

    np.testing.assert_allclose(got["dsi"], np.asarray(ref["dsi"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got["confidence"],
                               np.asarray(ref["confidence"]),
                               rtol=1e-5, atol=1e-5)
    agree = np.mean(got["depth_indices"] ==
                    np.asarray(ref["depth_indices"]))
    assert agree > 0.999  # float-tie pixels may flip under reassociation


def test_multihost_inputs_single_process_equivalence():
    """With one process, sharded_step_inputs_multihost must be a drop-in for
    sharded_step_inputs (same shapes, same values, jax.Array outputs)."""
    mappers, evs, trajs, T_rv_w = build_inputs()
    mesh = make_mesh(4, 2)
    ref = sharded.sharded_step_inputs(mappers, evs, trajs, T_rv_w, 4, PACKET)
    got = sharded.sharded_step_inputs_multihost(
        mesh, mappers, evs, trajs, T_rv_w, packet_size=PACKET,
        local_capacity=max(ev.num for ev in evs))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def _write_cli_fixture(tmp_path, n_events=4096):
    """Synthetic CLI-drivable dataset truncated to an exact multiple of the
    2-process mesh quantum, so multihost slicing needs zero padding and the
    run is comparable to a single-process mesh run."""
    import numpy as np

    from dvs_mcemvs_tpu.io import events as eventsmod
    from dvs_mcemvs_tpu.utils import synthetic

    rig = synthetic.esim_like_rig()
    rng = np.random.default_rng(11)
    pts = synthetic.make_scene(rig, rng, 2000)
    paths = {}
    for i in (0, 1):
        ev = synthetic.simulate_events(rig, pts, i, n_samples=16, rng=rng)
        assert ev.num >= n_events
        ev = ev.slice(0, n_events)
        paths[i] = str(tmp_path / f"events_{i}.npz")
        eventsmod.write_events_npz(paths[i], ev)
    ts, q, p = synthetic.rig_poses(rig)
    pose_path = str(tmp_path / "poses_tum.txt")
    with open(pose_path, "w") as f:
        for k in range(len(ts)):
            f.write(f"{ts[k]} {p[k,0]} {p[k,1]} {p[k,2]} "
                    f"{q[k,1]} {q[k,2]} {q[k,3]} {q[k,0]}\n")
    return paths, pose_path


def _cli_args(paths, pose_path, out, extra):
    return [
        "--platform=cpu", "--calib_type=esim",
        f"--bag_filename_left={paths[0]}",
        f"--bag_filename_right={paths[1]}",
        f"--bag_filename_pose={pose_path}",
        f"--out_path={out}", "--ts=0.5", "--dimZ=20", "--min_depth=1",
        "--max_depth=4", "--process_method=1", "--packet_size=256",
        "--splat_backend=scatter", "--nosave_dense", "--nosave_pointcloud",
    ] + extra


def _load_depth_points(path):
    import numpy as np

    d = np.loadtxt(path)
    return {(int(r[0]), int(r[1])): r[2] for r in np.atleast_2d(d)}


def _launch_two_procs(args_fn, timeout_s=600):
    """Start 2 CLI processes, poll with a shared deadline, return outputs."""
    procs = [subprocess.Popen(args_fn(pid), env=args_fn.env, cwd=REPO,
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True)
             for pid in range(2)]
    import time
    deadline = time.time() + timeout_s
    while any(p.poll() is None for p in procs) and time.time() < deadline:
        if any(p.poll() not in (None, 0) for p in procs):
            break
        time.sleep(0.2)
    hung = any(p.poll() is None for p in procs)
    if hung:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = [p.communicate(timeout=60) for p in procs]
    return procs, outs, hung


def test_cli_two_process_full_seq_resume(tmp_path):
    """VERDICT r3 item 3: resuming a multi-process full_seq run must not
    misalign the per-chunk collectives.  Process 0 holds a ledger marking
    chunk 0 done; without the done-set broadcast its peers would keep
    issuing chunk 0's sharded step while proc 0 skips it — a psum pairing
    error or a terminal hang.  The resumed run must (a) finish, and (b)
    write the remaining chunks' artifacts identical to an uninterrupted
    run's."""
    import json

    paths, pose_path = _write_cli_fixture(tmp_path, n_events=8192)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    fs_flags = ["--full_seq", "--start_time_s=0", "--stop_time_s=1.0",
                "--duration=0.3", "--out_skip=0.25"]

    def make_args(out, port):
        def args_fn(pid):
            return ([sys.executable, "-m", "dvs_mcemvs_tpu.cli"]
                    + _cli_args(paths, pose_path, out, fs_flags + [
                        f"--coordinator=127.0.0.1:{port}",
                        "--num_processes=2", f"--process_id={pid}"]))
        args_fn.env = env
        return args_fn

    # Uninterrupted 2-process run: the reference artifacts AND the ledger
    # whose fingerprint the resumed run must match.
    out_ref = str(tmp_path / "out_ref")
    procs, outs, hung = _launch_two_procs(make_args(out_ref, _free_port()))
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0 and "DISTRIBUTED" in se + so:
            pytest.skip("jax.distributed backend unavailable")
        assert not hung and p.returncode == 0, f"ref run:\n{so[-1500:]}\n{se[-4000:]}"
    ledger = json.load(open(os.path.join(out_ref, "checkpoint.json")))
    assert len(ledger["done"]) >= 2, "fixture produced too few chunks"

    # Interrupted-run state: chunk 0 complete in proc 0's ledger, nothing
    # else on disk.  (A mid-run kill leaves exactly this: the ledger is
    # flushed atomically after each chunk.)
    out_res = str(tmp_path / "out_res")
    os.makedirs(out_res)
    ledger_resume = dict(ledger, done=[0], meta={"0": ledger["meta"]["0"]})
    with open(os.path.join(out_res, "checkpoint.json"), "w") as f:
        json.dump(ledger_resume, f)

    procs, outs, hung = _launch_two_procs(make_args(out_res, _free_port()))
    assert not hung, "resumed multi-process run hung (collective misalignment)"
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"resume run:\n{so[-1500:]}\n{se[-4000:]}"

    ref_files = sorted(f for f in os.listdir(out_ref)
                       if f.endswith("depth_points_fused.txt"))
    res_files = sorted(f for f in os.listdir(out_res)
                       if f.endswith("depth_points_fused.txt"))
    assert len(ref_files) >= 2
    # Chunk 0 was "done" before the resume -> no artifact; the rest match.
    assert res_files == ref_files[1:]
    for f in res_files:
        a = _load_depth_points(os.path.join(out_ref, f))
        b = _load_depth_points(os.path.join(out_res, f))
        common = set(a) & set(b)
        sym = (len(a) + len(b) - 2 * len(common)) / max(len(a), 1)
        assert sym < 0.005, f"{f}: mask symmetric difference {sym:.4%}"
        diffs = [abs(a[k] - b[k]) for k in common]
        assert np.mean(np.asarray(diffs) < 1e-4) > 0.999


def test_cli_two_process_alg2_matches_single(tmp_path):
    """VERDICT r3 item 5: the temporal algorithms must run multi-process.
    A 2-process process_method=2 run must reproduce the single-process
    8-virtual-device mesh run (same sub-interval split; each process feeds
    its quantum-aligned half of every sub-interval)."""
    paths, pose_path = _write_cli_fixture(tmp_path, n_events=8192)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    alg2 = ["--process_method=2", "--num_intervals=2", "--temporal_fusion=4"]
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out1 = str(tmp_path / "out_single")
    r = subprocess.run(
        [sys.executable, "-m", "dvs_mcemvs_tpu.cli"]
        + _cli_args(paths, pose_path, out1, alg2 + ["--num_devices=8"]),
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    port = _free_port()
    out2 = str(tmp_path / "out_multi")

    def args_fn(pid):
        return ([sys.executable, "-m", "dvs_mcemvs_tpu.cli"]
                + _cli_args(paths, pose_path, out2, alg2 + [
                    f"--coordinator=127.0.0.1:{port}", "--num_processes=2",
                    f"--process_id={pid}"]))
    args_fn.env = env
    procs, outs, hung = _launch_two_procs(args_fn)
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0 and "DISTRIBUTED" in se + so:
            pytest.skip("jax.distributed backend unavailable")
        assert not hung and p.returncode == 0, f"proc:\n{so[-1500:]}\n{se[-4000:]}"

    f1 = sorted(f for f in os.listdir(out1)
                if f.endswith("depth_points_fused.txt"))
    f2 = sorted(f for f in os.listdir(out2)
                if f.endswith("depth_points_fused.txt"))
    assert f1 and f1 == f2
    a = _load_depth_points(os.path.join(out1, f1[0]))
    b = _load_depth_points(os.path.join(out2, f2[0]))
    common = set(a) & set(b)
    sym = (len(a) + len(b) - 2 * len(common)) / max(len(a), 1)
    assert sym < 0.005, f"mask symmetric difference {sym:.4%}"
    diffs = [abs(a[k] - b[k]) for k in common]
    assert np.mean(np.asarray(diffs) < 1e-4) > 0.999


def test_cli_two_process_streaming_stores(tmp_path):
    """VERDICT r3 item 5: multi-process full_seq runs must keep round-3's
    streaming ingest (the `not multihost` guard is gone).  A 2-process h5
    full_seq run must actually use the .evs stores (log line) and match the
    same 2-process run with stores disabled (RAM path)."""
    h5py = pytest.importorskip("h5py")
    try:
        from dvs_mcemvs_tpu.io import evstore
        evstore._load()
    except Exception as e:
        pytest.skip(f"native store unavailable: {e}")

    paths_npz, pose_path = _write_cli_fixture(tmp_path, n_events=8192)
    # Re-encode the npz fixtures as DSEC-layout h5 (µs int64 t, events/*).
    from dvs_mcemvs_tpu.io import events as eventsmod
    paths = {}
    for i in (0, 1):
        ev = eventsmod.read_events(paths_npz[i])
        p = str(tmp_path / f"events_{i}.h5")
        with h5py.File(p, "w") as f:
            g = f.create_group("events")
            g["t"] = np.round(ev.t * 1e6).astype(np.int64)
            g["x"] = ev.x.astype(np.uint16)
            g["y"] = ev.y.astype(np.uint16)
            g["p"] = np.zeros(ev.num, np.uint8)
        paths[i] = p

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    fs_flags = ["--full_seq", "--start_time_s=0", "--stop_time_s=1.0",
                "--duration=0.3", "--out_skip=0.25", "--nocheckpoint"]

    outs_by_mode = {}
    logs_by_mode = {}
    for mode, extra in (("stream", []), ("ram", ["--nouse_event_store"])):
        out = str(tmp_path / f"out_{mode}")
        port = _free_port()

        def args_fn(pid, out=out, port=port, extra=extra):
            return ([sys.executable, "-m", "dvs_mcemvs_tpu.cli"]
                    + _cli_args(paths, pose_path, out, fs_flags + extra + [
                        f"--coordinator=127.0.0.1:{port}",
                        "--num_processes=2", f"--process_id={pid}"]))
        args_fn.env = env
        procs, pouts, hung = _launch_two_procs(args_fn)
        for p, (so, se) in zip(procs, pouts):
            if p.returncode != 0 and "DISTRIBUTED" in se + so:
                pytest.skip("jax.distributed backend unavailable")
            assert not hung and p.returncode == 0, \
                f"{mode}:\n{so[-1500:]}\n{se[-4000:]}"
        outs_by_mode[mode] = out
        logs_by_mode[mode] = "".join(so + se for so, se in pouts)

    assert "streaming event store" in logs_by_mode["stream"]
    assert "streaming event store" not in logs_by_mode["ram"]

    f_s = sorted(f for f in os.listdir(outs_by_mode["stream"])
                 if f.endswith("depth_points_fused.txt"))
    f_r = sorted(f for f in os.listdir(outs_by_mode["ram"])
                 if f.endswith("depth_points_fused.txt"))
    assert f_s and f_s == f_r
    for f in f_s:
        a = _load_depth_points(os.path.join(outs_by_mode["stream"], f))
        b = _load_depth_points(os.path.join(outs_by_mode["ram"], f))
        common = set(a) & set(b)
        # Store timestamps are f32-relative: window boundaries may admit a
        # few different boundary events vs the f64 RAM path, perturbing
        # votes near the mask threshold.
        sym = (len(a) + len(b) - 2 * len(common)) / max(len(a), 1)
        assert sym < 0.02, f"{f}: mask symmetric difference {sym:.4%}"
        diffs = np.asarray([abs(a[k] - b[k]) for k in common])
        assert np.median(diffs) < 1e-3


def test_cli_two_process_launch_matches_single(tmp_path):
    """VERDICT r2 item 3: the CLI itself must be launchable multi-process.
    Two Gloo processes running `cli.main` with --coordinator/--process_id
    must reproduce the single-process 8-virtual-device mesh run."""
    paths, pose_path = _write_cli_fixture(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    out1 = str(tmp_path / "out_single")
    r = subprocess.run(
        [sys.executable, "-m", "dvs_mcemvs_tpu.cli"]
        + _cli_args(paths, pose_path, out1, ["--num_devices=8"]),
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    port = _free_port()
    out2 = str(tmp_path / "out_multi")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "dvs_mcemvs_tpu.cli"]
            + _cli_args(paths, pose_path, out2, [
                f"--coordinator=127.0.0.1:{port}", "--num_processes=2",
                f"--process_id={pid}"]),
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    import time
    deadline = time.time() + 600
    while any(p.poll() is None for p in procs) and time.time() < deadline:
        if any(p.poll() not in (None, 0) for p in procs):
            break
        time.sleep(0.2)
    if any(p.poll() is None for p in procs):
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = [p.communicate(timeout=60) for p in procs]
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0 and "DISTRIBUTED" in se + so:
            pytest.skip("jax.distributed backend unavailable")
        assert p.returncode == 0, f"proc failed:\n{so[-1500:]}\n{se[-4000:]}"

    f1 = [f for f in os.listdir(out1) if f.endswith("depth_points_fused.txt")]
    f2 = [f for f in os.listdir(out2) if f.endswith("depth_points_fused.txt")]
    assert f1 and f1 == f2
    a = _load_depth_points(os.path.join(out1, f1[0]))
    b = _load_depth_points(os.path.join(out2, f2[0]))
    # Identical packets; only psum reassociation differs -> tie pixels may
    # flip in or out of the mask.
    common = set(a) & set(b)
    sym = (len(a) + len(b) - 2 * len(common)) / max(len(a), 1)
    assert sym < 0.005, f"mask symmetric difference {sym:.4%}"
    diffs = [abs(a[k] - b[k]) for k in common]
    assert np.mean(np.asarray(diffs) < 1e-4) > 0.999
