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
