"""Child process for the 2-process distributed CPU test.

Run as:  python tests/_multihost_child.py <pid> <nproc> <port> <out.npz>

Each process gets 4 virtual CPU devices (8-device global mesh over 2
processes) and loads ONLY its half of the synthetic event stream — the
multi-host data-feed pattern (`sharded_step_inputs_multihost`) the real
framework uses on pods, exercised end-to-end with `jax.distributed` + Gloo
collectives.  Process 0 saves the replicated depth decision plus the
plane-shard-reassembled DSI for the parent test to compare against a
single-process run.

The rig/fixture construction (`build_inputs`) is importable by the parent
so both sides are guaranteed to build the identical problem.
"""

import sys

PACKET = 256
MESH_EVENT, MESH_PLANE = 4, 2


def build_inputs():
    """Deterministic synthetic stereo rig + events, truncated so each
    process slice is an exact multiple of its local shard quantum (no
    padding -> packets identical across process splits)."""
    import numpy as np

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.mapper import DsiShape, make_mapper
    from dvs_mcemvs_tpu.ops import se3, trajectory as trajmod
    from dvs_mcemvs_tpu.ops.se3 import SE3
    from dvs_mcemvs_tpu.utils import synthetic

    rig = synthetic.esim_like_rig()
    rng = np.random.default_rng(7)
    pts = synthetic.make_scene(rig, rng, 1500)
    ev0 = synthetic.simulate_events(rig, pts, 0, n_samples=12, rng=rng)
    ev1 = synthetic.simulate_events(rig, pts, 1, n_samples=12, rng=rng)
    shape = DsiShape(dim_z=16, min_depth=1.0, max_depth=4.0)
    mappers = [make_mapper(rig.cam, shape), make_mapper(rig.cam, shape)]
    ts, q, p = synthetic.rig_poses(rig)
    traj0 = trajmod.from_arrays(ts, q, p)
    T_1_0 = SE3(np.asarray([1.0, 0, 0, 0], np.float32),
                np.asarray([-rig.baseline, 0, 0], np.float32))
    traj1 = trajmod.apply_right(traj0, se3.inverse(T_1_0))
    T_rv_w = pipeline.place_reference_view(traj0, 0.5)

    # Truncate every camera to a multiple of (2 procs x local quantum) so
    # the two halves need zero padding events.
    quantum = 2 * (MESH_EVENT // 2) * PACKET
    evs = [ev.slice(0, (ev.num // quantum) * quantum) for ev in (ev0, ev1)]
    assert all(ev.num >= quantum for ev in evs), "fixture too small"
    return mappers, evs, [traj0, traj1], T_rv_w


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.distributed.initialize(f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)
    except Exception as e:  # backend unavailable in this environment
        print(f"DISTRIBUTED-UNAVAILABLE: {e}", file=sys.stderr)
        sys.exit(42)

    import numpy as np

    from dvs_mcemvs_tpu.parallel import make_mesh, sharded

    assert jax.process_count() == nproc
    assert len(jax.devices()) == MESH_EVENT * MESH_PLANE

    mappers, evs, trajs, T_rv_w = build_inputs()
    # This process's half of each camera's (time-sorted) stream.
    half = [ev.slice(pid * ev.num // nproc, (pid + 1) * ev.num // nproc)
            for ev in evs]

    mesh = make_mesh(MESH_EVENT, MESH_PLANE)
    spec = sharded.rig_spec_from_mappers(mappers)
    cfg = sharded.ShardedStepConfig(fusion_method=2, packet_size=PACKET)
    step = sharded.make_sharded_step(mesh, spec, cfg)
    args = sharded.sharded_step_inputs_multihost(
        mesh, mappers, half, trajs, T_rv_w, packet_size=PACKET)
    out = step(*args)

    # Replicated outputs: any addressable shard is a full replica.
    depth = np.asarray(out["depth"].addressable_shards[0].data)
    conf = np.asarray(out["confidence"].addressable_shards[0].data)
    didx = np.asarray(out["depth_indices"].addressable_shards[0].data)
    # Plane-sharded DSI: every process addresses all plane blocks (plane is
    # the intra-process mesh axis), so process 0 can reassemble it whole.
    dsi = np.zeros(out["dsi"].shape, np.float32)
    for sh in out["dsi"].addressable_shards:
        dsi[sh.index] = np.asarray(sh.data)

    if pid == 0:
        np.savez(out_path, depth=depth, confidence=conf,
                 depth_indices=didx, dsi=dsi)
    # Make sure both processes stay alive until proc 0 has written.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
