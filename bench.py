"""Headline benchmark: DSI voting throughput (Mevents/s) on one chip.

Measures the framework's hot kernel — event warp + depth-plane voting into a
DSEC-sized DSI (640x480x100, the workload of
cfg/DSEC/interlaken_00_b_2/dsec.conf in the reference) — against the
driver-set target of 100 Mev/s per chip (BASELINE.md).  The reference
instruments the same number via its Mev/s log (process1.cpp:82-86).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MEV_S = 100.0

WIDTH, HEIGHT, DIM_Z = 640, 480, 100
N_EVENTS = 1_048_576  # 1 Mi events, packet-aligned
PACKET = 1024


def build_workload():
    import jax.numpy as jnp

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.mapper import DsiShape, make_mapper
    from dvs_mcemvs_tpu.ops.camera import PinholeCamera
    from dvs_mcemvs_tpu.ops import trajectory as trajmod
    from dvs_mcemvs_tpu.utils import synthetic

    cam = PinholeCamera(width=WIDTH, height=HEIGHT, fx=WIDTH * 0.9,
                        fy=WIDTH * 0.9, cx=WIDTH / 2, cy=HEIGHT / 2)
    rig = synthetic.SyntheticRig(cam=cam, baseline=0.6, travel=0.5,
                                 plane_depths=(4.0, 12.0))
    mapper = make_mapper(cam, DsiShape(dim_z=DIM_Z, min_depth=2.0,
                                       max_depth=40.0))

    rng = np.random.default_rng(1)
    pts = synthetic.make_scene(rig, rng, 40_000)
    ev = synthetic.simulate_events(rig, pts, 0, n_samples=40, rng=rng)
    # Tile the stream up to the fixed benchmark size (timestamps keep order
    # inside each tile; throughput is content-independent).
    reps = -(-N_EVENTS // ev.num)
    x = np.tile(ev.x, reps)[:N_EVENTS]
    y = np.tile(ev.y, reps)[:N_EVENTS]
    t = np.sort(np.tile(ev.t, reps)[:N_EVENTS], kind="stable")

    ts, q, p = synthetic.rig_poses(rig)
    traj = trajmod.from_arrays(ts, q, p)
    T_rv_w = pipeline.place_reference_view(traj, 0.5)
    return mapper, (x, y, t), traj, T_rv_w


def make_step(mapper, traj, T_rv_w, backend, plane_block):
    import jax
    import jax.numpy as jnp

    from dvs_mcemvs_tpu.ops import trajectory as trajmod, voting
    from dvs_mcemvs_tpu.ops.se3 import SE3

    from dvs_mcemvs_tpu.ops import camera as camops

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    traj_ts, traj_q, traj_t = traj.ts, traj.poses.q, traj.poses.t
    rv_q, rv_t = T_rv_w.q, T_rv_w.t
    rect_params = camops.rect_static(mapper.cam)
    splat = voting.resolve_backend(backend)

    @jax.jit
    def step(x, y, t):
        trj = trajmod.Trajectory(traj_ts, SE3(traj_q, traj_t))
        packets = voting.warp_events_to_z0(
            x, y, t, trj, SE3(rv_q, rv_t), None, K_cam, Kv_inv,
            z0=z0, width=mapper.width, packet_size=PACKET, full=True,
            rect_params=rect_params,
        )
        return splat(packets, depths, z0, vp, mapper.width, mapper.height,
                     plane_block=plane_block)

    return step


_RTT = None


def _tunnel_rtt():
    """Dispatch + scalar-readback round trip (tunneled TPUs: ~20 ms).

    block_until_ready can return before the device finishes on tunneled
    backends, so honest timing loops N dispatches, reads one scalar of the
    final output back (forcing completion), and subtracts this RTT once.
    """
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        tiny = jax.jit(lambda v: v + 1.0)
        z = jnp.zeros((8, 128))
        float(tiny(z)[0, 0])
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(tiny(z)[0, 0])
            samples.append(time.perf_counter() - t0)
        _RTT = float(np.median(samples))
    return _RTT


def time_step(step, dev_args, iters):
    out = step(*dev_args)
    float(out[0, 0, 0])  # warmup / compile / settle
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*dev_args)
        float(out[0, 0, 0])  # force completion of the whole chain
        runs.append((time.perf_counter() - t0 - _tunnel_rtt()) / iters)
    return max(min(runs), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    mapper, (x, y, t), traj, T_rv_w = build_workload()
    dev_args = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
                jnp.asarray(t, jnp.float32))

    # Candidate backends: the hist group size is bounded by the workload's
    # camera travel (see voting_hist.auto_group_size) so the throughput
    # number is taken at honest accuracy.
    from dvs_mcemvs_tpu.ops.voting_hist import auto_group_size
    g = auto_group_size(0.5, N_EVENTS // PACKET, WIDTH * 0.9, 2.0, 40.0)
    candidates = []
    for backend, plane_block in [(f"hist:g{g},seg16,bf,pl", 7),
                                 (f"hist:g{g},seg32,bf,pl", 4),
                                 (f"hist:g{g},ss2,seg16,bf,pl", 7),
                                 (f"hist:g{g},seg10,pl", 10),
                                 (f"hist:g{g},i8,seg16,bf,pl", 7)]:
        try:
            step = make_step(mapper, traj, T_rv_w, backend, plane_block)
            dt = time_step(step, dev_args, iters=5)
            candidates.append((dt, backend, plane_block, step))
        except Exception as e:
            # A broken candidate must be visible (a regression that breaks
            # every spec would otherwise die as an opaque empty-min).
            import traceback
            print(f"bench candidate {backend!r} failed: {e!r}",
                  file=sys.stderr)
            traceback.print_exc(file=sys.stderr)

    if not candidates:
        raise RuntimeError(
            "every bench candidate failed — see stderr for per-candidate "
            "tracebacks")
    dt0, backend, plane_block, step = min(candidates, key=lambda c: c[0])
    iters = max(10, min(100, int(2.0 / max(dt0, 1e-4))))
    dt = time_step(step, dev_args, iters=iters)
    mev_s = N_EVENTS / dt / 1e6

    print(json.dumps({
        "metric": "dsi_voting_throughput",
        "value": round(mev_s, 2),
        "unit": "Mev/s",
        "vs_baseline": round(mev_s / BASELINE_MEV_S, 3),
        "detail": {
            "backend": backend,
            "plane_block": plane_block,
            "dsi": [DIM_Z, HEIGHT, WIDTH],
            "events": N_EVENTS,
            "seconds_per_step": round(dt, 4),
            "device": str(jax.devices()[0].platform),
        },
    }))


if __name__ == "__main__":
    main()
