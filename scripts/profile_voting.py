"""Stage-by-stage timing of the hist voting backend on the bench workload.

Times warp / binning / merge / sweep separately so optimization effort goes
where the milliseconds are.  Not part of the product; a development tool.

Timing note: on the axon TPU tunnel `block_until_ready` returns before the
device finishes, and a host readback costs a ~20 ms round trip.  Honest
per-step time = (loop of N dispatches + one scalar readback - RTT) / N with
N large; RTT is measured on a trivial program first.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

_RTT = None


def _rtt():
    """One-time measurement of the dispatch+readback round trip."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        tiny = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128))
        float(tiny(x).sum())
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(tiny(x).sum())
            reps.append(time.perf_counter() - t0)
        _RTT = float(np.median(reps))
    return _RTT


def timeit(fn, *args, iters=30):
    """Median-of-3 honest per-call seconds for fn(*args)."""
    import jax.numpy as jnp

    out = fn(*args)
    first = jnp.asarray(jax.tree_util.tree_leaves(out)[0])
    float(first.reshape(-1)[0])  # compile + settle
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        runs.append((time.perf_counter() - t0 - _rtt()) / iters)
    return max(min(runs), 0.0)


import jax  # noqa: E402


def main():
    import jax.numpy as jnp

    from dvs_mcemvs_tpu.ops import camera as camops, trajectory as trajmod, voting
    from dvs_mcemvs_tpu.ops import voting_hist as vh
    from dvs_mcemvs_tpu.ops.se3 import SE3

    mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
    dev = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
           jnp.asarray(t, jnp.float32))
    print(f"tunnel RTT: {_rtt()*1e3:.1f} ms")

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    rect_params = camops.rect_static(mapper.cam)

    @jax.jit
    def warp(x, y, t):
        trj = trajmod.Trajectory(traj.ts, SE3(traj.poses.q, traj.poses.t))
        return voting.warp_events_to_z0(
            x, y, t, trj, SE3(T_rv_w.q, T_rv_w.t), None, K_cam, Kv_inv,
            z0=z0, width=mapper.width, packet_size=1024, full=True,
            rect_params=rect_params)

    print(f"warp: {timeit(warp, *dev)*1e3:.2f} ms")
    packets = warp(*dev)

    G, ss, pad_x, pad_y = 16, 1, 128, 32
    hs = (480 + 2 * pad_y) * ss
    ws = (640 + 2 * pad_x) * ss
    ws += -ws % 128
    hs += -hs % 64
    u_all = 1.0 / np.asarray(mapper.depth_vec.depths())
    corr = (z0, *vp, 0.5 * (u_all.min() + u_all.max()))

    for name, dt, eng in [("xla-bf16", jnp.bfloat16, "xla"),
                          ("pl-bf16", jnp.bfloat16, "pallas"),
                          ("pl-int8", jnp.int8, "pallas")]:
        fn = jax.jit(lambda pk, dt=dt, eng=eng: vh.build_group_histograms(
            pk, G, hs, ws, pad_x, pad_y, ss, dtype=dt, correction=corr,
            engine=eng))
        print(f"binning {name}: {timeit(fn, packets)*1e3:.2f} ms")

    for desc, kw in [
        ("g16,seg10,pl", dict(group_size=16, segments=10, engine="pallas",
                              plane_block=10)),
        ("g16,seg10,pl,i8bin", dict(group_size=16, segments=10,
                                    engine="pallas", plane_block=10,
                                    bin_dtype=jnp.int8)),
    ]:
        fn = jax.jit(lambda pk, kw=kw: vh.splat_hist(
            pk, depths, z0, vp, mapper.width, mapper.height, **kw))
        print(f"splat {desc}: {timeit(fn, packets)*1e3:.2f} ms")

    full = bench.make_step(mapper, traj, T_rv_w, "hist:g16,seg10,pl", 10)
    print(f"full step hist:g16,seg10,pl: {timeit(full, *dev)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
