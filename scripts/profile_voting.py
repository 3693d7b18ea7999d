"""Stage-by-stage timing of the hist voting backend on the bench workload.

Times warp / binning / merge / sweep separately so optimization effort goes
where the milliseconds are.  Not part of the product; a development tool.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def timeit(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from dvs_mcemvs_tpu.ops import camera as camops, trajectory as trajmod, voting
    from dvs_mcemvs_tpu.ops import voting_hist as vh
    from dvs_mcemvs_tpu.ops.se3 import SE3

    mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
    dev = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
           jnp.asarray(t, jnp.float32))

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    rect_params = camops.rect_static(mapper.cam)
    traj_consts = (traj.ts, traj.poses.q, traj.poses.t, T_rv_w.q, T_rv_w.t)

    @jax.jit
    def warp(x, y, t):
        trj = trajmod.Trajectory(traj_consts[0], SE3(traj_consts[1], traj_consts[2]))
        return voting.warp_events_to_z0(
            x, y, t, trj, SE3(traj_consts[3], traj_consts[4]), None, K_cam,
            Kv_inv, z0=z0, width=mapper.width, packet_size=1024, full=True,
            rect_params=rect_params)

    print(f"warp: {timeit(warp, *dev)*1e3:.2f} ms")
    packets = warp(*dev)

    G = 16
    ss = 1
    pad_x, pad_y = 128, 32
    hs = (mapper.height + 2 * pad_y) * ss
    ws = (mapper.width + 2 * pad_x) * ss
    ws += -ws % 128
    hs += -hs % 8
    u_all = 1.0 / np.asarray(mapper.depth_vec.depths())
    u_mid = 0.5 * (u_all.min() + u_all.max())
    corr = (z0, *vp, u_mid)

    def binning(pk, dtype):
        return vh.build_group_histograms(pk, G, hs, ws, pad_x, pad_y, ss,
                                         dtype=dtype, correction=corr)

    bin_bf16 = jax.jit(lambda pk: binning(pk, jnp.bfloat16))
    bin_i8 = jax.jit(lambda pk: binning(pk, jnp.int8))
    t_bin = timeit(bin_bf16, packets)
    print(f"binning bf16 (g{G}, {hs}x{ws}): {t_bin*1e3:.2f} ms")
    t_bin8 = timeit(bin_i8, packets)
    print(f"binning int8: {t_bin8*1e3:.2f} ms")

    hist, centers = bin_bf16(packets)
    hist = hist.astype(jnp.bfloat16)

    segments = 10
    useg = u_all[:10]
    u_mid_s = 0.5 * (useg.min() + useg.max())

    merge_pl = jax.jit(lambda h, c: vh.merge_leaf_histograms(
        h, c, segments, u_mid_s, z0, vp, pad_x, pad_y, ss,
        dtype=jnp.bfloat16, engine="pallas"))
    t_merge = timeit(merge_pl, hist, centers)
    print(f"merge (1 segment, {hist.shape[0]} leaves -> pallas): {t_merge*1e3:.2f} ms "
          f"(x{segments} segments = {t_merge*segments*1e3:.2f} ms)")

    hist_s, centers_s = merge_pl(hist, centers)
    dseg = depths[:10]

    sweep_pl = jax.jit(lambda h, c: vh._sweep_planes(
        h, c, dseg, z0, vp, mapper.width, mapper.height, pad_x, pad_y, ss,
        10, jnp.bfloat16, "pallas"))
    t_sweep = timeit(sweep_pl, hist_s, centers_s)
    print(f"sweep (1 segment, 10 planes x {hist_s.shape[0]} supergroups, pallas): "
          f"{t_sweep*1e3:.2f} ms (x{segments} = {t_sweep*segments*1e3:.2f} ms)")

    full = bench.make_step(mapper, traj, T_rv_w, "hist:g16,seg10,pl", 10)
    print(f"full step hist:g16,seg10,pl: {timeit(full, *dev)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
