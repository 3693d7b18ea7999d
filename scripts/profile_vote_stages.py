"""Stage breakdown of the hist/pl voting path on the device.

Times warp, binning, butterfly merge, and plane sweep as separate jits at
the bench workload (1 Mi events, DSEC dims), so optimization lands on the
dominant stage.

Usage: python scripts/profile_vote_stages.py [spec]
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
    from dvs_mcemvs_tpu.ops import camera as camops, trajectory as trajmod
    from dvs_mcemvs_tpu.ops import voting, voting_hist as vh
    from dvs_mcemvs_tpu.ops.se3 import SE3

    spec = sys.argv[1] if len(sys.argv) > 1 else "hist:g16,seg16,bf,pl"
    kw = {}
    for tok in spec.partition(":")[2].split(","):
        if tok.startswith("seg"):
            kw["segments"] = int(tok[3:])
        elif tok.startswith("g"):
            kw["group"] = int(tok[1:])
    group, segments = kw.get("group", 16), kw.get("segments", 16)

    mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
    dev_args = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
                jnp.asarray(t, jnp.float32))
    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    fx, fy, cx, cy = vp
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    rect_params = camops.rect_static(mapper.cam)
    pad_x, pad_y, ss = 128, 32, 1
    hs = (mapper.height + 2 * pad_y) * ss
    ws = (mapper.width + 2 * pad_x) * ss
    ws += -ws % 128
    hs += -hs % 64
    print(f"device={jax.default_backend()} spec={spec} "
          f"g={group} seg={segments} grid=({hs},{ws})", flush=True)

    @jax.jit
    def warp(x, y, t):
        return voting.warp_events_to_z0(
            x, y, t, traj, T_rv_w, None, K_cam, Kv_inv, z0=z0,
            width=mapper.width, packet_size=bench.PACKET, full=True,
            rect_params=rect_params)

    packets = warp(*dev_args)
    u_all = 1.0 / depths
    u_mid = 0.5 * (jnp.min(u_all) + jnp.max(u_all))

    @jax.jit
    def binning(packets):
        h, c = vh.build_group_histograms(
            packets, group, hs, ws, pad_x, pad_y, ss, dtype=jnp.bfloat16,
            correction=(z0, fx, fy, cx, cy, u_mid), engine="pallas")
        return h.astype(jnp.bfloat16), c

    hist, centers = binning(packets)
    Z = int(depths.shape[0])
    bounds = [round(s * Z / segments) for s in range(segments + 1)]

    @jax.jit
    def merge(hist, centers):
        return vh._merge_butterfly(hist, centers, depths, bounds, z0, vp,
                                   pad_x, pad_y, ss, jnp.bfloat16)

    hist_seg, centers_s = merge(hist, centers)

    @jax.jit
    def sweep(hist_seg, centers_s):
        return vh._sweep_planes_fanin(
            hist_seg, centers_s, depths, bounds, z0, vp,
            mapper.width, mapper.height, pad_x, pad_y, ss)

    dsi = sweep(hist_seg, centers_s)
    print(f"dsi sum={float(dsi.sum()):.1f}", flush=True)

    def force(out):
        if isinstance(out, tuple):
            out = out[0]
        bench._force(out)

    def tstep(fn, args, iters=20):
        out = fn(*args)
        force(out)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            force(out)
            runs.append((time.perf_counter() - t0 - bench._tunnel_rtt())
                        / iters)
        return min(runs)

    for name, fn, args in [("warp", warp, dev_args),
                           ("binning", binning, (packets,)),
                           ("merge (butterfly)", merge, (hist, centers)),
                           ("sweep", sweep, (hist_seg, centers_s))]:
        dt = tstep(fn, args)
        print(f"{name:18s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
