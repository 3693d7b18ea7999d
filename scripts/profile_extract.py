"""Bisect the extraction chain (collapse -> depth) on the TPU.

Companion to scripts/profile_chunk.py: times single-jit sub-chains of
extract.get_depth_map_from_dsi at DSEC dims (100x480x640) with enough
iterations to resolve sub-millisecond spans over the tunnel.

Usage:  python scripts/profile_extract.py
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
    from dvs_mcemvs_tpu.ops import extract, grid as gridops

    Z, H, W = 100, 480, 640
    rng = np.random.default_rng(0)
    dsi = jnp.asarray(rng.gamma(2.0, 1.0, (Z, H, W)).astype(np.float32))
    depths = jnp.asarray(np.linspace(2.0, 40.0, Z, dtype=np.float32))
    opts = extract.DepthMapOptions()
    print(f"device={jax.default_backend()}", flush=True)

    collapse = jax.jit(lambda g: gridops.collapse(g, -1))

    @jax.jit
    def collapse_norm_agt(g):
        conf, idx = gridops.collapse(g, -1)
        conf_u8 = extract.normalize_confidence(conf, opts.max_confidence)
        return extract.adaptive_threshold_mask(
            conf_u8, opts.adaptive_threshold_kernel_size,
            opts.adaptive_threshold_c), idx

    @jax.jit
    def full(g):
        return extract.get_depth_map_from_dsi(g, _DV(depths), opts).depth

    class _DV:
        def __init__(self, d):
            self._d = d

        def depths(self):
            return self._d

    conf, idx = collapse(dsi)
    mask, _ = collapse_norm_agt(dsi)

    @jax.jit
    def median_only(idx, mask):
        return extract.masked_median_filter_u8(
            idx.astype(jnp.float32), mask, opts.median_filter_size, levels=Z)

    @jax.jit
    def norm_agt_only(conf):
        conf_u8 = extract.normalize_confidence(conf, opts.max_confidence)
        return extract.adaptive_threshold_mask(
            conf_u8, opts.adaptive_threshold_kernel_size,
            opts.adaptive_threshold_c)

    def force(out):
        if isinstance(out, tuple):
            out = out[0]
        bench._force(out)

    def tstep(fn, args, iters=50):
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

    stages = [
        ("collapse only", collapse, (dsi,), 50),
        ("collapse+norm+agt", collapse_norm_agt, (dsi,), 50),
        ("norm+agt only", norm_agt_only, (conf,), 100),
        ("median only", median_only, (idx, mask), 100),
        ("full extract", full, (dsi,), 50),
    ]
    for name, fn, args, iters in stages:
        dt = tstep(fn, args, iters)
        print(f"{name:22s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
