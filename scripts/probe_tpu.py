"""Platform microbenchmarks behind docs/performance.md's measured ceilings.

Four probes that separate the resources a Pallas kernel can actually be
bound by on this chip — numbers the naive MXU/HBM roofline doesn't carry:

  1. vmem-copy:    VMEM read/write bandwidth through a scratch round trip
  2. step:         empty-grid-step overhead (pipeline bookkeeping)
  3. hbm-cycle:    per-block HBM fetch rate for ~1 MB grid blocks (the
                   access pattern of the resample kernels' source blocks)
  4. dyn-slice:    dynamic-slice VMEM traffic (band reads / strip writes)

Plus the host link (device_put / np.asarray at 1-16 MB), which bounds any
host-streamed chunk loop.  Usage: python scripts/probe_tpu.py
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def force(o):
        return float(o[(0,) * o.ndim])

    tiny = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros((8, 128))
    force(tiny(z))
    s = []
    for _ in range(5):
        t0 = time.perf_counter()
        force(tiny(z))
        s.append(time.perf_counter() - t0)
    rtt = float(np.median(s))
    print(f"dispatch rtt: {rtt*1e3:.1f} ms", flush=True)

    def timeit(fn, args, min_time=1.5):
        out = fn(*args)
        force(out)
        t0 = time.perf_counter()
        force(fn(*args))
        dt0 = max(time.perf_counter() - t0 - rtt, 1e-5)
        iters = int(np.clip(math.ceil(min_time / dt0), 5, 5000))
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(*args)
            force(o)
            runs.append((time.perf_counter() - t0 - rtt) / iters)
        return max(min(runs), 1e-9)

    H, W = 576, 896  # the voting grid's padded histogram block

    # 1. VMEM copy bandwidth
    R = 4

    def kern_c(a_ref, o_ref, scr):
        for _ in range(R):
            scr[:, :] = a_ref[0] * 1.0001
            o_ref[0] = scr[:, :] * 1.0001

    @jax.jit
    def run_c(a):
        return pl.pallas_call(
            kern_c, grid=(64,),
            in_specs=[pl.BlockSpec((1, H, W), lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W), lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, W), jnp.float32)])(a)

    a32 = jnp.ones((1, H, W), jnp.float32)
    dt = timeit(run_c, (a32,))
    traffic = 64 * R * H * W * 4 * 4
    print(f"vmem copy: {traffic/dt/1e12:.2f} TB/s", flush=True)

    # 2. grid-step overhead
    def kern_e(a_ref, o_ref):
        o_ref[0, 0] = a_ref[0, 0] + 1.0

    @jax.jit
    def run_e(a):
        return pl.pallas_call(
            kern_e, grid=(4096,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32))(a)

    dt = timeit(run_e, (jnp.ones((1, 8, 128), jnp.float32),))
    print(f"grid-step overhead: {dt/4096*1e9:.0f} ns/step", flush=True)

    # 3. per-block HBM fetch rate
    G = 256
    big = jnp.ones((G, H, W), jnp.bfloat16)

    def kern_f(a_ref, o_ref):
        o_ref[0] += a_ref[0].astype(jnp.float32)

    @jax.jit
    def run_f(a):
        return pl.pallas_call(
            kern_f, grid=(G,),
            in_specs=[pl.BlockSpec((1, H, W), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W), lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H, W), jnp.float32))(a)

    dt = timeit(run_f, (big,))
    print(f"hbm block stream: {G*H*W*2/dt/1e9:.0f} GB/s "
          f"({dt/G*1e6:.1f} us per {H*W*2/2**20:.1f} MB block)", flush=True)

    # 4. dynamic-slice VMEM traffic
    QV = 168

    def kern_d(a_ref, o_ref, scr):
        for r in range(20):
            q = pl.multiple_of(((r * 29) % (H - QV) // 8) * 8, 8)
            scr[pl.ds(0, QV), :] = a_ref[0, pl.ds(q, QV), :]
            o_ref[0, pl.ds(0, QV), :] += scr[pl.ds(0, QV), :]

    @jax.jit
    def run_d(a):
        return pl.pallas_call(
            kern_d, grid=(64,),
            in_specs=[pl.BlockSpec((1, H, W), lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W), lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((QV, W), jnp.float32)])(a)

    dt = timeit(run_d, (a32,))
    tr = 64 * 20 * QV * W * 4 * 3
    print(f"dyn-slice: {tr/dt/1e12:.2f} TB/s effective", flush=True)

    # 5. host link
    for mb in (1, 4, 16):
        x = np.ones(mb * 1024 * 1024 // 4, np.float32)
        d = jax.device_put(x)
        d.block_until_ready()
        ups, downs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            dd = jax.device_put(x)
            dd.block_until_ready()
            ups.append(mb / (time.perf_counter() - t0))
            t0 = time.perf_counter()
            np.asarray(dd)
            downs.append(mb / (time.perf_counter() - t0))
        print(f"host link {mb:2d} MB: up {max(ups):5.0f} MB/s, "
              f"down {max(downs):5.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
