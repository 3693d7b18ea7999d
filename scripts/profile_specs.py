"""Time the voting step on TPU for a list of backend specs.

Usage: python scripts/profile_specs.py [spec ...]
Defaults to the accuracy/speed frontier candidates of the auto spec.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DEFAULT_SPECS = [
    "hist:g16,seg16,bf,pl",
    "hist:g8,seg16,bf,pl",
    "hist:g8,seg8,bf,pl",
    "hist:g4,seg16,bf,pl",
    "hist:g8,seg16,pl",
]


def main():
    import jax
    import jax.numpy as jnp

    import bench

    specs = sys.argv[1:] or DEFAULT_SPECS
    mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
    dev_args = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
                jnp.asarray(t, jnp.float32))
    print(f"device={jax.default_backend()} events={bench.N_EVENTS}",
          flush=True)
    for spec in specs:
        try:
            t0 = time.time()
            step = bench.make_step(mapper, traj, T_rv_w, spec, 7)
            dt0 = bench.time_step(step, dev_args, iters=3)
            iters = max(10, min(60, int(1.5 / max(dt0, 1e-4))))
            dt = bench.time_step(step, dev_args, iters=iters)
            mev = bench.N_EVENTS / dt / 1e6
            print(f"{spec:26s} {dt*1e3:8.3f} ms  {mev:7.2f} Mev/s "
                  f"(total {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{spec:26s} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
