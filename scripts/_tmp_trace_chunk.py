"""Capture a jax.profiler trace of the full chunk step on TPU."""
import sys, time, glob, os
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import bench

mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
dev_args = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
            jnp.asarray(t, jnp.float32))
from dvs_mcemvs_tpu.ops.voting_hist import auto_backend_spec
backend = auto_backend_spec(0.5, bench.N_EVENTS // bench.PACKET,
                            bench.WIDTH * 0.9, 2.0, 40.0, bench.DIM_Z, True)
step = bench.make_full_chunk_step(mapper, traj, T_rv_w, backend, 7)
out = step(*dev_args)
jax.block_until_ready(out)

os.makedirs("/tmp/jtrace", exist_ok=True)
with jax.profiler.trace("/tmp/jtrace"):
    for _ in range(3):
        out = step(*dev_args)
    jax.block_until_ready(out)
print("trace done")
