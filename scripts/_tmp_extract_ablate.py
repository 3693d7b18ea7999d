"""Ablation timing of the extraction chain stages as single jits."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import bench
from dvs_mcemvs_tpu.ops import extract, grid as gridops

Z, H, W = 100, 480, 640
rng = np.random.default_rng(0)
dsi0 = jnp.asarray(rng.gamma(1.0, 2.0, (Z, H, W)), jnp.float32)
dsi1 = jnp.asarray(rng.gamma(1.0, 2.0, (Z, H, W)), jnp.float32)
opts = extract.DepthMapOptions()
depths = jnp.linspace(2.0, 40.0, Z)

f_hm = jax.jit(lambda a, b: gridops.fuse_harmonic_mean(a, b))
f_hm_collapse = jax.jit(lambda a, b: gridops.collapse_max(
    gridops.fuse_harmonic_mean(a, b)))
f_collapse = jax.jit(lambda g: gridops.collapse_max(g))

def upto_agt(a, b):
    conf, idx = gridops.collapse_max(gridops.fuse_harmonic_mean(a, b))
    c8 = extract.normalize_confidence(conf, opts.max_confidence)
    return extract.adaptive_threshold_mask(c8, 5, 5.0), idx

def full(a, b):
    conf, idx = gridops.collapse_max(gridops.fuse_harmonic_mean(a, b))
    res = extract.extract_from_collapsed(conf, idx, depths, opts)
    return res.depth

f_agt = jax.jit(upto_agt)
f_full = jax.jit(full)

fused = f_hm(dsi0, dsi1)

def t(f, args, iters=30):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        o = out[0] if isinstance(out, tuple) else out
        bench._force(o)
        best = min(best, (time.perf_counter() - t0 - bench._tunnel_rtt()) / iters)
    return best

for name, f, args in [
    ("hm only", f_hm, (dsi0, dsi1)),
    ("collapse only", f_collapse, (fused,)),
    ("hm+collapse fused", f_hm_collapse, (dsi0, dsi1)),
    ("hm+collapse+norm+agt", f_agt, (dsi0, dsi1)),
    ("hm+full extract", f_full, (dsi0, dsi1)),
]:
    print(f"{name:24s} {t(f, args)*1e3:7.3f} ms", flush=True)
