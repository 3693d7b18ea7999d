"""The committed sustained-throughput bench mode must actually run end to
end (stores -> full_seq -> worker-pool saves) — scaled down, on CPU."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_full_seq_sustained_smoke(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "WIDTH", 128)
    monkeypatch.setattr(bench, "HEIGHT", 96)
    monkeypatch.setattr(bench, "DIM_Z", 16)
    monkeypatch.setattr(bench, "N_EVENTS", 32768)
    monkeypatch.setattr(bench, "PACKET", 512)
    rep = bench.full_seq_sustained("hist:g4,seg4", plane_block=8,
                                   n_chunks=4, warmup=1)
    assert rep["chunks_timed"] == 3
    assert rep["events_per_chunk"] == 2 * 32768
    assert rep["mev_s"] > 0
    assert "saveDepthMaps" in rep["includes"]


def test_alg2_step_smoke(monkeypatch):
    import jax.numpy as jnp
    import numpy as np

    bench = _load_bench()
    monkeypatch.setattr(bench, "WIDTH", 128)
    monkeypatch.setattr(bench, "HEIGHT", 96)
    monkeypatch.setattr(bench, "DIM_Z", 16)
    monkeypatch.setattr(bench, "N_EVENTS", 16384)
    monkeypatch.setattr(bench, "PACKET", 512)
    mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
    step = bench.make_alg2_step(mapper, traj, T_rv_w, "hist:g4,seg4", 8)
    depth = step(jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
                 jnp.asarray(t, jnp.float32))
    d = np.asarray(depth)
    assert d.shape == (96, 128)
    assert np.isfinite(d[d > 0]).all() and (d > 0).sum() > 100
