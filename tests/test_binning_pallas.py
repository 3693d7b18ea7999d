"""The fused Pallas binning kernel must match the XLA one-hot matmul."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvs_mcemvs_tpu.kernels.binning_pallas import bin_events_pallas


def _reference_hist(hx, hy, w, hs, ws):
    G, E = hx.shape
    out = np.zeros((G, hs, ws), np.float64)
    for g in range(G):
        for e in range(E):
            x, y, we = hx[g, e], hy[g, e], w[g, e]
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            fx, fy = x - x0, y - y0
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < hs and 0 <= xx < ws:
                        out[g, yy, xx] += we * wy * wx
    return out


@pytest.mark.parametrize("int8", [False, True])
def test_matches_reference(int8):
    rng = np.random.default_rng(0)
    G, E, hs, ws = 3, 256, 16, 128
    hx = jnp.asarray(rng.uniform(0, ws - 1, (G, E)), jnp.float32)
    hy = jnp.asarray(rng.uniform(0, hs - 1, (G, E)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.0, 1.0, (G, E)), jnp.float32)

    got = np.asarray(bin_events_pallas(hx, hy, w, hs=hs, ws=ws,
                                       int8=int8, interpret=True))
    want = _reference_hist(np.asarray(hx), np.asarray(hy), np.asarray(w), hs, ws)
    assert got.shape == (G, hs, ws)
    # Mass conservation and per-bin agreement (int8 taps quantize to 1/127).
    np.testing.assert_allclose(got.sum(), want.sum(), rtol=2e-2 if int8 else 5e-3)
    tol = 3e-2 if int8 else 1e-2
    assert np.max(np.abs(got - want)) < tol


def test_multiblock_accumulation():
    """Accumulation across event blocks equals a single-block pass."""
    rng = np.random.default_rng(1)
    G, E, hs, ws = 2, 2048, 16, 128
    hx = jnp.asarray(rng.uniform(0, ws - 1, (G, E)), jnp.float32)
    hy = jnp.asarray(rng.uniform(0, hs - 1, (G, E)), jnp.float32)
    w = jnp.ones((G, E), jnp.float32)
    multi = np.asarray(bin_events_pallas(hx, hy, w, hs=hs, ws=ws,
                                         event_block=1024, interpret=True))
    single = np.asarray(bin_events_pallas(hx, hy, w, hs=hs, ws=ws,
                                          event_block=2048, interpret=True))
    np.testing.assert_allclose(multi, single, rtol=1e-4, atol=1e-4)


def test_zero_weight_events_ignored():
    rng = np.random.default_rng(2)
    G, E, hs, ws = 1, 256, 16, 128
    hx = jnp.asarray(rng.uniform(0, ws - 1, (G, E)), jnp.float32)
    hy = jnp.asarray(rng.uniform(0, hs - 1, (G, E)), jnp.float32)
    w = np.ones((G, E), np.float32)
    w[:, E // 2:] = 0.0
    full = np.asarray(bin_events_pallas(hx, hy, jnp.asarray(w), hs=hs, ws=ws,
                                        interpret=True))
    half = np.asarray(bin_events_pallas(hx[:, :E // 2], hy[:, :E // 2],
                                        jnp.ones((G, E // 2), jnp.float32),
                                        hs=hs, ws=ws, interpret=True))
    np.testing.assert_allclose(full, half, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("dist", ["uniform", "bimodal", "point", "edge"])
def test_windowed_matches_dense(int8, dist):
    """Sorted-window binning is exact for any event distribution."""
    from dvs_mcemvs_tpu.kernels.binning_pallas import bin_events_pallas_windowed

    rng = np.random.default_rng(7)
    G, E, hs, ws = 2, 2048, 192, 256
    if dist == "uniform":
        hy = rng.uniform(0, hs - 1, (G, E))
    elif dist == "bimodal":  # straddles a huge row gap
        hy = np.where(rng.random((G, E)) < 0.5,
                      rng.uniform(0, 8, (G, E)),
                      rng.uniform(hs - 9, hs - 1, (G, E)))
    elif dist == "point":    # everything in one strip
        hy = np.full((G, E), 100.25)
    else:                    # at the top clip boundary
        hy = np.full((G, E), hs - 1.0)
    hx = jnp.asarray(rng.uniform(0, ws - 1, (G, E)), jnp.float32)
    hy = jnp.asarray(hy, jnp.float32)
    w = jnp.asarray(rng.uniform(0.0, 1.0, (G, E)), jnp.float32)

    dense = np.asarray(bin_events_pallas(hx, hy, w, hs=hs, ws=ws,
                                         int8=int8, interpret=True))
    windowed = np.asarray(bin_events_pallas_windowed(
        hx, hy, w, hs=hs, ws=ws, int8=int8, interpret=True))
    np.testing.assert_allclose(windowed, dense, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dist", ["uniform", "bimodal"])
def test_windowed_binary_w_matches_general(dist):
    """Sign-packed binary-weight path ≡ general path for 0/1 weights."""
    from dvs_mcemvs_tpu.kernels.binning_pallas import bin_events_pallas_windowed

    rng = np.random.default_rng(11)
    G, E, hs, ws = 2, 1500, 192, 256  # E not a block multiple: padding too
    if dist == "uniform":
        hy = rng.uniform(0, hs - 1, (G, E))
    else:
        hy = np.where(rng.random((G, E)) < 0.5,
                      rng.uniform(0, 8, (G, E)),
                      rng.uniform(hs - 9, hs - 1, (G, E)))
    hx = jnp.asarray(rng.uniform(0, ws - 1, (G, E)), jnp.float32)
    hy = jnp.asarray(hy, jnp.float32)
    w = jnp.asarray((rng.random((G, E)) < 0.8).astype(np.float32))
    general = np.asarray(bin_events_pallas_windowed(
        hx, hy, w, hs=hs, ws=ws, interpret=True))
    packed = np.asarray(bin_events_pallas_windowed(
        hx, hy, w, hs=hs, ws=ws, binary_w=True, interpret=True))
    np.testing.assert_allclose(packed, general, rtol=1e-5, atol=1e-5)


def test_windowed_pads_to_block():
    """Non-multiple-of-block streams pad with zero-weight tail events."""
    from dvs_mcemvs_tpu.kernels.binning_pallas import bin_events_pallas_windowed

    rng = np.random.default_rng(8)
    G, E, hs, ws = 1, 1500, 64, 128
    hx = jnp.asarray(rng.uniform(0, ws - 1, (G, E)), jnp.float32)
    hy = jnp.asarray(rng.uniform(0, hs - 1, (G, E)), jnp.float32)
    w = jnp.ones((G, E), jnp.float32)
    got = np.asarray(bin_events_pallas_windowed(hx, hy, w, hs=hs, ws=ws,
                                                interpret=True))
    np.testing.assert_allclose(got.sum(), E, rtol=1e-3)


def test_hist_backend_pallas_engine_matches_xla():
    """build_group_histograms(engine='pallas') ≡ engine='xla'."""
    from dvs_mcemvs_tpu.ops.voting import WarpedPackets
    from dvs_mcemvs_tpu.ops.voting_hist import build_group_histograms

    rng = np.random.default_rng(3)
    K, P = 8, 128
    xy = rng.uniform(-10, 120, (K, P, 2)).astype(np.float32)
    centers = rng.normal(0, 0.01, (K, 3)).astype(np.float32)
    packets = WarpedPackets(
        xy_z0=jnp.asarray(xy),
        centers=jnp.asarray(centers),
        valid=jnp.ones((K,), bool),
        weight=jnp.ones((K, P), jnp.float32),
    )
    kw = dict(group_size=4, hs=48, ws=256, pad_x=8, pad_y=4, ss=1)
    h_x, c_x = build_group_histograms(packets, **kw, engine="xla")
    h_p, c_p = build_group_histograms(packets, **kw, engine="pallas")
    np.testing.assert_allclose(np.asarray(c_x), np.asarray(c_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_x), np.asarray(h_p),
                               rtol=2e-2, atol=2e-2)
