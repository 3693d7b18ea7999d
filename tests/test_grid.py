import numpy as np
import jax.numpy as jnp
import pytest

from dvs_mcemvs_tpu.ops import grid as g


@pytest.fixture
def grids():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(0.0, 10.0, size=(4, 8, 8)), jnp.float32)
    b = jnp.asarray(rng.uniform(0.0, 10.0, size=(4, 8, 8)), jnp.float32)
    return a, b


def _ref_hm(a, b, eps=1e-1):
    return 2 * a * b / (a + b + eps)


def test_pairwise_fusion_reference_semantics(grids):
    a, b = grids
    an, bn = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(np.asarray(g.fuse_min(a, b)), np.minimum(an, bn))
    np.testing.assert_allclose(np.asarray(g.fuse_max(a, b)), np.maximum(an, bn))
    np.testing.assert_allclose(
        np.asarray(g.fuse_harmonic_mean(a, b)), _ref_hm(an, bn), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g.fuse_geometric_mean(a, b)), np.sqrt(an * bn), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g.fuse_arithmetic_mean(a, b)), 0.5 * (an + bn), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g.fuse_rms(a, b)), np.sqrt(0.5 * (an * an + bn * bn)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g.fuse_ratio(a, b)), an / (np.abs(bn) + 1e-1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g.fuse_cubic_mean(a, b)),
        np.cbrt(0.5 * (an ** 3 + bn ** 3)),
        rtol=1e-5,
    )


def test_mean_inequality_chain(grids):
    """HM <= GM <= AM <= RMS <= max per voxel (up to fusion epsilons)."""
    a, b = grids
    hm = np.asarray(g.fuse_harmonic_mean(a, b, eps=0.0))
    gm = np.asarray(g.fuse_geometric_mean(a, b))
    am = np.asarray(g.fuse_arithmetic_mean(a, b))
    rms = np.asarray(g.fuse_rms(a, b))
    mx = np.asarray(g.fuse_max(a, b))
    assert (hm <= gm + 1e-5).all()
    assert (gm <= am + 1e-5).all()
    assert (am <= rms + 1e-5).all()
    assert (rms <= mx + 1e-5).all()


def test_nary_hm_recursion_matches_reference(grids):
    """The recursive n-ary HM update (cartesian3dgrid.h:130-139)."""
    a, b = grids
    c = jnp.asarray(np.random.default_rng(9).uniform(1, 5, size=a.shape), jnp.float32)
    two = g.fuse_harmonic_mean(a, b)
    three = g.fuse_harmonic_mean_nary(two, c, 3)
    an, bn, cn = np.asarray(a), np.asarray(b), np.asarray(c)
    t = _ref_hm(an, bn)
    alpha = t / 2.0
    want = 3 * alpha * cn / (alpha + cn + 1e-1)
    np.testing.assert_allclose(np.asarray(three), want, rtol=1e-5)
    # With eps -> 0 the recursion equals the true 3-ary harmonic mean.
    two0 = g.fuse_harmonic_mean(a, b, eps=0.0)
    three0 = g.fuse_harmonic_mean_nary(two0, c, 3, eps=0.0)
    true_hm = 3.0 / (1 / an + 1 / bn + 1 / cn)
    np.testing.assert_allclose(np.asarray(three0), true_hm, rtol=1e-4)


def test_streaming_hm_am_identities(grids):
    """Streaming accumulators equal batch results (process2.cpp:211-242)."""
    a, b = grids
    acc = jnp.zeros_like(a)
    for x in (a, b):
        acc = g.add_inverse(acc, x, eps=0.0)
    hm_stream = np.asarray(g.hm_from_sum_of_inv(acc, 2))
    np.testing.assert_allclose(
        hm_stream, np.asarray(g.fuse_harmonic_mean(a, b, eps=0.0)), rtol=1e-5
    )
    acc = jnp.zeros_like(a)
    for x in (a, b):
        acc = g.fuse_add(acc, x)
    np.testing.assert_allclose(
        np.asarray(g.am_from_sum(acc, 2)),
        np.asarray(g.fuse_arithmetic_mean(a, b)),
        rtol=1e-6,
    )


def test_collapse_max_ties_lowest_index():
    dsi = jnp.zeros((5, 3, 3), jnp.float32)
    dsi = dsi.at[2, 1, 1].set(7.0).at[4, 1, 1].set(7.0)
    conf, idx = g.collapse_max(dsi)
    assert conf[1, 1] == 7.0
    assert idx[1, 1] == 2  # std::max_element keeps the first maximum


def test_fuse_many_hm_three_matches_pairwise_chain(grids):
    a, b = grids
    c = a * 0.5 + 1.0
    via_many = g.fuse_many([a, b, c], g.FUSE_HM)
    via_chain = g.fuse_harmonic_mean_nary(g.fuse_harmonic_mean(a, b), c, 3)
    np.testing.assert_allclose(np.asarray(via_many), np.asarray(via_chain), rtol=1e-6)


def test_gaussian_blur_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, size=(24, 32)).astype(np.float32)
    ours = np.asarray(g.gaussian_blur(jnp.asarray(img), 0.5))
    theirs = cv2.GaussianBlur(img, (0, 0), 0.5, borderType=cv2.BORDER_REFLECT)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_sobel_and_laplacian_match_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(12)
    img = rng.uniform(0, 1, size=(20, 25)).astype(np.float32)
    gx = cv2.Sobel(img, cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(img, cv2.CV_32F, 0, 1)
    want = gx * gx + gy * gy
    got = np.asarray(g.sobel_grad_mag_sq(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    lap = cv2.Laplacian(img, cv2.CV_32F, ksize=5)
    got_l = np.asarray(g.laplacian5(jnp.asarray(img)))
    np.testing.assert_allclose(got_l, lap, atol=1e-3)


def test_focus_collapse_variants_run():
    rng = np.random.default_rng(13)
    dsi = jnp.asarray(rng.uniform(0, 5, size=(6, 16, 16)), jnp.float32)
    for method in range(-1, 5):
        conf, idx = g.collapse(dsi, method)
        assert conf.shape == (16, 16)
        assert idx.shape == (16, 16)
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 6).all()


def test_mean_square():
    dsi = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]], jnp.float32)
    assert float(g.mean_square(dsi)) == pytest.approx((1 + 4 + 9 + 16) / 4.0)


def test_laplacian3d_neumann_boundaries():
    # Constant grid -> zero Laplacian everywhere (incl. borders, thanks to
    # the edge-replicate Neumann convention of filter.cpp:85-90).
    dsi = jnp.full((4, 5, 6), 3.25, jnp.float32)
    np.testing.assert_allclose(np.asarray(g.laplacian3d(dsi)), 0.0, atol=1e-6)
    # Interior voxel: plain 6-neighbor stencil.
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, size=(5, 5, 5)).astype(np.float32)
    lap = np.asarray(g.laplacian3d(jnp.asarray(a)))
    want = (a[1, 2, 2] + a[3, 2, 2] + a[2, 1, 2] + a[2, 3, 2]
            + a[2, 2, 1] + a[2, 2, 3] - 6 * a[2, 2, 2])
    assert lap[2, 2, 2] == pytest.approx(want, abs=1e-5)


def test_diffuse_preserves_mass_and_smooths():
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, size=(6, 8, 8)).astype(np.float32)
    out = np.asarray(g.diffuse(jnp.asarray(a), sigma=0.8))
    # Neumann heat flow conserves total mass and shrinks variance.
    assert out.sum() == pytest.approx(a.sum(), rel=1e-4)
    assert out.var() < a.var()


def test_mean_std_and_moran_index():
    rng = np.random.default_rng(5)
    a = rng.normal(0, 2, size=(8, 10, 12)).astype(np.float32)
    m, sd = g.mean_std(jnp.asarray(a))
    assert float(m) == pytest.approx(a.mean(), abs=1e-5)
    assert float(sd) == pytest.approx(a.std(), rel=1e-4)
    # i.i.d. noise has ~zero spatial autocorrelation; a smoothed field is
    # strongly positively autocorrelated.
    i_noise = float(g.moran_index_gaussian_weights(jnp.asarray(a), 0.8))
    smooth = np.asarray(g.gaussian_blur_3d(jnp.asarray(a), 1.5))
    i_smooth = float(g.moran_index_gaussian_weights(jnp.asarray(smooth), 0.8))
    assert abs(i_noise) < 0.1
    assert i_smooth > 0.5


def test_fuse_harmonic_mean_of_local_focus():
    rng = np.random.default_rng(6)
    a = rng.uniform(0, 4, size=(4, 8, 8)).astype(np.float32)
    b = rng.uniform(0, 4, size=(4, 8, 8)).astype(np.float32)
    # Composition identity: HM-of-focus == HM applied to focused grids
    # (utils.cpp:155-181 builds exactly that pipeline).
    got = np.asarray(g.fuse_harmonic_mean_of_local_focus(
        jnp.asarray(a), jnp.asarray(b), focus_method=1))
    fa = g.local_focus_in_place(jnp.asarray(a), 1)
    fb = g.local_focus_in_place(jnp.asarray(b), 1)
    want = np.asarray(g.fuse_harmonic_mean(fa, fb))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # Variance mode (default) on a constant grid yields zero focus up to
    # f32 cancellation: E[x^2] - E[x]^2 on x=2 leaves ~2 ulps of 4
    # (~5e-7), and the sqrt amplifies that to ~7e-4 — tolerance must
    # cover it for any summation order of the blur taps.
    const = jnp.ones((3, 6, 6), jnp.float32) * 2.0
    f = np.asarray(g.local_focus_in_place(const, 0))
    assert np.allclose(f, 0.0, atol=1e-3)
