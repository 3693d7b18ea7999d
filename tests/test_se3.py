import numpy as np
import jax.numpy as jnp
import pytest

from dvs_mcemvs_tpu.ops import se3
from dvs_mcemvs_tpu.ops.se3 import SE3


def rand_se3(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=n + (3,))
    return SE3(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))


def test_compose_inverse_identity():
    rng = np.random.default_rng(0)
    T = rand_se3(rng, (5,))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.abs(np.asarray(I.q[:, 0])), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)


def test_matrix_roundtrip():
    rng = np.random.default_rng(1)
    T = rand_se3(rng, (16,))
    M = se3.to_matrix(T)
    T2 = se3.from_matrix(M)
    # Quaternion sign canonicalized; compare rotation matrices.
    np.testing.assert_allclose(
        np.asarray(se3.quat_to_matrix(T2.q)),
        np.asarray(se3.quat_to_matrix(T.q)),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-6)


def test_transform_points_matches_matrix():
    rng = np.random.default_rng(2)
    T = rand_se3(rng)
    p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    got = se3.transform_points(T, p)
    M = np.asarray(se3.to_matrix(T))
    want = p @ M[:3, :3].T + M[:3, 3]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    tw = jnp.asarray(rng.normal(size=(8, 6)) * 0.5, jnp.float32)
    T = se3.se3_exp(tw)
    tw2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(tw2), np.asarray(tw), atol=1e-4)


def test_exp_log_small_angle():
    tw = jnp.asarray([[1e-8, 0, 0, 0.1, 0.2, 0.3]], jnp.float32)
    T = se3.se3_exp(tw)
    np.testing.assert_allclose(np.asarray(T.t[0]), [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(se3.se3_log(T)[0]), np.asarray(tw[0]), atol=1e-6)


def test_interpolate_endpoints_and_midpoint():
    rng = np.random.default_rng(4)
    T0, T1 = rand_se3(rng), rand_se3(rng)
    for alpha, ref in [(0.0, T0), (1.0, T1)]:
        Ti = se3.interpolate(T0, T1, jnp.float32(alpha))
        np.testing.assert_allclose(
            np.asarray(se3.quat_to_matrix(Ti.q)),
            np.asarray(se3.quat_to_matrix(ref.q)),
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(Ti.t), np.asarray(ref.t), atol=1e-4)
    # Midpoint: T0 * exp(0.5 log(T0^-1 T1)) — doubling the half-step from T0
    # must land on T1.
    Tm = se3.interpolate(T0, T1, jnp.float32(0.5))
    half = se3.compose(se3.inverse(T0), Tm)
    full = se3.compose(Tm, half)
    np.testing.assert_allclose(
        np.asarray(se3.quat_to_matrix(full.q)),
        np.asarray(se3.quat_to_matrix(T1.q)),
        atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(full.t), np.asarray(T1.t), atol=1e-4)


def test_rotation_matches_scipy():
    pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(5)
    q = rng.normal(size=(6, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(se3.quat_to_matrix(jnp.asarray(q, jnp.float32)))
    # scipy uses xyzw ordering.
    theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
