import jax
import jax.numpy as jnp
import numpy as np

from gaus_slam_tpu.ops import se3


def _rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return se3.quat_normalize(q)


def test_quat_rotmat_roundtrip():
    qs = _rand_quats(jax.random.PRNGKey(0), 64)
    R = se3.quat_to_rotmat(qs)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    q2 = se3.rotmat_to_quat(R)
    # same rotation up to sign; rotmat_to_quat canonicalizes w >= 0
    R2 = se3.quat_to_rotmat(q2)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_quat_scale_invariance():
    q = jnp.array([0.3, -0.5, 0.2, 0.9])
    np.testing.assert_allclose(
        se3.quat_to_rotmat(q), se3.quat_to_rotmat(3.7 * q), atol=1e-6
    )


def test_quat_multiply_matches_matmul():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q1, q2 = _rand_quats(k1, 8), _rand_quats(k2, 8)
    R = se3.quat_to_rotmat(se3.quat_multiply(q1, q2))
    R12 = jnp.einsum("nij,njk->nik", se3.quat_to_rotmat(q1), se3.quat_to_rotmat(q2))
    np.testing.assert_allclose(R, R12, atol=1e-5)


def test_pose_matrix_and_invert():
    q = se3.quat_normalize(jnp.array([1.0, 0.2, -0.1, 0.05]))
    t = jnp.array([0.5, -1.0, 2.0])
    m = se3.pose_matrix(q, t)
    mi = se3.invert_se3(m)
    np.testing.assert_allclose(m @ mi, np.eye(4), atol=1e-6)
    q2, t2 = se3.pose_params_from_matrix(m)
    np.testing.assert_allclose(se3.pose_matrix(q2, t2), m, atol=1e-5)


def test_transform_points():
    m = se3.pose_matrix(jnp.array([1.0, 0.3, 0.0, 0.0]), jnp.array([1.0, 2.0, 3.0]))
    pts = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    got = se3.transform_points(m, pts)
    hom = jnp.concatenate([pts, jnp.ones((16, 1))], -1)
    want = (m @ hom.T).T[:, :3]
    np.testing.assert_allclose(got, want, atol=1e-5)
