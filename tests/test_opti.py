import jax
import jax.numpy as jnp
import numpy as np

from taichislam_tpu.opti import transformations as tf
from taichislam_tpu.opti.nnls import NNLS, CostFunction


def random_unit_quat(rng, n=1):
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quaternion_matrix_rotate_agree():
    rng = np.random.default_rng(0)
    q = jnp.asarray(random_unit_quat(rng, 8))
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    Rv = jnp.einsum("bij,bj->bi", tf.quaternion_matrix(q), v)
    qv = tf.quaternion_rotate(q, v)
    np.testing.assert_allclose(np.asarray(Rv), np.asarray(qv), atol=1e-5)


def test_quaternion_multiply_inverse():
    rng = np.random.default_rng(1)
    q = jnp.asarray(random_unit_quat(rng, 4))
    ident = tf.quaternion_multiply(q, tf.quaternion_inverse(q))
    np.testing.assert_allclose(np.asarray(ident[..., :3]), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.abs(ident[..., 3])), 1,
                               atol=1e-6)


def test_retraction_small_angle():
    rng = np.random.default_rng(2)
    q = jnp.asarray(random_unit_quat(rng, 1))[0]
    d = jnp.asarray([1e-3, -2e-3, 5e-4], jnp.float32)
    q2 = tf.quaternion_retraction(q, d)
    # rotation difference should be approximately the axis-angle d
    dq = tf.quaternion_multiply(tf.quaternion_inverse(q), q2)
    np.testing.assert_allclose(np.asarray(dq[:3]) * 2, np.asarray(d),
                               atol=1e-6)
    assert abs(float(jnp.linalg.norm(q2)) - 1) < 1e-6


def test_plus_quaternion_jacobian_matches_autodiff():
    rng = np.random.default_rng(3)
    q = jnp.asarray(random_unit_quat(rng, 1))[0]
    J = tf.plus_quaternion_jacobian(q)
    J_auto = jax.jacobian(lambda d: tf.quaternion_retraction(q, d))(
        jnp.zeros(3, jnp.float32))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-5)


def test_quaternion_from_matrix_roundtrip():
    rng = np.random.default_rng(4)
    q = random_unit_quat(rng, 1)[0]
    R = tf.quaternion_matrix_np(q)
    q2 = tf.quaternion_from_matrix(R)
    if np.dot(q, q2) < 0:
        q2 = -q2
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_nnls_solves_linear_fit():
    rng = np.random.default_rng(5)
    xs = rng.normal(size=(50,)).astype(np.float32)
    ys = 2.0 * xs + 1.0

    nnls = NNLS()
    nnls.add_parameter_block("ab", np.zeros(2, np.float32))
    nnls.add_cost_function(CostFunction(
        lambda ab: ab[0] * xs + ab[1] - ys, ["ab"]))
    loss0, grad0 = nnls.evaluate_test()
    assert loss0 > 1.0 and np.linalg.norm(grad0) > 0
    out = nnls.solve_lm(iters=10)
    np.testing.assert_allclose(out["ab"], [2.0, 1.0], atol=1e-3)


def test_nnls_reprojection_ba():
    """Mini bundle adjustment: recover a camera rotation from reprojected
    points (the reference's BA demo objective, simple_gradient_descent_BA)."""
    rng = np.random.default_rng(6)
    pts = rng.uniform(-1, 1, size=(30, 3)).astype(np.float32) + \
        np.array([0, 0, 4], np.float32)
    q_true = np.array([0.05, -0.03, 0.02, 1.0], np.float32)
    q_true /= np.linalg.norm(q_true)
    uv_obs = None

    def project(q, pts):
        p = tf.quaternion_rotate(jnp.broadcast_to(q, (pts.shape[0], 4)),
                                 jnp.asarray(pts))
        return p[:, :2] / p[:, 2:3]

    uv_obs = np.asarray(project(jnp.asarray(q_true), pts))

    nnls = NNLS()
    nnls.add_parameter_block("q", np.array([0, 0, 0, 1], np.float32))
    nnls.add_cost_function(CostFunction(
        lambda q: (project(q / jnp.linalg.norm(q), pts) - uv_obs), ["q"]))
    out = nnls.solve_lm(iters=25)
    q_est = out["q"] / np.linalg.norm(out["q"])
    if np.dot(q_est, q_true) < 0:
        q_est = -q_est
    np.testing.assert_allclose(q_est, q_true, atol=1e-4)
