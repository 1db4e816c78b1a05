"""SE(3) module tests.

Mirrors reference tests/unit_test_pinhole_transforms.py (round-trip and
matrix-equivalence checks) plus exp/log inverses and gradient sanity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_pose_tpu import se3
from robust_pose_tpu.ops import geometry


KEY = jax.random.PRNGKey(12345)


def test_exp_log_roundtrip():
    tau = jax.random.normal(KEY, (50, 6)) * 0.5
    g = se3.exp(tau)
    tau2 = se3.log(g)
    np.testing.assert_allclose(tau, tau2, rtol=1e-4, atol=1e-5)


def test_exp_log_small_angle():
    tau = jnp.zeros((3, 6)).at[1].set(1e-9).at[2, :3].set(0.3)
    g = se3.exp(tau)
    np.testing.assert_allclose(se3.log(g), tau, atol=1e-7)
    # identity exactly
    np.testing.assert_allclose(g[0], jnp.array([0, 0, 0, 0, 0, 0, 1.0]), atol=0)


def test_mul_inv_identity():
    g = se3.random(KEY, (20,), sigma=1.0)
    gi = se3.inv(g)
    prod = se3.mul(g, gi)
    np.testing.assert_allclose(prod[..., :3], 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.abs(prod[..., 6]), 1.0, atol=1e-5)


def test_transform_roundtrip_and_matrix_equivalence():
    # mirrors reference tests/unit_test_pinhole_transforms.py:24-33
    pcl = jnp.clip(jnp.abs(jax.random.uniform(KEY, (20, 180 * 18, 3))), 1e-4, 1.0)
    poses = se3.random(jax.random.PRNGKey(7), (20,))

    out = geometry.transform(pcl, poses)
    back = geometry.transform(out, se3.inv(poses))
    np.testing.assert_allclose(back, pcl, rtol=1e-3, atol=1e-5)

    hom = jnp.concatenate([pcl, jnp.ones((20, pcl.shape[1], 1))], axis=-1)
    out_mat = jnp.einsum(
        "bij,bnj->bni", se3.matrix(poses), hom,
        precision=jax.lax.Precision.HIGHEST)[..., :3]
    np.testing.assert_allclose(out_mat, out, rtol=1e-3, atol=1e-5)


def test_matrix_from_matrix_roundtrip():
    g = se3.random(KEY, (40,), sigma=2.0)
    m = se3.matrix(g)
    g2 = se3.from_matrix(m)
    # quaternion sign ambiguity: compare rotations via matrix
    np.testing.assert_allclose(se3.matrix(g2), m, atol=1e-5)


def test_scale_semantics():
    g = se3.random(KEY, (4,))
    s = se3.scale(g, 2.0)
    np.testing.assert_allclose(s[..., :3], 2.0 * g[..., :3])
    np.testing.assert_allclose(s[..., 3:], g[..., 3:])


def test_adjoint():
    # Adj(g) tau == log(g * exp(tau) * g^-1) for small tau
    g = se3.random(KEY, (8,), sigma=0.5)
    tau = 1e-2 * jax.random.normal(jax.random.PRNGKey(3), (8, 6))
    lhs = jnp.einsum("bij,bj->bi", se3.adjoint(g), tau)
    rhs = se3.log(se3.mul(se3.mul(g, se3.exp(tau)), se3.inv(g)))
    # exact in f64 (checked to 6e-12); f32 tolerance accounts for exp/mul/log
    # roundoff on near-identity elements plus the O(tau^2) BCH truncation
    np.testing.assert_allclose(lhs, rhs, rtol=1e-2, atol=2e-5)


def test_act_matches_matrix():
    g = se3.random(KEY, (5,))
    p = jax.random.normal(jax.random.PRNGKey(1), (5, 11, 3))
    out = se3.act(g[:, None, :], p)
    R = se3.matrix(g)[:, :3, :3]
    t = g[:, None, :3]
    ref = jnp.einsum("bij,bnj->bni", R, p) + t
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_grad_at_identity_no_nan():
    # where-safe small-angle branches must give finite grads at tau=0
    f = lambda tau: jnp.sum(se3.act(se3.exp(tau), jnp.ones((3,))))
    g = jax.grad(f)(jnp.zeros(6))
    assert jnp.all(jnp.isfinite(g))
    # and through log at identity
    f2 = lambda tau: jnp.sum(se3.log(se3.exp(tau)))
    g2 = jax.grad(f2)(jnp.zeros(6))
    assert jnp.all(jnp.isfinite(g2))


def test_transform_gradients_match_reference_analytic():
    """The reference hand-writes the backward (I | -out x) for pose grads
    (core/geometry/pinhole_transforms.py:33-55); JAX autodiff through
    se3.act under the same left-tangent parameterization must agree."""
    g = se3.random(KEY, (6,), sigma=0.3)
    pts = jax.random.normal(jax.random.PRNGKey(2), (6, 50, 3))

    def f(eps):
        return jnp.sum(se3.act(se3.retract(eps, g)[:, None, :], pts))

    auto = jax.grad(f)(jnp.zeros((6, 6)))
    out = se3.act(g[:, None, :], pts)
    # analytic: grad_eps = sum_n [I | -skew(out_n)]^T @ ones(3)
    ones = jnp.ones_like(out)
    analytic_v = jnp.sum(ones, axis=1)
    analytic_w = jnp.sum(jnp.cross(out, ones), axis=1)
    analytic = jnp.concatenate([analytic_v, analytic_w], axis=-1)
    np.testing.assert_allclose(auto, analytic, rtol=1e-3, atol=1e-4)


def test_image_ops():
    from robust_pose_tpu.ops.image import batched_dot_product, beye, image_gradient

    img = jnp.tile(jnp.arange(8.0)[None, None, None, :], (1, 1, 6, 1))
    g = image_gradient(img)
    assert g.shape == (1, 2, 6, 8)
    # horizontal ramp: d/dx = -8 under this Sobel orientation, d/dy = 0
    np.testing.assert_allclose(g[0, 0, 2:-2, 2:-2], -8.0, atol=1e-5)
    np.testing.assert_allclose(g[0, 1, 2:-2, 2:-2], 0.0, atol=1e-5)
    a = jnp.ones((2, 5, 3))
    assert batched_dot_product(a, a).shape == (2, 5, 1)
    assert beye(4, 6).shape == (4, 6, 6)
