"""Pure-JAX SE(3) Lie-group operations.

TPU-native replacement for the reference's native lietorch dependency
(reference: core/pose/pose_net.py:3, core/pose/pose_estimator.py:8 import
``lietorch.SE3``).  Conventions are chosen for drop-in data compatibility:

* Group elements are stored as 7-vectors ``[tx, ty, tz, qx, qy, qz, qw]``
  (translation + unit quaternion, scalar last) — the same layout lietorch's
  ``SE3.vec()`` uses and the TUM/Freiburg trajectory format stores
  (reference: core/utils/trajectory.py:38-62).
* Tangent vectors are 6-vectors ``[v, w]`` with the translational part first
  (lietorch convention, visible in the analytic Jacobian ``(I | -out×)`` of
  reference core/geometry/pinhole_transforms.py:40-41).
* Increments are **left-multiplicative**: ``retract(eps, X) = exp(eps) * X``,
  matching lietorch's ``LieGroupParameter`` retraction that the reference's
  LBFGS solver steps in (reference: core/pose/pose_head.py:68-70).

All functions are shape-polymorphic over leading batch dimensions and safe to
differentiate (small-angle branches use the where/where trick so gradients at
the identity are exact, not NaN).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8


def _safe_sqrt(x: Array) -> Array:
    """sqrt with a zero-safe gradient."""
    return jnp.sqrt(jnp.where(x > 0.0, x, 1.0)) * (x > 0.0)


# ---------------------------------------------------------------------------
# quaternion helpers (xyzw layout, scalar last)
# ---------------------------------------------------------------------------

def quat_mul(q1: Array, q2: Array) -> Array:
    """Hamilton product of two xyzw quaternions."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: Array, p: Array) -> Array:
    """Rotate points ``p (..., 3)`` by xyzw quaternions ``q (..., 4)``."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, p)
    return p + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: Array) -> Array:
    """xyzw quaternion -> (..., 3, 3) rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def quat_from_matrix(m: Array) -> Array:
    """(..., 3, 3) rotation matrix -> xyzw quaternion (jittable, branch-free).

    Uses the max-trace variant selection expressed with where() so it is
    differentiable and batch-friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best per element
    qw_sq = jnp.maximum(1.0 + tr, 0.0)
    qx_sq = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy_sq = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz_sq = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # candidate 0: w dominant
    s0 = 2.0 * _safe_sqrt(qw_sq)
    c0 = jnp.stack([(m21 - m12) / jnp.maximum(s0, _EPS),
                    (m02 - m20) / jnp.maximum(s0, _EPS),
                    (m10 - m01) / jnp.maximum(s0, _EPS),
                    0.25 * s0], axis=-1)
    # candidate 1: x dominant
    s1 = 2.0 * _safe_sqrt(qx_sq)
    c1 = jnp.stack([0.25 * s1,
                    (m01 + m10) / jnp.maximum(s1, _EPS),
                    (m02 + m20) / jnp.maximum(s1, _EPS),
                    (m21 - m12) / jnp.maximum(s1, _EPS)], axis=-1)
    # candidate 2: y dominant
    s2 = 2.0 * _safe_sqrt(qy_sq)
    c2 = jnp.stack([(m01 + m10) / jnp.maximum(s2, _EPS),
                    0.25 * s2,
                    (m12 + m21) / jnp.maximum(s2, _EPS),
                    (m02 - m20) / jnp.maximum(s2, _EPS)], axis=-1)
    # candidate 3: z dominant
    s3 = 2.0 * _safe_sqrt(qz_sq)
    c3 = jnp.stack([(m02 + m20) / jnp.maximum(s3, _EPS),
                    (m12 + m21) / jnp.maximum(s3, _EPS),
                    0.25 * s3,
                    (m10 - m01) / jnp.maximum(s3, _EPS)], axis=-1)

    scores = jnp.stack([qw_sq, qx_sq, qy_sq, qz_sq], axis=-1)
    best = jnp.argmax(scores, axis=-1)[..., None]
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp_quat(w: Array) -> Array:
    """Rotation vector (..., 3) -> xyzw quaternion."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = _safe_sqrt(theta_sq)
    half = 0.5 * theta
    small = theta_sq < 1e-8
    # sin(theta/2)/theta, with Taylor fallback 1/2 - theta^2/48
    sinc_half = jnp.where(
        small,
        0.5 - theta_sq / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, theta),
    )
    qv = sinc_half * w
    qw = jnp.cos(half)
    return jnp.concatenate([qv, qw], axis=-1)


def so3_log(q: Array) -> Array:
    """xyzw quaternion -> rotation vector (..., 3)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # enforce positive scalar hemisphere for the shortest geodesic
    sign = jnp.where(qw < 0.0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    n = _safe_sqrt(n_sq)
    small = n_sq < 1e-12
    angle = 2.0 * jnp.arctan2(n, qw)
    # angle / n  with Taylor fallback 2/qw * (1 - n^2/(3 qw^2))
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(qw, _EPS) * (1.0 - n_sq / (3.0 * jnp.maximum(qw, _EPS) ** 2)),
        angle / jnp.where(small, 1.0, n),
    )
    return scale * qv


# ---------------------------------------------------------------------------
# SE(3) core API
# ---------------------------------------------------------------------------

def identity(shape=(), dtype=jnp.float32) -> Array:
    """Identity group element(s) with given leading batch shape."""
    base = jnp.zeros((*shape, 7), dtype=dtype)
    return base.at[..., 6].set(1.0)


def skew(w: Array) -> Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(*w.shape[:-1], 3, 3)


def _V_coeffs(theta_sq: Array):
    """Coefficients B=(1-cos)/t^2, C=(t-sin)/t^3 with small-angle fallbacks.

    The analytic branches cancel catastrophically in f32 well before they
    divide by zero (1-cos(t) loses ALL bits at t^2 ~ 2 eps), so the Taylor
    branch takes over at t^2 < 1e-2 where its truncation error (~t^4/720)
    is ~1e-7 — far below the f32 rounding of the analytic form there."""
    theta = _safe_sqrt(theta_sq)
    small = theta_sq < 1e-2
    safe = jnp.where(small, 1.0, theta_sq)
    B = jnp.where(
        small,
        0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0,
        (1.0 - jnp.cos(theta)) / safe,
    )
    C = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0,
        (theta - jnp.sin(theta)) / (safe * jnp.where(small, 1.0, theta)),
    )
    return B, C


def exp(tau: Array) -> Array:
    """SE(3) exponential: tangent (..., 6) [v, w] -> group (..., 7)."""
    v = tau[..., :3]
    w = tau[..., 3:6]
    q = so3_exp_quat(w)
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    B, C = _V_coeffs(theta_sq)
    wxv = jnp.cross(w, v)
    wxwxv = jnp.cross(w, wxv)
    t = v + B * wxv + C * wxwxv
    return jnp.concatenate([t, q], axis=-1)


def log(g: Array) -> Array:
    """SE(3) logarithm: group (..., 7) -> tangent (..., 6) [v, w]."""
    t = g[..., :3]
    q = g[..., 3:7]
    w = so3_log(q)
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    B, C = _V_coeffs(theta_sq)
    # V^-1 = I - 1/2 [w]x + D [w]x^2,  D = (1 - A/(2B)) / theta^2
    # with A = sin/t; small-angle D -> 1/12
    # D = (1 - (t/2)cot(t/2)) / t^2 cancels in f32 below t^2 ~ 1e-2 (the
    # numerator is ~t^2/12 against ~eps rounding of A/(2B)) — same widened
    # Taylor threshold as _V_coeffs; series 1/12 + t^2/720 + t^4/30240
    theta = _safe_sqrt(theta_sq)
    small = theta_sq < 1e-2
    safe = jnp.where(small, 1.0, theta_sq)
    A = jnp.where(
        small,
        1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0,
        jnp.sin(theta) / jnp.where(small, 1.0, theta),
    )
    D = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0,
        (1.0 - A / (2.0 * B)) / safe,
    )
    wxt = jnp.cross(w, t)
    wxwxt = jnp.cross(w, wxt)
    v = t - 0.5 * wxt + D * wxwxt
    return jnp.concatenate([v, w], axis=-1)


def mul(g1: Array, g2: Array) -> Array:
    """Group composition g1 * g2."""
    t1, q1 = g1[..., :3], g1[..., 3:7]
    t2, q2 = g2[..., :3], g2[..., 3:7]
    t = t1 + quat_rotate(q1, t2)
    q = quat_mul(q1, q2)
    return jnp.concatenate([t, q], axis=-1)


def inv(g: Array) -> Array:
    t, q = g[..., :3], g[..., 3:7]
    qi = quat_conj(q)
    return jnp.concatenate([-quat_rotate(qi, t), qi], axis=-1)


def act(g: Array, p: Array) -> Array:
    """Apply transform: g (..., 7) acting on points p (..., 3).

    Leading dims of g broadcast against leading dims of p.
    """
    t, q = g[..., :3], g[..., 3:7]
    return quat_rotate(q, p) + t


def matrix(g: Array) -> Array:
    """(..., 7) -> homogeneous (..., 4, 4)."""
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros((*g.shape[:-1], 1, 4), dtype=g.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m: Array) -> Array:
    """Homogeneous (..., 4, 4) -> (..., 7)."""
    q = quat_from_matrix(m[..., :3, :3])
    t = m[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def scale(g: Array, s) -> Array:
    """Scale the translation component (lietorch ``SE3.scale`` semantics,
    used to de-normalize depth scaling in reference core/pose/pose_estimator.py:90)."""
    t, q = g[..., :3], g[..., 3:7]
    return jnp.concatenate([t * s, q], axis=-1)


def normalize(g: Array) -> Array:
    """Re-normalize the quaternion part (drift control in long pose chains)."""
    t, q = g[..., :3], g[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q], axis=-1)


def adjoint(g: Array) -> Array:
    """(..., 7) -> (..., 6, 6) adjoint for [v, w]-ordered tangents."""
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(q)
    tR = jnp.matmul(skew(t), R, precision=jax.lax.Precision.HIGHEST)
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def retract(eps: Array, g: Array) -> Array:
    """Left-multiplicative retraction exp(eps) * g (lietorch LieGroupParameter)."""
    return mul(exp(eps), g)


def random(key: Array, shape=(), sigma: float = 1.0, dtype=jnp.float32) -> Array:
    """Random group elements ~ exp(N(0, sigma^2)) (lietorch ``SE3.Random`` analogue,
    used by reference tests tests/unit_test_pose_head.py:28)."""
    tau = sigma * jax.random.normal(key, (*shape, 6), dtype=dtype)
    return exp(tau)
