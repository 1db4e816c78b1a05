"""Differentiable SE(3) pose solver: Levenberg-Marquardt forward, implicit-
function-theorem backward.

TPU-native replacement for the reference's declarative-network stack:

* forward: reference runs ``torch.optim.LBFGS`` in float64 driven by Python
  (core/pose/pose_head.py:60-79). Here the weighted nonlinear least-squares
  over 6 DoF is solved by Gauss-Newton/LM with **analytic per-pixel
  Jacobians**, batched normal-equation builds (one big (M x 6)^T (M x 6)
  contraction that XLA maps onto the MXU) and 6x6 solves, all inside a
  ``lax.fori_loop`` — a single compiled region, no host round-trips.
* backward: reference applies the implicit function theorem with row-by-row
  autograd Jacobians (core/optimization/declerative_node_lie.py:13-80,
  105-170). Here ``jax.hessian``/``jax.vjp`` of the same objective give the
  identical mathematical quantities in closed form:
  ``grad_x = -v^T H^{-1} (d^2 E / d xi d x)``.
* failure semantics preserved: zero gradients when the optimality condition
  fails or H is not positive definite / produces non-finite solves
  (reference declerative_node_lie.py:43-47, 59-62, 95-103), NaN scrubbing
  (ibid.:66, 76).

Tangent convention: left-multiplicative increments ``exp(eps) * T`` with
``[v, w]`` ordering — see robust_pose_tpu/se3.py.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from robust_pose_tpu import se3
from robust_pose_tpu.solver.objectives import (
    PoseProblemInputs,
    objective,
    objective_at_tangent,
)

Array = jax.Array
HIGHEST = jax.lax.Precision.HIGHEST


class SolverConfig(NamedTuple):
    iters: int = 20           # reference lbgfs_iters (configuration/infer_f2f.yaml)
    init_lambda: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.25
    eps_optimality: float = 1e-3  # reference DeclarativeNodeLie eps (pose_head.py:7)
    gamma: float = 0.0            # optional Hessian damping in backward
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # normal-equation build: "pallas" (fused TPU kernel,
    # ops/pallas_normal_eq.py — streams the pixel planes once per iteration
    # instead of materializing (B,N,2,6)/(B,N,3,6) Jacobians in HBM),
    # "xla" (einsum formulation), "auto" (pallas on TPU, xla on CPU)
    early_exit: bool = True   # stop once every batch sample converged: an
    # accepted step's tangent norm <= tol_step, or damping saturated (LM
    # stuck). The reference's torch.optim.LBFGS terminates early the same
    # way (tolerance_grad/tolerance_change defaults); iters stays the hard
    # cap — essential at the production f2m lbgfs_iters=100
    # (configuration/infer_scared.yaml:11).
    tol_step: float = 1e-6    # tangent-norm convergence threshold


# ---------------------------------------------------------------------------
# residuals + analytic Jacobians
# ---------------------------------------------------------------------------

def _residuals_and_jacobians(pose: Array, xs: PoseProblemInputs, img_coords: Array):
    """Build weighted residuals and their analytic Jacobians wrt a left tangent
    perturbation of ``pose``.

    Returns (r2 (B,N,2), J2 (B,N,2,6), c2 (B,N), r3 (B,N,3), J3 (B,N,3,6), c3 (B,N))
    such that  objective == sum_i c2_i |r2_i|^2 + sum_i c3_i |r3_i|^2.
    """
    b, h, w, _ = xs.flow.shape
    n = h * w
    K = xs.intrinsics  # (B, 3, 3)

    p1 = xs.pcl1.reshape(b, n, 3)                        # (B, N, 3)
    p2 = xs.pcl2.reshape(b, n, 3)                        # (B, N, 3)
    pp = se3.act(pose[:, None, :], p1)                   # (B, N, 3) transformed

    # ---- 2D reprojection term -------------------------------------------
    a = jnp.einsum("bij,bnj->bni", K, pp, precision=HIGHEST)               # (B, N, 3)
    z = jnp.clip(a[..., 2:3], 1e-12, None)
    pi = a[..., :2] / z                                  # projected pixel coords

    flow_off = img_coords[None, :, :2] + xs.flow.reshape(b, n, 2)
    r2 = pi - flow_off                                   # (B, N, 2)

    valid2 = (
        (flow_off[..., 0] > 0)
        & (flow_off[..., 1] > 0)
        & (flow_off[..., 0] < w)
        & (flow_off[..., 1] < h)
        & xs.mask1.reshape(b, n)
    )
    c2 = xs.loss_weight[:, 1:2] * xs.weights1.reshape(b, n) * valid2 * (1.0 / (float(n) * h * w))

    # d(pi)/d(pp) @ K = (K[:2] - pi (x) K[2]) / z  -> (B, N, 2, 3)
    K2 = K[:, None, :2, :]                               # (B, 1, 2, 3)
    K3 = K[:, None, None, 2, :]                          # (B, 1, 1, 3)
    M = (K2 - pi[..., None] * K3) / z[..., None]
    # left-tangent point Jacobian d(pp)/d(eps) = [I | -skew(pp)]
    # -> rows of J2[:, 3:] are cross(pp, m_row)
    J2 = jnp.concatenate([M, jnp.cross(pp[:, :, None, :], M)], axis=-1)  # (B,N,2,6)

    # ---- 3D point-to-point term -----------------------------------------
    r3 = pp - p2                                         # (B, N, 3)
    valid3 = (xs.mask1 & xs.mask2).reshape(b, n)
    c3 = xs.loss_weight[:, 0:1] * xs.weights2.reshape(b, n) * valid3 / n

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pose.dtype), (b, n, 3, 3))
    J3 = jnp.concatenate([eye, jnp.cross(pp[:, :, None, :], eye)], axis=-1)  # (B,N,3,6)

    return r2, J2, c2, r3, J3, c3


def _normal_equations(pose: Array, xs: PoseProblemInputs, img_coords: Array):
    """Weighted normal equations H = J^T W J, g = J^T W r, plus cost."""
    r2, J2, c2, r3, J3, c3 = _residuals_and_jacobians(pose, xs, img_coords)
    H = jnp.einsum("bn,bnri,bnrj->bij", c2, J2, J2, precision=HIGHEST) + jnp.einsum(
        "bn,bnri,bnrj->bij", c3, J3, J3, precision=HIGHEST
    )
    g = jnp.einsum("bn,bnri,bnr->bi", c2, J2, r2, precision=HIGHEST) + jnp.einsum(
        "bn,bnri,bnr->bi", c3, J3, r3, precision=HIGHEST
    )
    cost = jnp.sum(c2 * jnp.sum(r2 * r2, -1), -1) + jnp.sum(
        c3 * jnp.sum(r3 * r3, -1), -1
    )
    return H, g, cost


def _cost(pose: Array, xs: PoseProblemInputs, img_coords: Array) -> Array:
    return objective(xs, pose, img_coords)


# ---------------------------------------------------------------------------
# LM forward solve
# ---------------------------------------------------------------------------

def solve_pose(xs: PoseProblemInputs, img_coords: Array, cfg: SolverConfig):
    """Minimize the weighted 2D+3D objective over SE(3); returns
    ``(pose7, tau6, iters)`` where ``iters`` (B,) int32 is the REALIZED
    per-sample LM iteration count (benchmark evidence that early exit is not
    flattering the numbers — samples still unconverged at the cap report
    ``cfg.iters``).

    Functional analogue of reference ``DPoseSE3Head.solve``
    (core/pose/pose_head.py:60-79): starts at identity, fixed iteration count,
    batched over B. Runs entirely on device inside ``lax.fori_loop``.
    """
    b, h, w, _ = xs.flow.shape
    dtype = cfg.dtype
    xs = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, xs
    )
    eye6 = jnp.eye(6, dtype=dtype)

    impl = cfg.impl
    if impl == "auto":
        impl = "xla" if (jax.default_backend() == "cpu"
                         or dtype != jnp.float32) else "pallas"
    if impl == "pallas":
        from robust_pose_tpu.ops.pallas_normal_eq import (
            normal_equations_pallas,
            pack_planes,
        )
        # pre-transpose the loop-invariant pixel planes ONCE; each LM
        # iteration then runs the fused H/g/cost kernel
        planes, kvec = pack_planes(xs, h, w)

        def normal_eq(pose):
            return normal_equations_pallas(pose, planes, kvec,
                                           xs.loss_weight, h, w)
    else:
        def normal_eq(pose):
            return _normal_equations(pose, xs, img_coords)

    def propose(H, g, lam, pose):
        """LM step from (H, g) at ``pose`` with Marquardt diag damping.
        Returns (trial pose, tangent step)."""
        diag = jnp.einsum("bii->bi", H)
        Hd = H + (lam[:, None] * diag + 1e-12)[..., None] * eye6
        delta = -jnp.linalg.solve(Hd, g[..., None])[..., 0]
        delta = jnp.where(
            jnp.all(jnp.isfinite(delta), axis=-1)[:, None], delta, 0.0
        )
        return se3.retract(delta, pose), delta

    # deferred-acceptance LM: each iteration builds residuals exactly ONCE
    # (at the trial point); the accepted point's normal equations are cached
    # in the carry so rejected trials can re-propose from them with a larger
    # damping factor. Halves the per-iteration residual evaluations vs the
    # textbook accept/reject loop.
    pose0 = se3.identity((b,), dtype=dtype)
    H0, g0, cost0 = normal_eq(pose0)
    lam0 = jnp.full((b,), cfg.init_lambda, dtype=dtype)
    trial0, delta0 = propose(H0, g0, lam0, pose0)
    done0 = jnp.zeros((b,), bool)
    niter0 = jnp.zeros((b,), jnp.int32)
    state0 = (jnp.zeros((), jnp.int32), pose0, cost0, H0, g0, lam0, trial0,
              delta0, done0, niter0)

    def body(state):
        it, pose, cost, H, g, lam, trial, delta, done, niter = state
        niter = niter + (~done).astype(jnp.int32)  # realized per-sample work
        H_t, g_t, cost_t = normal_eq(trial)
        accept = (cost_t < cost) & ~done  # converged samples are frozen

        acc = lambda a, b_: jnp.where(
            accept.reshape((-1,) + (1,) * (a.ndim - 1)), a, b_
        )
        pose = acc(trial, pose)
        cost = jnp.where(accept, cost_t, cost)
        H = acc(H_t, H)
        g = acc(g_t, g)
        lam = jnp.where(accept, lam * cfg.lambda_down,
                        jnp.where(done, lam, lam * cfg.lambda_up))
        lam = jnp.clip(lam, 1e-9, 1e6)
        # convergence: an ACCEPTED step smaller than tol_step in the tangent
        # space, or saturated damping (16+ consecutive rejections — the LM
        # analogue of a failed line search)
        step_small = jnp.linalg.norm(delta, axis=-1) <= cfg.tol_step
        done = done | (accept & step_small) | (lam >= 1e6)
        trial, delta = propose(H, g, lam, pose)
        return it + 1, pose, cost, H, g, lam, trial, delta, done, niter

    if cfg.early_exit:
        def cond(state):
            it, *rest = state
            done = rest[-2]
            return (it < cfg.iters) & ~jnp.all(done)

        state = jax.lax.while_loop(cond, body, state0)
    else:
        state = jax.lax.fori_loop(0, cfg.iters, lambda _, s: body(s), state0)
    pose, niter = state[1], state[-1]
    pose = se3.normalize(pose)
    return pose, se3.log(pose), niter


# ---------------------------------------------------------------------------
# implicit-function-theorem backward (declarative layer)
# ---------------------------------------------------------------------------

def _per_sample_grad_eps(pose_s: Array, xs_s: PoseProblemInputs, img_coords: Array):
    """grad of the per-sample objective wrt the tangent perturbation at 0."""

    def f(eps):
        xs_b = jax.tree.map(lambda x: x[None], xs_s)
        return objective_at_tangent(eps[None], pose_s[None], xs_b, img_coords)[0]

    return jax.grad(f)(jnp.zeros(6, dtype=pose_s.dtype))


def _per_sample_hessian(pose_s: Array, xs_s: PoseProblemInputs, img_coords: Array):
    def f(eps):
        xs_b = jax.tree.map(lambda x: x[None], xs_s)
        return objective_at_tangent(eps[None], pose_s[None], xs_b, img_coords)[0]

    return jax.hessian(f)(jnp.zeros(6, dtype=pose_s.dtype))


def make_pose_layer(img_coords, cfg: SolverConfig):
    """Build the differentiable declarative pose layer.

    Returns ``layer(xs) -> (pose7 (B,7), tau6 (B,6), iters (B,) int32)``
    where gradients flow through ``tau6`` via the implicit function theorem
    (reference DeclarativeFunctionLie semantics: embedding output carries no
    gradient, tangent output does —
    core/optimization/declerative_node_lie.py:224-267). ``iters`` is the
    realized per-sample LM iteration count (diagnostic, non-differentiable).
    """
    img_coords = jnp.asarray(img_coords)

    @jax.custom_vjp
    def layer(xs: PoseProblemInputs):
        return solve_pose(xs, img_coords, cfg)

    def layer_fwd(xs: PoseProblemInputs):
        pose, tau, niter = solve_pose(xs, img_coords, cfg)
        return (pose, tau, niter), (pose, xs)

    def layer_bwd(res, cts):
        pose, xs = res
        # gradients wrt tangent output only (reference semantics); the int32
        # iteration count carries a float0 cotangent — dropped
        _, v, _ = cts
        pose = jax.lax.stop_gradient(pose)

        # The incoming cotangent is wrt tau = log(pose), but H lives in the
        # left-tangent parameterization eps at the solution. Pull v back
        # through d log(exp(eps) * pose) / d eps exactly (the reference
        # conflates the two charts — declerative_node_lie.py:249-267 — which
        # biases gradients by O(|tau|); verified against finite differences).
        def tau_of_eps(eps):
            return se3.log(se3.retract(eps, pose))

        _, pullback = jax.vjp(tau_of_eps, jnp.zeros_like(v))
        (v,) = pullback(v)

        fY = jax.vmap(lambda p, x: _per_sample_grad_eps(p, x, img_coords))(pose, xs)
        H = jax.vmap(lambda p, x: _per_sample_hessian(p, x, img_coords))(pose, xs)
        H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        if cfg.gamma:
            H = H + cfg.gamma * jnp.eye(6, dtype=H.dtype)

        # optimality check (reference _check_optimality_cond, eps=1e-3)
        optimal = jnp.max(jnp.abs(fY), axis=-1) <= cfg.eps_optimality

        # u = -H^{-1} v ; non-PD / non-finite solves fall back to zero grads
        u = -jnp.linalg.solve(H, v[..., None])[..., 0]
        ok = optimal & jnp.all(jnp.isfinite(u), axis=-1)
        u = jnp.where(ok[:, None], u, 0.0)
        u = jnp.nan_to_num(u)

        # grad_x = u^T d(fY)/dx  via one VJP through the gradient function
        def fY_of_xs(xs_in):
            return jax.vmap(lambda p, x: _per_sample_grad_eps(p, x, img_coords))(
                pose, xs_in
            )

        _, vjp_fn = jax.vjp(fY_of_xs, xs)
        (gxs,) = vjp_fn(u)
        gxs = jax.tree.map(
            lambda g: jnp.nan_to_num(g) if jnp.issubdtype(g.dtype, jnp.floating) else g,
            gxs,
        )
        return (gxs,)

    layer.defvjp(layer_fwd, layer_bwd)
    return layer
