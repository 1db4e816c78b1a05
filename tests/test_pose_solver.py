"""Differentiable pose-solver tests on a synthetic, self-consistent problem.

Mirrors reference tests/unit_test_pose_head.py: random depth -> point cloud,
random small ground-truth poses, *induced* flow computed by projecting the
point cloud through the GT pose, transformed point cloud as 3D target.
Asserts (a) objective ~ 0 at the GT pose, (b) the solver recovers a pose
within 0.05 tangent distance, (c) gradients flow through the argmin into the
confidence weights and loss_weight (checked against finite differences
instead of the reference's autograd-anomaly run).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_pose_tpu import se3
from robust_pose_tpu.ops.geometry import create_img_coords, project, reproject, transform
from robust_pose_tpu.solver.gauss_newton import SolverConfig, make_pose_layer, solve_pose
from robust_pose_tpu.solver.objectives import PoseProblemInputs, objective


H = W = 64
N_BATCH = 3


def _make_problem(key, sigma=0.01):
    keys = jax.random.split(key, 3)
    kmat = jnp.diag(jnp.array([150.0, 150.0, 1.0]))
    kmat = kmat.at[0, 2].set(W / 2).at[1, 2].set(H / 2)
    kmat = jnp.tile(kmat[None], (N_BATCH, 1, 1))

    depth = 100.0 * jnp.clip(jax.random.uniform(keys[0], (N_BATCH, H, W, 1)), 0.01, 1.0)
    coords = create_img_coords(H, W)
    pcl = reproject(depth, kmat, coords)[..., :3].reshape(N_BATCH, H, W, 3)

    poses = se3.random(keys[1], (N_BATCH,), sigma=sigma)
    flow_off = project(pcl.reshape(N_BATCH, -1, 3), kmat, poses)[..., :2]
    valid = (
        (flow_off[..., 0] >= 0)
        & (flow_off[..., 0] < W)
        & (flow_off[..., 1] >= 0)
        & (flow_off[..., 1] < H)
    ).reshape(N_BATCH, H, W, 1)
    flow = (flow_off - coords[None, :, :2]).reshape(N_BATCH, H, W, 2)
    pcl_t = transform(pcl.reshape(N_BATCH, -1, 3), poses).reshape(N_BATCH, H, W, 3)

    weights = jnp.ones((N_BATCH, H, W, 1))
    masks = jnp.ones((N_BATCH, H, W, 1), dtype=bool)
    loss_weight = jnp.tile(jnp.array([[0.001, 1.0]]), (N_BATCH, 1))
    xs = PoseProblemInputs(
        flow=flow, pcl1=pcl, pcl2=pcl_t, weights1=weights, weights2=weights,
        mask1=valid, mask2=masks, intrinsics=kmat, loss_weight=loss_weight,
    )
    return xs, poses, coords


def test_objective_zero_at_gt():
    xs, poses, coords = _make_problem(jax.random.PRNGKey(12345))
    loss_gt = objective(xs, poses, coords)
    np.testing.assert_allclose(loss_gt, 0.0, atol=1e-5)


def test_solver_recovers_pose():
    xs, poses, coords = _make_problem(jax.random.PRNGKey(12345))
    cfg = SolverConfig(iters=20)
    solved, tau, niter = jax.jit(lambda x: solve_pose(x, coords, cfg))(xs)
    loss_pred = objective(xs, solved, coords)
    np.testing.assert_allclose(loss_pred, 0.0, atol=1e-5)
    # supervised tangent distance < 0.05 (reference unit_test_pose_head.py:49-50)
    sup = jnp.abs(tau - se3.log(poses)).sum() / N_BATCH
    assert float(sup) < 0.05, f"tangent distance {sup}"


def test_solver_recovers_larger_pose():
    xs, poses, coords = _make_problem(jax.random.PRNGKey(7), sigma=0.05)
    cfg = SolverConfig(iters=30)
    solved, tau, niter = jax.jit(lambda x: solve_pose(x, coords, cfg))(xs)
    sup = jnp.abs(tau - se3.log(poses)).sum() / N_BATCH
    assert float(sup) < 0.05, f"tangent distance {sup}"


def test_realized_iteration_counts():
    """solve_pose reports per-sample realized LM iterations (until that
    sample converged/froze): an easy problem converges well under the cap,
    and the count is identical with and without the early-exit while_loop
    (early exit only stops the GLOBAL loop once every sample froze — it
    never changes any sample's trajectory)."""
    xs, poses, coords = _make_problem(jax.random.PRNGKey(12345))
    cfg = SolverConfig(iters=50)
    _, _, niter = jax.jit(lambda x: solve_pose(x, coords, cfg))(xs)
    assert niter.shape == (N_BATCH,) and niter.dtype == jnp.int32
    assert jnp.all(niter >= 1) and jnp.all(niter < 50), niter

    _, tau_f, niter_f = jax.jit(lambda x: solve_pose(
        x, coords, SolverConfig(iters=50, early_exit=False)))(xs)
    np.testing.assert_array_equal(niter_f, niter)


def test_backward_through_argmin():
    xs, poses, coords = _make_problem(jax.random.PRNGKey(12345))
    cfg = SolverConfig(iters=20)
    layer = make_pose_layer(coords, cfg)
    tau_gt = se3.log(poses)

    def loss_fn(loss_weight):
        xs2 = xs._replace(loss_weight=loss_weight)
        _, tau, _ = layer(xs2)
        return jnp.abs(tau - tau_gt).sum() / N_BATCH

    lw = jnp.tile(jnp.array([[0.01, 1.0]]), (N_BATCH, 1))
    g = jax.jit(jax.grad(loss_fn))(lw)
    assert g.shape == lw.shape
    assert jnp.all(jnp.isfinite(g))


def test_backward_weights_grad_nonzero_and_fd_consistent():
    """IFT gradient wrt the confidence maps vs central finite differences.

    Runs in float64: the directional derivative (~1e-4) is far below the f32
    solver noise floor, so an f32 FD probe carries no signal.
    """
    with jax.enable_x64(True):
        xs, poses, coords = _make_problem(jax.random.PRNGKey(3))
        xs = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, xs)
        coords = coords.astype(jnp.float64)
        cfg = SolverConfig(iters=25, dtype=jnp.float64)
        layer = make_pose_layer(coords, cfg)

        # perturb the 3D target so the optimum actually depends on the weights
        noise = 0.05 * jax.random.normal(
            jax.random.PRNGKey(11), xs.pcl2.shape, dtype=jnp.float64)
        xs = xs._replace(pcl2=xs.pcl2 + noise)
        v = jax.random.normal(jax.random.PRNGKey(5), (N_BATCH, 6),
                              dtype=jnp.float64)

        def loss_fn(w2):
            _, tau, _ = layer(xs._replace(weights2=w2))
            return jnp.sum(tau * v)

        w2 = xs.weights2
        g = jax.jit(jax.grad(loss_fn))(w2)
        assert jnp.any(g != 0.0), "gradient through argmin should be nonzero"

        # finite-difference probe along a random direction
        d = jax.random.normal(jax.random.PRNGKey(9), w2.shape,
                              dtype=jnp.float64)
        # eps small enough that third-order curvature doesn't contaminate
        # the probe (H has ~1e-2 eigenvalues on this problem)
        eps = 1e-6
        fd = (loss_fn(w2 + eps * d) - loss_fn(w2 - eps * d)) / (2 * eps)
        an = jnp.sum(g * d)
        # tolerance dominated by residual FD truncation error on the sample
        # with the smallest Hessian eigenvalue; still tight enough to catch
        # the O(|tau|) chart-mismatch bias (~4%) the reference carries
        np.testing.assert_allclose(an, fd, rtol=1.2e-2, atol=1e-12)


def test_zero_grad_fallback_on_degenerate_problem():
    """All-masked problem -> singular H -> zero gradients, not NaN
    (reference declerative_node_lie.py:59-62 zero-grad fallback)."""
    xs, poses, coords = _make_problem(jax.random.PRNGKey(12345))
    xs = xs._replace(
        mask1=jnp.zeros_like(xs.mask1), mask2=jnp.zeros_like(xs.mask2)
    )
    cfg = SolverConfig(iters=5)
    layer = make_pose_layer(coords, cfg)

    def loss_fn(lw):
        _, tau, _ = layer(xs._replace(loss_weight=lw))
        return jnp.sum(tau)

    g = jax.jit(jax.grad(loss_fn))(xs.loss_weight)
    assert jnp.all(jnp.isfinite(g))
    np.testing.assert_allclose(g, 0.0, atol=1e-12)


def test_solver_under_debug_nans():
    """NaN-guard: the solver must not produce NaNs on a well-posed problem
    even with jax.debug_nans active (reference analogue: autograd anomaly
    mode, tests/unit_test_pose_head.py:58)."""
    xs, poses, coords = _make_problem(jax.random.PRNGKey(12345))
    cfg = SolverConfig(iters=10)
    with jax.debug_nans(True):
        solved, tau, _ = solve_pose(xs, coords, cfg)
        assert jnp.all(jnp.isfinite(solved))


def test_pallas_normal_equations_matches_xla():
    """Fused Pallas H/g/cost kernel (interpret mode) vs the einsum
    formulation, at a non-identity pose, with partial masks/weights and a
    non-128-multiple pixel count exercising the padding path."""
    from robust_pose_tpu.ops.pallas_normal_eq import (
        normal_equations_pallas,
        pack_planes,
    )
    from robust_pose_tpu.solver.gauss_newton import _normal_equations

    xs, poses, coords = _make_problem(jax.random.PRNGKey(21))
    # de-trivialize: random weights, partial masks, perturbed 3D targets
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    xs = xs._replace(
        weights1=jax.random.uniform(k1, xs.weights1.shape),
        weights2=jax.random.uniform(k2, xs.weights2.shape),
        mask2=jax.random.uniform(k3, xs.mask2.shape) > 0.2,
        pcl2=xs.pcl2 + 0.1,
    )
    pose = se3.exp(0.02 * jnp.ones((N_BATCH, 6)))

    H_ref, g_ref, cost_ref = _normal_equations(pose, xs, coords)
    planes, kvec = pack_planes(xs, H, W)
    H_k, g_k, cost_k = normal_equations_pallas(
        pose, planes, kvec, xs.loss_weight, H, W, interpret=True)
    np.testing.assert_allclose(H_k, H_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(g_k, g_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(cost_k, cost_ref, rtol=1e-4, atol=1e-9)

    # ragged pixel count (pad path): 20x30 = 600 pixels
    h2, w2 = 20, 30
    sl = lambda a: a[:, :h2, :w2]
    xs2 = PoseProblemInputs(
        flow=sl(xs.flow), pcl1=sl(xs.pcl1), pcl2=sl(xs.pcl2),
        weights1=sl(xs.weights1), weights2=sl(xs.weights2),
        mask1=sl(xs.mask1), mask2=sl(xs.mask2),
        intrinsics=xs.intrinsics, loss_weight=xs.loss_weight)
    coords2 = create_img_coords(h2, w2)
    H_ref, g_ref, cost_ref = _normal_equations(pose, xs2, coords2)
    planes2, kvec2 = pack_planes(xs2, h2, w2)
    H_k, g_k, cost_k = normal_equations_pallas(
        pose, planes2, kvec2, xs2.loss_weight, h2, w2, interpret=True)
    np.testing.assert_allclose(H_k, H_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(g_k, g_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(cost_k, cost_ref, rtol=1e-4, atol=1e-9)


def test_solver_pallas_impl_matches_xla_interpret():
    """solve_pose with the fused Pallas normal equations (interpret mode)
    must land on the same pose as the XLA implementation."""
    from robust_pose_tpu.ops import pallas_normal_eq

    xs, poses, coords = _make_problem(jax.random.PRNGKey(12345))

    # route the pallas path through interpret mode on CPU
    orig = pallas_normal_eq.normal_equations_pallas

    def interp(pose, planes, kvec, lw, h, w, interpret=False):
        return orig(pose, planes, kvec, lw, h, w, interpret=True)

    pallas_normal_eq.normal_equations_pallas = interp
    try:
        solved_p, tau_p, _ = solve_pose(xs, coords,
                                        SolverConfig(iters=15, impl="pallas"))
    finally:
        pallas_normal_eq.normal_equations_pallas = orig
    solved_x, tau_x, _ = solve_pose(xs, coords,
                                    SolverConfig(iters=15, impl="xla"))
    np.testing.assert_allclose(tau_p, tau_x, rtol=1e-3, atol=1e-5)


def test_generic_declarative_layer():
    """Generic implicit-diff layer (solver/declarative.py) on a quadratic
    argmin: y*(x) = x/2 for E = |y|^2 + |y - x|^2 -> dy*/dx = 1/2."""
    from robust_pose_tpu.solver.declarative import make_declarative_layer

    def objective(xs, y):
        return jnp.sum(y ** 2, -1) + jnp.sum((y - xs) ** 2, -1)

    def solve(xs):
        return xs / 2.0

    layer = make_declarative_layer(solve, objective)
    x = jnp.array([[1.0, -2.0, 3.0]])
    y = layer(x)
    np.testing.assert_allclose(y, x / 2)
    g = jax.grad(lambda x_: jnp.sum(layer(x_)))(x)
    np.testing.assert_allclose(g, 0.5 * jnp.ones_like(x), atol=1e-5)

    # non-converged solve -> zero grads (reference zero-grad fallback)
    bad_layer = make_declarative_layer(lambda xs: xs * 0 + 7.0, objective)
    gbad = jax.grad(lambda x_: jnp.sum(bad_layer(x_)))(x)
    np.testing.assert_allclose(gbad, 0.0, atol=1e-12)
