"""Generic deep-declarative (implicit differentiation) layer builder.

Rebuild of the reference's ddn submodule surface (anucvml/ddn
``AbstractDeclarativeNode`` / ``DeclarativeLayer``, reference
core/optimization/declerative_node_lie.py:2) as a functional JAX helper:
wrap ANY inner solver + objective pair into a layer whose backward applies
the implicit function theorem, with the reference's failure semantics
(zero gradients when the optimality condition fails or the Hessian solve is
not finite).

The SE(3)-specialized pose layer (solver/gauss_newton.py) adds Lie-group
charts on top; this generic version serves Euclidean-output problems.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def make_declarative_layer(solve: Callable, objective: Callable,
                           eps_optimality: float = 1e-3,
                           gamma: float = 0.0) -> Callable:
    """Build a differentiable argmin layer.

    :param solve: ``solve(xs) -> y (B, M)`` inner optimizer (treated as
        non-differentiable; only its output matters)
    :param objective: ``objective(xs, y) -> (B,)`` smooth objective whose
        minimum ``solve`` approximates
    :param eps_optimality: max |dE/dy| tolerated at the solution before the
        gradient falls back to zero (reference DeclarativeNodeLie eps)
    :param gamma: optional Hessian damping added in the backward
    :return: ``layer(xs) -> y`` with custom VJP
        ``dL/dxs = -v^T H^{-1} (d2E/dy dxs)``
    """

    def _grad_y(y_s, xs_s):
        f = lambda y: objective(jax.tree.map(lambda x: x[None], xs_s),
                                y[None])[0]
        return jax.grad(f)(y_s)

    def _hess_y(y_s, xs_s):
        f = lambda y: objective(jax.tree.map(lambda x: x[None], xs_s),
                                y[None])[0]
        return jax.hessian(f)(y_s)

    @jax.custom_vjp
    def layer(xs):
        return solve(xs)

    def fwd(xs):
        y = solve(xs)
        return y, (y, xs)

    def bwd(res, v):
        y, xs = res
        y = jax.lax.stop_gradient(y)
        fY = jax.vmap(_grad_y)(y, xs)
        H = jax.vmap(_hess_y)(y, xs)
        H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        if gamma:
            H = H + gamma * jnp.eye(H.shape[-1], dtype=H.dtype)
        optimal = jnp.max(jnp.abs(fY), axis=-1) <= eps_optimality
        u = -jnp.linalg.solve(H, v[..., None])[..., 0]
        ok = optimal & jnp.all(jnp.isfinite(u), axis=-1)
        u = jnp.nan_to_num(jnp.where(ok[:, None], u, 0.0))

        def fY_of_xs(xs_in):
            return jax.vmap(_grad_y)(y, xs_in)

        _, vjp_fn = jax.vjp(fY_of_xs, xs)
        (gxs,) = vjp_fn(u)
        gxs = jax.tree.map(
            lambda g: jnp.nan_to_num(g)
            if jnp.issubdtype(g.dtype, jnp.floating) else g, gxs)
        return (gxs,)

    layer.defvjp(fwd, bwd)
    return layer
