"""Misc image tensor ops — rebuild of the remaining reference
core/utils/pytorch.py pieces (image_gradient l.129, batched_dot_product l.8,
beye l.20). Jittable jnp functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def image_gradient(img: Array) -> Array:
    """Sobel x/y gradients of (B, C, H, W) -> (B, 2*C, H, W)
    (reference core/utils/pytorch.py:129-141)."""
    kx = jnp.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
    ky = kx.T
    b, c, h, w = img.shape
    x = img.reshape(b * c, 1, h, w)
    pad = ((0, 0), (0, 0), (1, 1), (1, 1))
    xp = jnp.pad(x, pad, mode="edge")

    def conv(k):
        return jax.lax.conv_general_dilated(
            xp, k[None, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    gx = conv(kx).reshape(b, c, h, w)
    gy = conv(ky).reshape(b, c, h, w)
    return jnp.concatenate([gx, gy], axis=1)


def batched_dot_product(a: Array, b: Array) -> Array:
    """(B, N, D) x (B, N, D) -> (B, N, 1) (reference pytorch.py:8-17)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def beye(batch: int, n: int, dtype=jnp.float32) -> Array:
    """Batched identity (B, n, n) (reference pytorch.py:20-28)."""
    return jnp.broadcast_to(jnp.eye(n, dtype=dtype), (batch, n, n))
