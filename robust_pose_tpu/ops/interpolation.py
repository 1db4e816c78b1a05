"""Sparse image interpolation — rebuild of reference
core/interpol/sparse_img_interpolation.py:6-73.

Fills NaN pixels with a center-zeroed Gaussian convolution (or median) of
their neighborhood. Pure jittable functions; the Gaussian path is a depthwise
convolution that XLA fuses with surrounding elementwise work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _gauss_kernel_2d(size: int, std: float) -> Array:
    """Center-zeroed, normalized 2D Gaussian (reference
    sparse_img_interpolation.py:42-49)."""
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1.0) / 2.0
    g1 = jnp.exp(-(x ** 2) / (2 * std ** 2))
    g2 = jnp.outer(g1, g1)
    g2 = g2.at[size // 2, size // 2].set(0.0)
    return g2 / jnp.sum(g2)


def sparse_img_interpolate(x: Array, kernel_size: int = 5, sigma: float = 2.0,
                           prior_val: float = 0.0) -> Array:
    """Replace NaN pixels of ``x (B, H, W, C)`` by the Gaussian-weighted mean
    of their (reflect-padded) neighborhood (reference
    sparse_img_interpolation.py:19-32)."""
    mask = jnp.isnan(x)
    x = jnp.where(mask, prior_val, x)
    pad = kernel_size // 2
    k = _gauss_kernel_2d(kernel_size, sigma).astype(x.dtype)

    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # depthwise conv over NHWC
    conv = jax.lax.conv_general_dilated(
        padded,
        jnp.tile(k[:, :, None, None], (1, 1, 1, c)),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.where(mask, conv, x)


def median_filter_2d(x: Array, kernel_size: int = 3) -> Array:
    """Same-padded 2D median filter (reference core/utils/pytorch.py:84
    ``MedianPool2d(same=True)``). NHWC."""
    pad = kernel_size // 2
    b, h, w, c = x.shape
    padded = jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
    )
    patches = jnp.stack(
        [
            padded[:, i:i + h, j:j + w, :]
            for i in range(kernel_size)
            for j in range(kernel_size)
        ],
        axis=-1,
    )
    return jnp.median(patches, axis=-1)


def sparse_median_interpolate(x: Array, kernel_size: int = 3,
                              prior_val: float = 0.0) -> Array:
    """NaN fill via median (reference sparse_img_interpolation.py:52-73)."""
    mask = jnp.isnan(x)
    x = jnp.where(mask, prior_val, x)
    med = median_filter_2d(x, kernel_size)
    return jnp.where(mask, med, x)
