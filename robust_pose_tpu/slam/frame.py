"""Frame container (pytree) — rebuild of reference core/utils/frame_class.py:5-84.

A plain pytree dataclass so frames can flow through jitted functions and be
carried as on-device SLAM state (the recurrent-state-in-HBM pattern:
last-frame buffers stay resident on device between steps).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass
class Frame:
    """Image, depth, mask, confidence and stereo-flow buffers (all NCHW).

    :param img: left RGB in [0, 255], (B, 3, H, W)
    :param rimg: right RGB, (B, 3, H, W)
    :param depth: depth map (mm or normalized), (B, 1, H, W)
    :param mask: valid-pixel mask, (B, 1, H, W) bool
    :param confidence: depth confidence in [0, 1], (B, 1, H, W)
    :param flow: left->right stereo flow, (B, 2, H, W)
    """

    img: Array
    rimg: Array
    depth: Array
    mask: Array
    confidence: Array
    flow: Array

    @property
    def shape(self):
        return self.img.shape[-2:]

    def replace(self, **kw) -> "Frame":
        return replace(self, **kw)


def make_frame(img: Array, rimg: Optional[Array] = None,
               depth: Optional[Array] = None, mask: Optional[Array] = None,
               confidence: Optional[Array] = None,
               flow: Optional[Array] = None) -> Frame:
    """Frame constructor with reference default semantics
    (core/utils/frame_class.py:20-38)."""
    b, _, h, w = img.shape
    return Frame(
        img=img,
        rimg=img if rimg is None else rimg,
        depth=jnp.ones((b, 1, h, w), img.dtype) if depth is None else depth,
        mask=jnp.ones((b, 1, h, w), bool) if mask is None else mask.astype(bool),
        confidence=(jnp.ones((b, 1, h, w), jnp.float32)
                    if confidence is None else confidence),
        flow=jnp.zeros((b, 2, h, w), jnp.float32) if flow is None else flow,
    )
