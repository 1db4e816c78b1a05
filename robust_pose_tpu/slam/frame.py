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
    """Image, depth, mask, confidence and stereo-flow buffers (all NHWC —
    the TPU-native layout; the reference's NCHW exists only at the
    PoseEstimator API boundary).

    :param img: left RGB in [0, 255], (B, H, W, 3)
    :param rimg: right RGB, (B, H, W, 3)
    :param depth: depth map (mm or normalized), (B, H, W, 1)
    :param mask: valid-pixel mask, (B, H, W, 1) bool
    :param confidence: depth confidence in [0, 1], (B, H, W, 1)
    :param flow: left->right stereo flow, (B, H, W, 2)
    """

    img: Array
    rimg: Array
    depth: Array
    mask: Array
    confidence: Array
    flow: Array

    @property
    def shape(self):
        return self.img.shape[1:3]

    def replace(self, **kw) -> "Frame":
        return replace(self, **kw)


def make_frame(img: Array, rimg: Optional[Array] = None,
               depth: Optional[Array] = None, mask: Optional[Array] = None,
               confidence: Optional[Array] = None,
               flow: Optional[Array] = None) -> Frame:
    """Frame constructor with reference default semantics
    (core/utils/frame_class.py:20-38)."""
    b, h, w, _ = img.shape
    return Frame(
        img=img,
        rimg=img if rimg is None else rimg,
        depth=jnp.ones((b, h, w, 1), img.dtype) if depth is None else depth,
        mask=jnp.ones((b, h, w, 1), bool) if mask is None else mask.astype(bool),
        confidence=(jnp.ones((b, h, w, 1), jnp.float32)
                    if confidence is None else confidence),
        flow=jnp.zeros((b, h, w, 2), jnp.float32) if flow is None else flow,
    )
