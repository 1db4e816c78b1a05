"""Weighted 2D-reprojection + 3D point-to-point pose objectives.

TPU-native rebuild of reference core/pose/pose_head.py:12-58
(``DPoseSE3Head.reprojection_objective`` / ``depth_objective`` /
``objective``). Plain jittable functions of (pose, inputs) so that JAX
autodiff supplies every derivative the implicit-function-theorem backward
needs — the reference needed a hand-written double-backward-capable autograd
Function (core/geometry/pinhole_transforms.py:58-69) for the same purpose.

Shapes: B batch, H x W image, N = H*W.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from robust_pose_tpu import se3
from robust_pose_tpu.ops.geometry import project, transform

Array = jax.Array


class PoseProblemInputs(NamedTuple):
    """Inputs of the declarative pose problem (reference pose_head.py:55).

    NHWC / points-last layout (TPU-native)."""

    flow: Array        # (B, H, W, 2) temporal optical flow, pixels
    pcl1: Array        # (B, H, W, 3) frame-1 point cloud (normalized depth)
    pcl2: Array        # (B, H, W, 3) frame-2 point cloud, warped to frame-1 grid
    weights1: Array    # (B, H, W, 1) 2D confidence in [0, 1]
    weights2: Array    # (B, H, W, 1) 3D confidence in [0, 1]
    mask1: Array       # (B, H, W, 1) bool
    mask2: Array       # (B, H, W, 1) bool
    intrinsics: Array  # (B, 3, 3)
    loss_weight: Array  # (B, 2) learned [w3d, w2d] (reference ordering)


def reprojection_objective(flow: Array, pcl1: Array, weights1: Array, mask1: Array,
                           intrinsics: Array, pose: Array, img_coords: Array) -> Array:
    """r2D: weighted squared reprojection residuals, mean-normalized.

    (reference core/pose/pose_head.py:12-33)
    """
    b, h, w, _ = flow.shape
    warped = project(pcl1.reshape(b, -1, 3), intrinsics, pose)[..., :2]
    flow_off = img_coords[None, :, :2] + flow.reshape(b, -1, 2)
    residuals = jnp.sum((flow_off - warped) ** 2, axis=-1)
    residuals = residuals * weights1.reshape(b, -1)
    valid = (
        (flow_off[..., 0] > 0)
        & (flow_off[..., 1] > 0)
        & (flow_off[..., 0] < w)
        & (flow_off[..., 1] < h)
        & mask1.reshape(b, -1)
        & jnp.isfinite(residuals)
    )
    residuals = jnp.where(valid, residuals, 0.0)
    return jnp.mean(residuals, axis=1) / (h * w)


def depth_objective(pcl1: Array, pcl2: Array, weights2: Array, mask1: Array,
                    mask2: Array, pose: Array) -> Array:
    """r3D: weighted squared point-to-point residuals.

    (reference core/pose/pose_head.py:35-51)
    """
    b = pcl1.shape[0]
    p1 = transform(pcl1.reshape(b, -1, 3), pose)
    residuals = jnp.sum((p1 - pcl2.reshape(b, -1, 3)) ** 2, axis=-1)
    residuals = residuals * weights2.reshape(b, -1)
    valid = (mask1 & mask2).reshape(b, -1)
    residuals = jnp.where(valid, residuals, 0.0)
    return jnp.mean(residuals, axis=-1)


def objective(xs: PoseProblemInputs, pose: Array, img_coords: Array) -> Array:
    """Combined objective, per batch element (reference pose_head.py:53-58).

    ``loss_weight[:, 0]`` scales the 3D term, ``loss_weight[:, 1]`` the 2D term.
    """
    loss3d = depth_objective(xs.pcl1, xs.pcl2, xs.weights2, xs.mask1, xs.mask2, pose)
    loss2d = reprojection_objective(xs.flow, xs.pcl1, xs.weights1, xs.mask1,
                                    xs.intrinsics, pose, img_coords)
    return xs.loss_weight[:, 1] * loss2d + xs.loss_weight[:, 0] * loss3d


def objective_at_tangent(eps: Array, pose: Array, xs: PoseProblemInputs,
                         img_coords: Array) -> Array:
    """Objective under a left-multiplicative tangent perturbation of the pose.

    ``E(eps) = objective(exp(eps) * pose)`` — the parameterization in which
    the solver iterates and the IFT backward differentiates.
    """
    return objective(xs, se3.retract(eps, pose), img_coords)
