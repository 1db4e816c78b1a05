"""Pinhole-camera geometry ops (pure jittable functions).

TPU-native rebuild of reference core/geometry/pinhole_transforms.py:7-114.
Unlike the reference, no custom autograd Function is needed: JAX autodiff
provides arbitrary-order derivatives through ``se3.act`` for free (the
reference's hand-written ``Transform.backward`` existed only to enable
double-backward through lietorch).

Point clouds use **points-last** layout ``(B, N, 3)`` — the TPU-native choice
(contiguous xyz per point; gathers/matmuls act on minor-dim-3 rows, and
``se3.act`` consumes it directly). The reference's channel-first ``(B, 3, N)``
contract exists only at the checkpoint/trajectory boundary.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from robust_pose_tpu import se3

# The default matmul precision is allowed to drop to bf16 on both the TPU MXU
# and this XLA CPU build; geometry must stay exact in f32.
HIGHEST = jax.lax.Precision.HIGHEST

Array = jax.Array


def create_img_coords(height: int, width: int, dtype=jnp.float32) -> Array:
    """Homogeneous pixel grid (H*W, 3) with the +0.5 pixel-center offset
    (reference core/geometry/pinhole_transforms.py:7-19)."""
    xs = jnp.arange(width, dtype=dtype) + 0.5
    ys = jnp.arange(height, dtype=dtype) + 0.5
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones_like(xg)
    return jnp.stack([xg.ravel(), yg.ravel(), ones.ravel()], axis=-1)


def transform(opts: Array, pose: Array) -> Array:
    """Rigid transform of points.

    :param opts: (B, N, 3) points
    :param pose: (B, 7) or (7,) SE(3) vectors
    :return: (B, N, 3) transformed points
    (reference core/geometry/pinhole_transforms.py:72-76)
    """
    if pose.ndim == opts.ndim - 1:
        pose = pose[..., None, :]  # broadcast over N
    return se3.act(pose, opts)


def reproject(depth: Array, intrinsics: Array, img_coords: Array) -> Array:
    """Back-project depth to homogeneous 3D points.

    :param depth: (B, 1, H, W), (B, H, W, 1) or (B, H*W)
    :param intrinsics: (B, 3, 3) or (3, 3)
    :param img_coords: (H*W, 3) homogeneous pixel grid
    :return: (B, H*W, 4) homogeneous points
    (reference core/geometry/pinhole_transforms.py:79-87)
    """
    b = depth.shape[0]
    d = depth.reshape(b, -1, 1)
    kinv = jnp.linalg.inv(intrinsics)
    # rays = (K^-1 @ coords^T)^T = coords @ K^-T
    rays = jnp.matmul(img_coords, jnp.swapaxes(kinv, -1, -2),
                      precision=HIGHEST)  # (N, 3) or (B, N, 3)
    if rays.ndim == 2:
        rays = rays[None]
    opts = d * rays
    ones = jnp.ones((b, opts.shape[1], 1), dtype=opts.dtype)
    return jnp.concatenate([opts, ones], axis=-1)


def project(opts: Array, intrinsics: Array, pose: Array | None = None) -> Array:
    """Pinhole projection K @ [T @] X with depth clamping.

    :param opts: (B, N, 3) points
    :param intrinsics: (B, 3, 3)
    :return: (B, N, 3) homogeneous pixel coords (x, y, 1)
    (reference core/geometry/pinhole_transforms.py:90-99)
    """
    if pose is not None:
        opts = transform(opts, pose)
    ipts = jnp.matmul(opts, jnp.swapaxes(intrinsics, -1, -2),
                      precision=HIGHEST)
    depth = jnp.clip(ipts[..., -1:], 1e-12, None)
    return jnp.concatenate([ipts[..., :2] / depth, jnp.ones_like(depth)],
                           axis=-1)


def project2image(opts: Array, intrinsics: Array, img_shape: tuple,
                  pose: Array | None = None):
    """Project and flag in-bounds points.

    :return: (ipts (B, N, 3), valid (B, N))
    (reference core/geometry/pinhole_transforms.py:102-114)
    """
    h, w = img_shape
    ipts = project(opts, intrinsics, pose)
    valid = (
        (ipts[..., 1] < h) & (ipts[..., 0] < w)
        & (ipts[..., 1] >= 0) & (ipts[..., 0] >= 0)
    )
    return ipts, valid


def depth_to_pcl(depth: Array, intrinsics: Array, img_coords: Array) -> Array:
    """(B, H, W, 1) depth -> (B, H, W, 3) point cloud
    (reference core/pose/pose_net.py:121-125 ``PoseNet.proj``)."""
    b, h, w, _ = depth.shape
    kinv = jnp.linalg.inv(intrinsics)
    rays = jnp.matmul(img_coords, jnp.swapaxes(kinv, -1, -2),
                      precision=HIGHEST)
    if rays.ndim == 2:
        rays = rays[None]
    opts = depth.reshape(b, -1, 1) * rays
    return opts.reshape(b, h, w, 3)
