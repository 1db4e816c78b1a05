"""Training losses — rebuild of reference scripts/train_posenet.py:23-26."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from robust_pose_tpu import se3

Array = jax.Array


def supervised_pose_loss(pose_tan_pred: Array, pose_gt_vec: Array) -> Array:
    """L1 between the predicted tangent-space pose and log(gt) — (B, 6)
    (reference train_posenet.py:23-26)."""
    return jnp.abs(pose_tan_pred - se3.log(pose_gt_vec))


def loss_metrics(loss_pose: Array, prefix: str = "train") -> dict:
    """Rot/trans decomposition (reference train_posenet.py:125-132)."""
    return {
        f"{prefix}/loss_rot": jnp.nanmean(jnp.sum(loss_pose[:, 3:], axis=-1)),
        f"{prefix}/loss_trans": jnp.nanmean(jnp.sum(loss_pose[:, :3], axis=-1)),
        f"{prefix}/loss_total": jnp.nanmean(jnp.sum(loss_pose, axis=-1)),
    }
