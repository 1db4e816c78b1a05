"""Flow/warp debug plots — rebuild of reference core/utils/plotting.py:10-65.

Host-side numpy/matplotlib; the warp helpers reuse the package's jittable
geometry + warp ops instead of skimage/torchvision.
"""
from __future__ import annotations

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from robust_pose_tpu.ops.geometry import create_img_coords, project, reproject
from robust_pose_tpu.ops.warp import grid_sample, remap_from_flow_nearest
from robust_pose_tpu.viewer.viewer2d import flow_to_image


def _get_warpfield(depth, pose, intrinsics, img_coords):
    """(reference plotting.py:10-13)"""
    opts = reproject(depth, intrinsics, img_coords)
    return project(opts[..., :3], intrinsics, pose)[..., :2]


def warp_frame(src_frame, depth, pose, intrinsics):
    """Warp an image by the pose-induced flow (reference plotting.py:16-26).

    :param src_frame: (H, W, 3) image
    :param depth: (H, W, 1) depth
    :param pose: (7,) SE(3) vec
    """
    h, w = depth.shape[0], depth.shape[1]
    coords = create_img_coords(h, w)
    wf = _get_warpfield(jnp.asarray(depth)[None], jnp.asarray(pose)[None],
                        jnp.asarray(intrinsics)[None], coords)
    cx = wf[..., 0] - 0.5
    cy = wf[..., 1] - 0.5
    out = grid_sample(jnp.asarray(src_frame, jnp.float32)[None], cx, cy,
                      mode="nearest")
    return np.asarray(out).reshape(h, w, 3).astype(np.uint8)


def warp_frame_flow(src_frame, flow):
    """Warp an image by an optical flow field (reference plotting.py:29-35)."""
    out, _ = remap_from_flow_nearest(
        jnp.asarray(src_frame, jnp.float32)[None], jnp.asarray(flow)[None]
    )
    return np.asarray(out[0]).astype(np.uint8)


def plot_res(img1_batch, img2_batch, flow_batch, depth2_batch, pose_batch,
             conf1_batch, conf2_batch, intrinsics, n: int = 2):
    """Debug grid: img1 | img2 | flow-warp | pose-warp | flow | conf1 | conf2
    (reference plotting.py:38-65)."""
    rows = []
    for i in range(min(n, len(img1_batch))):
        img1 = np.asarray(img1_batch[i]).astype(np.uint8)
        img2 = np.asarray(img2_batch[i]).astype(np.uint8)
        w_flow = warp_frame_flow(img1, flow_batch[i])
        w_pose = warp_frame(img1, depth2_batch[i], pose_batch[i], intrinsics[i])
        flow_img = flow_to_image(np.asarray(flow_batch[i]))
        c1 = (255 * np.asarray(conf1_batch[i])).astype(np.uint8)
        c2 = (255 * np.asarray(conf2_batch[i])).astype(np.uint8)
        rows.append([img1, img2, w_flow, w_pose, flow_img,
                     np.repeat(c1, 3, -1), np.repeat(c2, 3, -1)])

    fig, axs = plt.subplots(nrows=len(rows), ncols=len(rows[0]), squeeze=False)
    for r, row in enumerate(rows):
        for c, img in enumerate(row):
            axs[r, c].imshow(img)
            axs[r, c].set(xticklabels=[], yticklabels=[], xticks=[], yticks=[])
    plt.tight_layout()
    return fig, axs
