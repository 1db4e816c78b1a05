"""2D matplotlib viewer — rebuild of reference viewer/viewer2d.py:26-57.

Per-frame panel of image / depth / flow / 2D weights / 3D weights, saved to
``<outpath>/imgs`` and optionally shown interactively. Torch-free: flow
coloring reimplemented with the standard optical-flow color wheel.
"""
from __future__ import annotations

import os

import numpy as np

try:
    import matplotlib.pyplot as plt

    SHOW = True
except ImportError:  # headless fallback
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    SHOW = False


def _color_wheel() -> np.ndarray:
    """Standard Middlebury flow color wheel (55 colors)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 color coding (torchvision
    ``flow_to_image`` analogue used at reference viewer2d.py:33)."""
    u, v = np.asarray(flow[..., 0], float), np.asarray(flow[..., 1], float)
    rad = np.sqrt(u ** 2 + v ** 2)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    wheel = _color_wheel()
    ncols = len(wheel)
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros((*u.shape, 3), np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = 1 - rad * (1 - col)
        img[..., c] = np.floor(255 * col)
    return img


class Viewer2D:
    """(reference viewer/viewer2d.py:12-57)"""

    def __init__(self, outpath: str = None, blocking: bool = False):
        self.blocking = blocking
        self.outpath = os.path.join(outpath, "imgs") if outpath else None
        if (not blocking) and SHOW:
            plt.ion()
        if self.outpath is not None:
            os.makedirs(self.outpath, exist_ok=True)

    def __call__(self, frame, weights, flow, idx: int = 0):
        fig, ax = plt.subplots(1, 5, num=1, clear=True, figsize=(10, 8))
        img_t = np.asarray(frame.img[0]) / 255.0       # (H, W, 3) NHWC
        depth_t = np.asarray(frame.depth[0, ..., 0])
        flow_rgb = flow_to_image(np.asarray(flow[0]))
        panels = [
            (np.clip(img_t, 0, 1), "I_t"),
            (depth_t, "depth_t"),
            (flow_rgb, "flow"),
            (np.asarray(weights[0][0, ..., 0]), "w_2d"),
            (np.asarray(weights[1][0, ..., 0]), "w_3d"),
        ]
        for a, (im, title) in zip(ax, panels):
            a.imshow(im, vmin=0 if im.ndim == 2 else None)
            a.axis("off")
            a.set_title(title)
        plt.tight_layout()
        if self.outpath is not None:
            plt.savefig(os.path.join(self.outpath, f"vis_{idx:06d}.png"),
                        dpi=150)
        if self.blocking and SHOW:
            plt.show()
        elif SHOW:
            plt.draw()
            plt.pause(0.0001)
        else:
            plt.close()
