"""On-device frame preprocessing: specularity masking, resize, and
stereo-rectification remap as one jitted XLA program.

The host pipeline (reference dataset/video_dataset.py:55-68 →
`data/video_dataset.py`) runs, per frame: specularity mask at decode
scale (dataset/stereo_dataset.py:12-16), aspect-preserving resize +
center crop (dataset/transforms.py:20-39), then the stereo-rectification
remap (dataset/preprocess/stereo_rectify.py:47-48) — all cv2 on the CPU.
SURVEY §"Native-code inventory" marks the remap + masking as work to move
on-device. This module is that path: the decode thread uploads the raw
uint8 stereo halves and everything else runs on the TPU, fused by XLA
(sum/threshold → erosion → bilinear resize → bilinear remap), which
removes the per-frame host preprocessing from the streaming critical path
and shrinks the host→device transfer to one uint8 pair.

Each op matches its cv2 oracle (tests/test_device_preproc.py):
  - ``remap_bilinear``  ≡ cv2.remap(INTER_LINEAR, BORDER_CONSTANT=0)
  - ``remap_nearest``   ≡ cv2.remap(INTER_NEAREST) — the production
    rectification interpolation (data/rectification.py::rectify_pair
    defaults to 'nearest', reference stereo_rectify.py:47)
  - ``erode_mask``      ≡ cv2.erode(ones(k,k)) (border never erodes:
    cv2's default morphology border is +inf for erosion)
  - ``resize_bilinear`` ≡ cv2.resize(INTER_LINEAR) on float inputs
    (half-pixel centers, replicate border)
  - ``resize_nearest``  ≡ cv2.resize(INTER_NEAREST) (cv2 maps output j
    to input floor(j * w_in / w_out) — no half-pixel offset)
  - pseudo rectification ≡ cv2.warpAffine translation of the right image
    by the principal-point delta (data/rectification.py::pseudo_rectify_2d)
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from robust_pose_tpu.ops.warp import grid_sample

Array = jax.Array


def remap_bilinear(img: Array, map_x: Array, map_y: Array) -> Array:
    """cv2.remap(INTER_LINEAR, BORDER_CONSTANT=0): sample ``img`` (H, W, C)
    at float pixel coords (out-of-bounds reads are 0)."""
    oh, ow = map_x.shape
    out = grid_sample(img[None], map_x.reshape(1, -1), map_y.reshape(1, -1))
    return out.reshape(oh, ow, img.shape[-1])


def remap_nearest(img: Array, map_x: Array, map_y: Array) -> Array:
    """cv2.remap(INTER_NEAREST, BORDER_CONSTANT=0): round each map coord
    to the nearest pixel (cv2 rounds half away from floor via fixed-point
    coords; ``floor(x + 0.5)`` matches for the non-negative map range)."""
    oh, ow = map_x.shape
    out = grid_sample(img[None], map_x.reshape(1, -1), map_y.reshape(1, -1),
                      mode="nearest")
    return out.reshape(oh, ow, img.shape[-1])


def translate_bilinear(img: Array, tx: float, ty: float) -> Array:
    """cv2.warpAffine pure translation (INTER_LINEAR, BORDER_CONSTANT=0):
    dst(x, y) = src(x - tx, y - ty)."""
    h, w = img.shape[:2]
    xs = np.arange(w, dtype=np.float32) - np.float32(tx)
    ys = np.arange(h, dtype=np.float32) - np.float32(ty)
    cx, cy = np.meshgrid(xs, ys)
    out = grid_sample(img[None], jnp.asarray(cx.reshape(1, -1)),
                      jnp.asarray(cy.reshape(1, -1)))
    return out.reshape(h, w, img.shape[-1])


def erode_mask(mask: Array, k: int = 11) -> Array:
    """cv2.erode with an all-ones (k, k) kernel on a boolean mask.

    cv2's default morphology border value is +inf for erosion, so pixels
    outside the image never erode the interior — pad with True.
    """
    p = k // 2
    padded = jnp.pad(mask.astype(jnp.uint8), p, constant_values=1)
    return jax.lax.reduce_window(
        padded, np.uint8(1), jax.lax.min, (k, k), (1, 1), "VALID"
    ).astype(bool)


def mask_specularities(img: Array, mask: Optional[Array] = None,
                       spec_thr: float = 0.96) -> Array:
    """Device twin of data/stereo_dataset.py::mask_specularities
    (reference dataset/stereo_dataset.py:12-16): sum(rgb) < 3*255*thr,
    optional AND with ``mask``, then 11x11 erosion."""
    spec = jnp.sum(img.astype(jnp.float32), axis=-1) < (3 * 255 * spec_thr)
    if mask is not None:
        spec = spec & mask
    return erode_mask(spec)


def _bilinear_coords(n_out: int, n_in: int) -> np.ndarray:
    # cv2.resize INTER_LINEAR: half-pixel centers, computed in float64
    return (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5


def resize_bilinear(img: Array, size_hw: Tuple[int, int]) -> Array:
    """cv2.resize(INTER_LINEAR) on float input: half-pixel-center bilinear
    with replicate border (cv2 clamps edge taps, it does not zero-pad)."""
    h, w = img.shape[:2]
    th, tw = size_hw
    if (th, tw) == (h, w):
        return img
    xs = np.clip(_bilinear_coords(tw, w), 0.0, w - 1.0)
    ys = np.clip(_bilinear_coords(th, h), 0.0, h - 1.0)
    cx, cy = np.meshgrid(xs, ys)  # (th, tw)
    out = grid_sample(img[None], jnp.asarray(cx.reshape(1, -1), jnp.float32),
                      jnp.asarray(cy.reshape(1, -1), jnp.float32))
    return out.reshape(th, tw, img.shape[-1])


def resize_nearest(img: Array, size_hw: Tuple[int, int]) -> Array:
    """cv2.resize(INTER_NEAREST): output j reads input floor(j*w_in/w_out)
    (cv2 uses the non-centered mapping for nearest)."""
    h, w = img.shape[:2]
    th, tw = size_hw
    if (th, tw) == (h, w):
        return img
    ix = np.minimum(np.floor(np.arange(tw) * (w / tw)).astype(np.int64), w - 1)
    iy = np.minimum(np.floor(np.arange(th) * (h / th)).astype(np.int64), h - 1)
    return img[jnp.asarray(iy)][:, jnp.asarray(ix)]


def _center_crop(img: Array, size_hw: Tuple[int, int]) -> Array:
    h, w = img.shape[:2]
    th, tw = size_hw
    top = max((h - th) // 2, 0)
    left = max((w - tw) // 2, 0)
    return img[top:top + th, left:left + tw]


class DevicePreproc:
    """Jitted per-frame preprocessing for the streaming inference loop.

    ``__call__(limg_u8, rimg_u8, mask=None)`` takes the raw decode-scale
    stereo halves (H0, W0, 3) uint8 and returns the model-contract
    ``(limg (3,H,W) f32, rimg (3,H,W) f32, mask (1,H,W) bool)`` device
    arrays, reproducing the host order exactly (mask at decode scale →
    resize images bilinear / mask nearest + center crop → rectify the
    images only — the mask is NOT remapped, matching reference
    dataset/video_dataset.py:60-66).

    :param size_wh: target (W, H) — same convention as ResizeStereo
    :param rectifier: a ``StereoRectifier`` (conventional → nearest remap
        with its maps; pseudo → bilinear principal-point translation of
        the right image) or None to skip rectification
    """

    def __init__(self, size_wh: Tuple[int, int], rectifier=None):
        self.size_hw = (int(size_wh[1]), int(size_wh[0]))
        self.maps = None
        self.pseudo_shift = None
        if rectifier is not None:
            if rectifier.mode == "pseudo":
                cal = rectifier.cal
                self.pseudo_shift = (
                    float(cal["lkmat"][0][-1] - cal["rkmat"][0][-1]),
                    float(cal["lkmat"][1][-1] - cal["rkmat"][1][-1]),
                )
            else:
                self.maps = {
                    k: jnp.asarray(np.asarray(rectifier.maps[k]), jnp.float32)
                    for k in ("lmap1", "lmap2", "rmap1", "rmap2")
                }
        self._fn = jax.jit(self._pipeline)

    def _pipeline(self, limg: Array, rimg: Array, mask: Optional[Array]):
        th, tw = self.size_hw
        h, w = limg.shape[:2]
        scale = max(th / h, tw / w)
        mid = (int(scale * h), int(scale * w))

        m = mask_specularities(limg, mask)
        lf = resize_bilinear(limg.astype(jnp.float32), mid)
        rf = resize_bilinear(rimg.astype(jnp.float32), mid)
        lf = _center_crop(lf, self.size_hw)
        rf = _center_crop(rf, self.size_hw)
        m = _center_crop(resize_nearest(m[..., None], mid)[..., 0],
                         self.size_hw)
        if self.maps is not None:
            # production rectification interpolation is NEAREST
            # (data/rectification.py::rectify_pair default)
            lf = remap_nearest(lf, self.maps["lmap1"], self.maps["lmap2"])
            rf = remap_nearest(rf, self.maps["rmap1"], self.maps["rmap2"])
        elif self.pseudo_shift is not None:
            rf = translate_bilinear(rf, *self.pseudo_shift)
        return (jnp.transpose(lf, (2, 0, 1)), jnp.transpose(rf, (2, 0, 1)),
                m[None])

    def __call__(self, limg_u8: np.ndarray, rimg_u8: np.ndarray,
                 mask: Optional[np.ndarray] = None):
        return self._fn(jnp.asarray(limg_u8), jnp.asarray(rimg_u8),
                        None if mask is None else jnp.asarray(mask))
