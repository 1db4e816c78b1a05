"""On-device preprocessing vs the cv2 host oracles.

Each device op must reproduce the exact host-pipeline semantics
(data/stereo_dataset.py, data/transforms.py, data/rectification.py) so
the --device-preproc inference path is a drop-in replacement.
"""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from robust_pose_tpu.data.device_preproc import (
    DevicePreproc,
    erode_mask,
    mask_specularities,
    remap_bilinear,
    remap_nearest,
    resize_bilinear,
    resize_nearest,
    translate_bilinear,
)
from robust_pose_tpu.data.stereo_dataset import (
    mask_specularities as mask_specularities_host,
)
from robust_pose_tpu.data.transforms import ResizeStereo

RNG = np.random.default_rng(7)


def _img(h=48, w=64, c=3):
    return RNG.uniform(0, 255, (h, w, c)).astype(np.float32)


def test_remap_bilinear_matches_cv2():
    img = _img()
    h, w = img.shape[:2]
    map_x = RNG.uniform(-2, w + 1, (h, w)).astype(np.float32)
    map_y = RNG.uniform(-2, h + 1, (h, w)).astype(np.float32)
    ref = cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_LINEAR)
    out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(map_x),
                                    jnp.asarray(map_y)))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_remap_nearest_matches_cv2():
    img = _img()
    h, w = img.shape[:2]
    # avoid exact .5 fractions where cv2's fixed-point rounding ties
    map_x = (RNG.integers(-2, w + 1, (h, w)) +
             RNG.uniform(0.05, 0.45, (h, w))).astype(np.float32)
    map_y = (RNG.integers(-2, h + 1, (h, w)) +
             RNG.uniform(0.05, 0.45, (h, w))).astype(np.float32)
    ref = cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_NEAREST)
    out = np.asarray(remap_nearest(jnp.asarray(img), jnp.asarray(map_x),
                                   jnp.asarray(map_y)))
    np.testing.assert_array_equal(out, ref)


def test_erode_matches_cv2():
    mask = RNG.uniform(size=(40, 56)) > 0.3
    ref = cv2.erode(mask.astype(np.uint8), kernel=np.ones((11, 11))) > 0
    out = np.asarray(erode_mask(jnp.asarray(mask)))
    np.testing.assert_array_equal(out, ref)


def test_mask_specularities_matches_host():
    img = _img()
    img[10:14, 20:30] = 255.0  # saturated block -> specularity
    prior = RNG.uniform(size=img.shape[:2]) > 0.1
    ref = mask_specularities_host(img, prior)
    out = np.asarray(mask_specularities(jnp.asarray(img), jnp.asarray(prior)))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("size", [(24, 40), (72, 96), (48, 64)])
def test_resize_bilinear_matches_cv2(size):
    img = _img()
    ref = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_LINEAR)
    out = np.asarray(resize_bilinear(jnp.asarray(img), size))
    np.testing.assert_allclose(out, ref, atol=2e-3)


@pytest.mark.parametrize("size", [(24, 40), (72, 96)])
def test_resize_nearest_matches_cv2(size):
    img = _img(c=1)
    ref = cv2.resize(img, (size[1], size[0]),
                     interpolation=cv2.INTER_NEAREST)[..., None]
    out = np.asarray(resize_nearest(jnp.asarray(img), size))
    np.testing.assert_array_equal(out, ref)


def test_translate_matches_warpaffine():
    img = _img()
    tx, ty = 3.25, -1.75
    tmat = np.array(((1, 0, tx), (0, 1, ty)), np.float32)
    ref = cv2.warpAffine(img, tmat, (img.shape[1], img.shape[0]))
    out = np.asarray(translate_bilinear(jnp.asarray(img), tx, ty))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_device_preproc_matches_host_video_pipeline():
    """Full pipeline vs the StereoVideoDataset host order: specularity
    mask at decode scale -> bilinear resize + center crop (nearest for
    the mask) -> no rectifier."""
    limg = RNG.uniform(0, 255, (64, 96, 3)).astype(np.uint8)
    rimg = RNG.uniform(0, 255, (64, 96, 3)).astype(np.uint8)
    limg[20:30, 40:60] = 255  # specular patch
    size_wh = (80, 48)  # (W, H)

    # host path (video_dataset.py order)
    mask_h = mask_specularities_host(limg)
    tr = ResizeStereo(size_wh)
    lf_h, rf_h, mask_h = tr(limg.astype(np.float32),
                            rimg.astype(np.float32), mask_h)

    pre = DevicePreproc(size_wh)
    lf_d, rf_d, mask_d = pre(limg, rimg)
    np.testing.assert_allclose(np.asarray(lf_d),
                               lf_h.transpose(2, 0, 1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rf_d),
                               rf_h.transpose(2, 0, 1), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(mask_d), mask_h[None])


def test_device_preproc_pseudo_rectify():
    """Pseudo mode shifts the right image by the principal-point delta."""
    class _FakeRect:
        mode = "pseudo"
        cal = {"lkmat": np.array([[500.0, 0, 40.5], [0, 500.0, 30.25],
                                  [0, 0, 1]]),
               "rkmat": np.array([[500.0, 0, 37.0], [0, 500.0, 31.0],
                                  [0, 0, 1]])}

    limg = RNG.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    rimg = RNG.uniform(0, 255, (48, 64, 3)).astype(np.uint8)

    from robust_pose_tpu.data.rectification import pseudo_rectify_2d
    mask_h = mask_specularities_host(limg)
    rf_h = pseudo_rectify_2d(rimg.astype(np.float32), 40.5, 37.0, 30.25, 31.0)

    pre = DevicePreproc((64, 48), rectifier=_FakeRect())
    lf_d, rf_d, mask_d = pre(limg, rimg)
    np.testing.assert_allclose(np.asarray(rf_d), rf_h.transpose(2, 0, 1),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(lf_d),
                               limg.astype(np.float32).transpose(2, 0, 1),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(mask_d), mask_h[None])


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    """Vertically-stacked stereo mp4 + camcal.json (same recipe as
    tests/test_video_dataset.py)."""
    import json

    H, W, n = 64, 96, 4
    root = tmp_path_factory.mktemp("devpre_vid")
    rng = np.random.default_rng(3)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (2 * H, W + 16, 3)).astype(np.float32), (0, 0), 2
    ).astype(np.uint8)
    path = str(root / "video.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0,
                         (W, 2 * H))
    assert vw.isOpened(), "mp4 writer unavailable"
    for i in range(n):
        vw.write(base[:, 2 * i:2 * i + W])
    vw.release()
    with open(root / "video.json", "w") as f:
        json.dump([{"timestamp": 100 + i} for i in range(n)], f)
    cal = {"data": {"width": W, "height": H, "intrinsics": [
        {"f": [100.0, 100.0], "c": [W / 2, H / 2], "k": [0, 0, 0, 0, 0]},
        {"f": [100.0, 100.0], "c": [W / 2, H / 2], "k": [0, 0, 0, 0, 0]}],
        "extrinsics": {"T": [-3.0, 0.0, 0.0], "om": [0.0, 0.0, 0.0]}}}
    with open(root / "camcal.json", "w") as f:
        json.dump(cal, f)
    return str(root), H, W


@pytest.mark.parametrize("shrink", [0, 16])
def test_raw_dataset_plus_device_preproc_matches_host(video_dir, shrink):
    """StereoVideoDataset(raw) + DevicePreproc reproduces the host pipeline
    (decode -> specularity mask -> resize+crop -> nearest rectify remap)
    frame for frame; shrink=16 exercises the non-identity resize path."""
    from robust_pose_tpu.data.dataset_utils import get_data

    root, H, W = video_dir
    size_wh = (W - shrink, H - shrink)
    host_ds, _ = get_data(root, size_wh)
    dev_ds, _ = get_data(root, size_wh)
    dev_ds.raw = True
    pre = DevicePreproc(size_wh, rectifier=dev_ds.rectify)

    n_checked = 0
    for host_item, raw_item in zip(iter(host_ds), iter(dev_ds)):
        limg_h, rimg_h, mask_h, pose_h, num_h = host_item
        limg_raw, rimg_raw, pose_r, num_r = raw_item
        assert num_h == num_r
        np.testing.assert_array_equal(pose_h, pose_r)
        limg_d, rimg_d, mask_d = pre(limg_raw, rimg_raw)
        np.testing.assert_allclose(np.asarray(limg_d), limg_h, atol=0.1)
        np.testing.assert_allclose(np.asarray(rimg_d), rimg_h, atol=0.1)
        np.testing.assert_array_equal(np.asarray(mask_d), mask_h)
        n_checked += 1
    assert n_checked == 4
