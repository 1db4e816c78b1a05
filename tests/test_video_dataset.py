"""StereoVideoDataset + preprocess_video_data tests over a generated
vertically-stacked stereo mp4 (reference dataset/video_dataset.py:14-78 and
scripts/preprocess_video_data.py:22-86 behavior)."""
import json
import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 64, 96  # per-eye size; the video is vertically stacked (2H, W)
N_FRAMES = 6


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("vidseq")
    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (2 * H, W + 16, 3)).astype(np.float32), (0, 0), 2
    ).astype(np.uint8)

    path = str(root / "video.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (W, 2 * H))
    assert vw.isOpened(), "mp4 writer unavailable"
    for i in range(N_FRAMES):
        vw.write(base[:, 2 * i:2 * i + W])
    vw.release()

    with open(root / "video.json", "w") as f:
        json.dump([{"timestamp": 100 + i} for i in range(N_FRAMES)], f)
    with open(root / "groundtruth.txt", "w") as f:
        f.write("\n".join(
            f"{i} {0.001 * i} 0.0 0.0 0.0 0.0 0.0 1.0"
            for i in range(1, N_FRAMES + 1)) + "\n")

    cal = {"data": {"width": W, "height": H, "intrinsics": [
        {"f": [100.0, 100.0], "c": [W / 2, H / 2], "k": [0, 0, 0, 0, 0]},
        {"f": [100.0, 100.0], "c": [W / 2, H / 2], "k": [0, 0, 0, 0, 0]}],
        "extrinsics": {"T": [-3.0, 0.0, 0.0], "om": [0.0, 0.0, 0.0]}}}
    with open(root / "camcal.json", "w") as f:
        json.dump(cal, f)
    return str(root)


def test_video_dataset_iteration(video_dir):
    from robust_pose_tpu.data.video_dataset import StereoVideoDataset

    ds = StereoVideoDataset(
        os.path.join(video_dir, "video.mp4"),
        pose_file=os.path.join(video_dir, "groundtruth.txt"),
        img_size=(W, H),
    )
    items = list(ds)
    assert len(items) == N_FRAMES
    limg, rimg, mask, pose, num = items[0]
    assert limg.shape == (3, H, W)
    assert rimg.shape == (3, H, W)
    assert mask.shape == (1, H, W) and mask.dtype == bool
    assert pose.shape == (7,)
    assert num == "100"  # side-car timestamps used as frame numbers
    # top half = left, bottom half = right: frames differ between eyes
    assert not np.allclose(limg, rimg)


def test_video_dataset_subsampling(video_dir):
    from robust_pose_tpu.data.video_dataset import StereoVideoDataset

    ds = StereoVideoDataset(os.path.join(video_dir, "video.mp4"),
                            img_size=(W, H), sample=2)
    items = list(ds)
    assert len(items) == N_FRAMES // 2


def test_get_data_dispatches_to_video(video_dir):
    from robust_pose_tpu.data.dataset_utils import StereoVideoDataset, get_data

    ds, calib = get_data(video_dir, (W, H))
    assert isinstance(ds, StereoVideoDataset)
    assert calib["bf"] > 0


def test_preprocess_video_data(video_dir, tmp_path):
    from scripts.preprocess_video_data import main

    out = str(tmp_path / "out")
    main(video_dir, out, 1, "conventional", img_size=(W, H))
    frames = sorted(os.listdir(os.path.join(out, "video_frames")))
    # l+r per frame
    assert len(frames) == 2 * N_FRAMES
    img = cv2.imread(os.path.join(out, "video_frames", frames[0]))
    assert img.shape == (H, W, 3)
