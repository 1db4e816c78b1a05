"""Training pair datasets — rebuild of reference dataset/train_datasets.py:15-145.

``PoseDataset`` samples frame pairs with a random temporal step and computes
ground-truth relative poses from the freiburg file; ``get_data`` builds the
multi-sequence concatenation with per-sequence rectified calibration.
Host-side numpy; batches are assembled by the training loop.
"""
from __future__ import annotations

import os
from glob import glob
from typing import List, Sequence, Tuple

import cv2
import numpy as np

from robust_pose_tpu.data.dataset_utils import find_calib_file
from robust_pose_tpu.data.rectification import StereoRectifier
from robust_pose_tpu.utils.trajectory import read_freiburg, vec2mat, mat2vec


class ConcatDataset:
    """Minimal torch-free ConcatDataset."""

    def __init__(self, datasets: Sequence):
        self.datasets = [d for d in datasets if len(d) > 0]
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        ds = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[ds][idx - self._offsets[ds]]


def _rel_pose(p1_vec: np.ndarray, p2_vec: np.ndarray) -> np.ndarray:
    """poses[i]^-1 * poses[i+s] as a 7-vec (reference train_datasets.py:90)."""
    m = np.linalg.inv(vec2mat(p1_vec)[0]) @ vec2mat(p2_vec)[0]
    return mat2vec(m[None])[0]


class PoseDataset:
    """(reference train_datasets.py:62-145)

    __getitem__ -> (img1, img2, img1r, img2r, mask1, mask2, pose_vec (7,),
    intrinsics (3,3), baseline float) with pose translation and baseline
    scaled by 1/depth_cutoff.
    """

    def __init__(self, root: str, baseline: float, intrinsics: np.ndarray,
                 depth_cutoff: float = 300.0, conf_thr: float = 0.0,
                 step=(1, 10), img_size=(512, 640), samples: int = -1,
                 rng: np.random.Generator = None):
        rng = rng or np.random.default_rng(1234)
        images_l = sorted(glob(os.path.join(root, "video_frames", "*l.png")))
        images_r = sorted(glob(os.path.join(root, "video_frames", "*r.png")))
        masks = sorted(glob(os.path.join(root, "masks", "*l.png")))
        poses = read_freiburg(os.path.join(root, "groundtruth.txt"))
        assert len(images_l) == len(images_r)
        assert len(images_l) > 0, f"no images in {root}"
        n_list = images_l if len(masks) == 0 else masks
        if isinstance(step, int):
            step = (step, step)
        sample_list = self._random_sample(step, samples, len(n_list), rng)

        self.depth_cutoff = depth_cutoff
        self.image_list: List = []
        self.image_list_r: List = []
        self.mask_list: List = []
        self.rel_pose_list: List = []
        for i in sample_list:
            s = int(rng.integers(*step)) if step[0] < step[1] else step[0]
            n1 = int(os.path.basename(n_list[i]).split("l.png")[0])
            n2 = int(os.path.basename(n_list[i + s]).split("l.png")[0])
            self.image_list.append([
                n_list[i].replace("masks", "video_frames"),
                n_list[i + s].replace("masks", "video_frames"),
            ])
            self.rel_pose_list.append(_rel_pose(poses[n1 - 1], poses[n2 - 1]))
            self.image_list_r.append([
                p.replace("l.png", "r.png") for p in self.image_list[-1]
            ])
            if len(masks) == 0:
                self.mask_list.append([None, None])
            else:
                self.mask_list.append([
                    n_list[i].replace("video_frames", "masks"),
                    n_list[i + s].replace("video_frames", "masks"),
                ])
        self.img_size = tuple(img_size)
        self.intrinsics = np.asarray(intrinsics, np.float32)
        self.baseline = float(baseline)

    def __getitem__(self, index: int):
        img1 = self._read_img(self.image_list[index][0])
        img2 = self._read_img(self.image_list[index][1])
        img1r = self._read_img(self.image_list_r[index][0])
        img2r = self._read_img(self.image_list_r[index][1])
        pose = self.rel_pose_list[index].copy()
        # scale translation + baseline for normalized depth
        # (reference train_datasets.py:112-113)
        pose[:3] /= self.depth_cutoff
        baseline = self.baseline / self.depth_cutoff
        mask1 = self._read_mask(self.mask_list[index][0])
        mask2 = self._read_mask(self.mask_list[index][1])
        return (img1, img2, img1r, img2r, mask1, mask2,
                pose.astype(np.float32), self.intrinsics, np.float32(baseline))

    def _read_img(self, path: str) -> np.ndarray:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.img_size[1], self.img_size[0]),
                         interpolation=cv2.INTER_LINEAR)
        return img.transpose(2, 0, 1).astype(np.float32)

    def _read_mask(self, path) -> np.ndarray:
        if path is not None:
            mask = cv2.imread(path, cv2.IMREAD_GRAYSCALE) > 0
            mask = cv2.resize(mask.astype(np.uint8),
                              (self.img_size[1], self.img_size[0]),
                              interpolation=cv2.INTER_NEAREST) > 0
            return mask[None]
        return np.ones((1, *self.img_size), dtype=bool)

    def __len__(self):
        return len(self.image_list)

    @staticmethod
    def _random_sample(step, samples, total, rng):
        if (samples > 0) and (samples < total):
            return sorted(rng.choice(total - step[1], size=samples,
                                     replace=False))
        return np.arange(total - step[1])


def get_data(config: dict, img_size: Tuple, depth_cutoff: float):
    """Multi-sequence training dataset with per-sequence calibration
    (reference train_datasets.py:15-59)."""
    rng = np.random.default_rng(1234)
    img_size = tuple(img_size)
    baseline, intrinsics = [], []
    for seq in config["sequences"]:
        calib_path = os.path.join(config["basepath"], seq, "keyframe_1")
        if not os.path.exists(calib_path):
            calib_path = os.path.join(config["basepath"], seq)
        calib_file = find_calib_file(calib_path)
        rect = StereoRectifier(
            calib_file, img_size_new=(img_size[1], img_size[0]),
            mode="conventional",
        )
        calib = rect.get_rectified_calib()
        baseline.append(np.float32(calib["bf"]))
        intrinsics.append(calib["intrinsics"]["left"].astype(np.float32))

    ds = [sorted(glob(os.path.join(config["basepath"], s, "keyframe_*")))
          for s in config["sequences"]]
    if len(ds[0]) == 0:
        ds = [[os.path.join(config["basepath"], s)]
              for s in config["sequences"]]

    subsets = []
    for i, _ in enumerate(config["sequences"]):
        for d in ds[i]:
            if os.path.isfile(os.path.join(d, "groundtruth.txt")):
                try:
                    subsets.append(PoseDataset(
                        d, baseline[i], intrinsics[i], depth_cutoff, 0.0,
                        config["step"], img_size, config["samples"], rng=rng,
                    ))
                except AssertionError:
                    pass
    return ConcatDataset(subsets)
