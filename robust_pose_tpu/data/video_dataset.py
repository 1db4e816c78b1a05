"""Stereo mp4 video dataset — rebuild of reference dataset/video_dataset.py:14-78.

Iterable host-side decoder: cv2 VideoCapture, frame subsampling, vertically
stacked stereo split (top = left), specularity masking, resize then rectify,
timestamps from a side-car JSON, poses via read_freiburg.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Optional, Tuple

import cv2
import numpy as np

from robust_pose_tpu import se3
from robust_pose_tpu.data.stereo_dataset import mask_specularities
from robust_pose_tpu.data.transforms import ResizeStereo
from robust_pose_tpu.utils.trajectory import read_freiburg


class StereoVideoDataset:
    """Yields (limg (3,H,W) f32, rimg, mask (1,H,W) bool, pose_vec (7,),
    img_number str) per frame — the reference contract
    (video_dataset.py:63-75)."""

    def __init__(self, video_file: str, pose_file: Optional[str] = None,
                 img_size: Optional[Tuple] = None,
                 rectify: Optional[Callable] = None, sample: int = 1):
        self.video_file = video_file
        assert os.path.isfile(self.video_file)
        self.rectify = rectify
        # raw mode: yield the decode-scale uint8 stereo halves untouched
        # (mask/resize/rectify run on-device via data/device_preproc.py)
        self.raw = False
        ts_file = self.video_file.replace(".mp4", ".json")
        if os.path.isfile(ts_file):
            with open(ts_file, "r") as f:
                self.timestamps = [s["timestamp"] for s in json.load(f)]
        else:
            self.timestamps = None
        self.transform = ResizeStereo(img_size) if img_size is not None else None
        grabber = cv2.VideoCapture(self.video_file)
        self.length = int(grabber.get(cv2.CAP_PROP_FRAME_COUNT) / sample)
        grabber.release()
        self.sample = sample

        self.poses = None
        if pose_file is not None and os.path.isfile(pose_file):
            self.poses = read_freiburg(pose_file)

    def __iter__(self):
        return self._parse_video()

    def _parse_video(self):
        grabber = cv2.VideoCapture(self.video_file)
        counter = 0
        while True:
            while True:
                ret, img = grabber.read()
                counter += 1
                if not ret:
                    break
                if (counter - 1) % self.sample == 0:
                    break
            if not ret:
                break
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            limg, rimg = self._split_stereo_img(img)
            if self.poses is not None:
                if self.poses.shape[0] <= (counter - 1):
                    break
                pose = self.poses[counter - 1]
            else:
                pose = np.asarray(se3.identity(()))

            if self.raw:
                num = (self.timestamps[counter - 1]
                       if self.timestamps is not None else counter)
                yield limg, rimg, np.asarray(pose), str(num)
                continue

            mask = mask_specularities(limg)
            limg = limg.astype(np.float32)
            rimg = rimg.astype(np.float32)
            if self.transform is not None:
                limg, rimg, mask = self.transform(limg, rimg, mask)
            if self.rectify is not None:
                limg, rimg = self.rectify(limg, rimg)
            num = (self.timestamps[counter - 1]
                   if self.timestamps is not None else counter)
            yield (limg.transpose(2, 0, 1), rimg.transpose(2, 0, 1),
                   mask[None].astype(bool), np.asarray(pose), str(num))
        grabber.release()

    def __len__(self):
        return self.length

    @staticmethod
    def _split_stereo_img(img: np.ndarray):
        h = img.shape[0]
        return img[: h // 2], img[h // 2:]  # top = left (video_dataset.py:74-78)
