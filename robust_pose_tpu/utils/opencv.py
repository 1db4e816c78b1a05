"""cv2 keypoint converters — rebuild of reference core/utils/opencv.py."""
import cv2
import numpy as np


def kpts2npy(cv2kpts):
    return np.array([[kp.pt[0], kp.pt[1]] for kp in cv2kpts])


def npy2kpts(np_pts):
    return [cv2.KeyPoint(float(pt[0]), float(pt[1]), 1.0) for pt in np_pts]
