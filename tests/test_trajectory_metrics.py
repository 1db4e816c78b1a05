"""Trajectory I/O and ATE/RPE metric tests."""
import numpy as np
import pytest

from robust_pose_tpu.utils.metrics import (
    absolute_trajectory_error,
    horn_align,
    relative_pose_error,
    total_trajectory_length,
)
from robust_pose_tpu.utils.trajectory import (
    mat2vec,
    read_freiburg,
    save_trajectory,
    vec2mat,
)
from robust_pose_tpu.utils.evaluate import evaluate


def _random_traj(n=50, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.spatial.transform import Rotation
    mats = np.tile(np.eye(4), (n, 1, 1))
    pos = np.cumsum(rng.normal(0, 5.0, (n, 3)), axis=0)
    mats[:, :3, 3] = pos
    mats[:, :3, :3] = Rotation.random(n, rng=rng).as_matrix()
    return mats


def test_vec_mat_roundtrip():
    mats = _random_traj()
    vecs = mat2vec(mats)
    back = vec2mat(vecs)
    np.testing.assert_allclose(back, mats, atol=1e-10)


def test_freiburg_roundtrip(tmp_path):
    mats = _random_traj(20)
    vecs = mat2vec(mats)
    traj = [{"camera-pose": v, "timestamp": 100 * i} for i, v in enumerate(vecs)]
    save_trajectory(traj, str(tmp_path))
    poses, stamps = read_freiburg(str(tmp_path / "trajectory.freiburg"),
                                  ret_stamps=True)
    np.testing.assert_allclose(poses, vecs, atol=1e-5)
    assert list(stamps) == [100 * i for i in range(20)]


def test_ate_zero_for_identical():
    mats = _random_traj()
    ate, errs = absolute_trajectory_error(mats, mats)
    assert ate < 1e-9


def test_ate_invariant_to_rigid_offset():
    """Horn pre-alignment removes a global rigid transform."""
    mats = _random_traj()
    T = np.eye(4)
    from scipy.spatial.transform import Rotation
    T[:3, :3] = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    T[:3, 3] = [100.0, -30.0, 12.0]
    moved = T[None] @ mats
    ate, _ = absolute_trajectory_error(mats, moved, prealign=True)
    assert ate < 1e-6


def test_ate_detects_noise():
    mats = _random_traj()
    noisy = mats.copy()
    noisy[:, :3, 3] += np.random.default_rng(1).normal(0, 2.0, (len(mats), 3))
    ate, _ = absolute_trajectory_error(mats, noisy)
    assert 0.5 < ate < 5.0


def test_rpe_zero_for_identical():
    mats = _random_traj()
    t, r = relative_pose_error(mats, mats)
    assert np.all(t < 1e-9)
    assert np.all(r < 1e-4)


def test_traj_length():
    locs = np.array([[0, 0, 0], [3, 4, 0], [3, 4, 12]], dtype=float)
    assert total_trajectory_length(locs) == pytest.approx(17.0)


def test_evaluate_end_to_end(tmp_path):
    """Full eval path: save pred + gt files, timestamp offset, read metrics
    (reference evaluate_ate_freiburg.py:6-31 with offset)."""
    mats = _random_traj(30)
    vecs = mat2vec(mats)
    gt = [{"camera-pose": v, "timestamp": i} for i, v in enumerate(vecs)]
    pred = [{"camera-pose": v, "timestamp": i - 4} for i, v in enumerate(vecs)]
    save_trajectory(gt, str(tmp_path), "gt.freiburg")
    save_trajectory(pred, str(tmp_path), "pred.freiburg")
    ate, rpe_t, rpe_r, *_ = evaluate(
        str(tmp_path / "gt.freiburg"), str(tmp_path / "pred.freiburg"),
        delta=1, offset=4,
    )
    assert ate < 1e-4
    assert rpe_t < 1e-4
