"""Smoke tests for the trajectory plotting surfaces (reference
evaluation/trajectory_plots.py:1-65 and core/utils/trajectory_analyzer.py):
synthetic result-dir layout -> CLI -> output figure exists; analyzer API
drives matplotlib headlessly."""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_traj(path, n, step=0.001, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(1, n + 1):
        t = step * i + noise * rng.normal()
        lines.append(f"{i} {t} 0.0 0.0 0.0 0.0 0.0 1.0")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_trajectory_analyzer_writes_figure(tmp_path):
    from robust_pose_tpu.utils.trajectory_analyzer import TrajectoryAnalyzer

    poses = np.tile(np.eye(4)[None], (6, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 5.0, 6)
    ta = TrajectoryAnalyzer(title="smoke")
    ta.add_pose_trajectory(poses, label="ours", color="g")
    ta.legend()
    out = str(tmp_path / "traj.png")
    ta.write_file(out)
    assert os.path.isfile(out) and os.path.getsize(out) > 0


@pytest.mark.parametrize("prealign", [False, True])
def test_trajectory_plots_cli(tmp_path, prealign):
    base = tmp_path / "StereoMIS" / "P2_8"
    _write_traj(str(base / "groundtruth.txt"), 12)
    _write_traj(str(base / "data" / "ours" / "trajectory.freiburg"), 12,
                noise=1e-5, seed=1)
    out = str(tmp_path / "plot.pdf")
    cmd = [sys.executable, os.path.join(REPO, "evaluation",
                                        "trajectory_plots.py"),
           str(base), "--methods", "ours", "ground-truth", "--out", out]
    if prealign:
        cmd.append("--prealign")
    env = dict(os.environ, MPLBACKEND="Agg", JAX_PLATFORMS="cpu")
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=300)
    assert res.returncode == 0, res.stderr
    assert "ATE-RMSE" in res.stdout
    assert os.path.isfile(out) and os.path.getsize(out) > 0
