"""Per-sequence trajectory comparison plots — rebuild of reference
evaluation/trajectory_plots.py:1-65 (xyz-vs-time panels across methods with
optional Horn pre-alignment).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from robust_pose_tpu.utils.evaluate import evaluate
from robust_pose_tpu.utils.trajectory import read_freiburg, vec2mat
from robust_pose_tpu.utils.trajectory_analyzer import TrajectoryAnalyzer

COLORS = {
    "ground-truth": ["k", 2.5, "dashed"],
    "orbslam2": ["b", 1, "dashdot"],
    "efusion": ["m", 0.5, "solid"],
    "ours": ["goldenrod", 2.5, "solid"],
}

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Plot Trajectories")
    parser.add_argument("base_path", type=str, help="Path to dataset keyframe.")
    parser.add_argument("--methods", type=str, nargs="+",
                        default=["orbslam2", "ours", "ground-truth"])
    parser.add_argument("--prealign", action="store_true")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    keyframe = os.path.basename(args.base_path)
    dataset = os.path.basename(os.path.dirname(args.base_path))
    plotter = TrajectoryAnalyzer(title=f"{dataset}/{keyframe}")

    paths = {m: os.path.join(args.base_path, "data", m, "trajectory.freiburg")
             for m in args.methods if m != "ground-truth"}
    gt_path = os.path.join(args.base_path, "groundtruth.txt")

    gt_poses = None
    for meth, path in paths.items():
        assert os.path.isfile(path), f"{meth} does not exist"
        ate, rpe_t, rpe_r, *_, T, gt_poses, _ = evaluate(
            gt_path, path, offset=-4, ret_align_T=True)
        print(meth)
        print("ATE-RMSE:", ate, " mm")
        print("RPE-trans:", rpe_t, " mm")
        print("RPE-rot:", rpe_r)
        pose_arrs = vec2mat(read_freiburg(path))
        if args.prealign:
            pose_arrs = T[None] @ pose_arrs
        else:
            pose_arrs = np.linalg.inv(pose_arrs[0])[None] @ pose_arrs
        c = COLORS.get(meth, ["g", 1, "solid"])
        plotter.add_pose_trajectory(
            pose_arrs, label="ORB-SLAM2" if meth == "orbslam2" else meth,
            color=c[0], linewidth=c[1], linestyle=c[2])

    if "ground-truth" in args.methods and os.path.isfile(gt_path):
        poses = vec2mat(read_freiburg(gt_path))
        if not args.prealign:
            poses = np.linalg.inv(poses[0])[None] @ poses
        c = COLORS["ground-truth"]
        plotter.add_pose_trajectory(poses, label="ground-truth", color=c[0],
                                    linewidth=c[1], linestyle=c[2])
    plotter.legend()
    out = args.out or (os.path.basename(args.base_path) + ".pdf")
    plotter.write_file(out)
    print(f"saved {out}")
