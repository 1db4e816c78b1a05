"""Results aggregation — rebuild of reference evaluation/inspect_results.py
and inspect_results_test.py.

Aggregates per-run ATE/RPE into per-dataset mean±std tables with macro/micro
averages and a violin plot. Two sources:

* ``--source local`` (default): walk a results root where each run directory
  layout is ``<root>/<method>/<dataset>/<run>/trajectory.freiburg`` with the
  matching ``groundtruth.txt`` next to the dataset (metrics recomputed).
* ``--source wandb``: pull run summaries from a W&B project exactly like the
  reference (requires wandb credentials).
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd


def collect_local(root: str, methods):
    from robust_pose_tpu.utils.evaluate import evaluate

    rows = []
    for method in methods:
        for traj in sorted(glob.glob(
                os.path.join(root, method, "**", "trajectory.freiburg"),
                recursive=True)):
            run_dir = os.path.dirname(traj)
            # find groundtruth next to the run or up the tree
            gt = None
            d = run_dir
            for _ in range(4):
                cand = os.path.join(d, "groundtruth.txt")
                if os.path.isfile(cand):
                    gt = cand
                    break
                d = os.path.dirname(d)
            if gt is None:
                continue
            ate, rpe_t, rpe_r, trans_error, *_ = evaluate(gt, traj, offset=-4)
            rows.append({
                "method": method,
                "dataset": os.path.basename(os.path.dirname(run_dir)),
                "run_name": run_dir,
                "ATE/RMSE": ate,
                "RPE/trans": rpe_t,
                "RPE/rot": rpe_r,
                "frame": len(trans_error),
            })
    return pd.DataFrame(rows)


def collect_wandb(project: str, methods):
    import wandb

    api = wandb.Api()
    rows = []
    for run in api.runs(project):
        d = dict(run.summary._json_dict)
        d.update({k: v for k, v in run.config.items() if not k.startswith("_")})
        d.update({"run_name": run.name, "state": run.state,
                  "method": run._attrs["group"], "id": run.id})
        rows.append(d)
    df = pd.DataFrame(rows)
    df = df[df.method.isin(methods)]
    if "keyframe" in df:
        df["dataset"] = [str(k)[:9] for k in df["keyframe"]]
    elif "dataset" in df:
        df["dataset"] = [os.path.basename(str(d)) for d in df["dataset"]]
    return df


def report(runs_df: pd.DataFrame, methods, plot: bool = False):
    runs_df = runs_df.copy()
    runs_df["RPE/rot"] = runs_df["RPE/rot"] * 180 / np.pi  # rad -> deg
    for metric, unit in (("ATE/RMSE", "mm"), ("RPE/trans", "mm"),
                         ("RPE/rot", "deg")):
        print("\n------------")
        print(f"{metric} in {unit}")
        for method in methods:
            df = runs_df[runs_df.method.eq(method)]
            if df.empty:
                continue
            print("\n------------")
            print(method)
            if "frame" in df:
                print("average duration in frames:", df["frame"].mean(),
                      "+/-", df["frame"].std())
            g = pd.DataFrame({
                "mean": df.groupby("dataset")[metric].mean(),
                "std": df.groupby("dataset")[metric].std(),
            })
            print(g)
            print("macro average:", g["mean"].mean(), "+/-", g["mean"].std())
            print("micro average:", df[metric].mean(), "+/-",
                  df[metric].std())
    if plot:
        import matplotlib.pyplot as plt
        import seaborn as snb

        snb.violinplot(y="ATE/RMSE", x="dataset", hue="method", data=runs_df)
        plt.show()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Inspect benchmarking results (local dirs or WandB)")
    parser.add_argument("project", type=str,
                        help="results root (local) or <entity/project> (wandb)")
    parser.add_argument("--methods", nargs="+", type=str,
                        default=["test_orbslam2", "test_efusion", "test_ours"])
    parser.add_argument("--source", choices=["local", "wandb"],
                        default="local")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    if args.source == "wandb":
        df = collect_wandb(args.project, args.methods)
    else:
        df = collect_local(args.project, args.methods)
    if df.empty:
        print("no runs found")
        sys.exit(1)
    df.to_csv("project.csv")
    report(df, args.methods, args.plot)
