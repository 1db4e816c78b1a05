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


def _method_block(df: pd.DataFrame, metric: str):
    """One per-method block: duration, per-dataset mean±std table, macro
    average (mean of per-dataset means ± their std) — the exact layout of
    reference inspect_results_test.py:67-74."""
    print("average duration in frames:", df["frame"].mean(), "+/-",
          df["frame"].std())
    g = pd.DataFrame({
        "mean": df.groupby("dataset", observed=True)[metric].mean(),
        "std": df.groupby("dataset", observed=True)[metric].std(),
    })
    print(g)
    print("macro average:", g["mean"].mean(), "+/-", g["mean"].std())
    return g


def report_test(runs_df: pd.DataFrame, methods):
    """Test-set comparison protocol: per-sequence mean±std + macro average
    for each method group across ATE/RPE-trans/RPE-rot — reproduces
    reference evaluation/inspect_results_test.py:60-97 line for line."""
    runs_df = runs_df.copy()
    runs_df["RPE/rot"] = runs_df["RPE/rot"] * 180 / np.pi  # rad -> deg
    for metric, title in (("ATE/RMSE", "ATE-RMSE in mm"),
                          ("RPE/trans", "RPE-trans in mm"),
                          ("RPE/rot", "RPE-rot in deg")):
        print("\n------------")
        print(title)
        for method in methods:
            print("\n------------")
            print(method)
            df = runs_df[runs_df.method.eq(method)]
            _method_block(df, metric)


def report_scenario(runs_df: pd.DataFrame, methods, plot: bool = False):
    """Scenario benchmarking protocol: ATE per method (macro + micro), then
    per-run info per dataset x keyframe — reproduces reference
    evaluation/inspect_results.py:61-88."""
    print("\n------------")
    print("ATE-RMSE in mm")
    for method in methods:
        print("\n------------")
        print(method)
        df = runs_df[runs_df.method.eq(method)]
        _method_block(df, "ATE/RMSE")
        print("micro average:", df["ATE/RMSE"].mean(), "+/-",
              df["ATE/RMSE"].std())

    print("\n------------")
    print("ATE-RMSE in mm")
    key = "keyframe" if "keyframe" in runs_df else "run_name"
    for run in runs_df.dataset.unique():
        df = runs_df[runs_df.dataset.eq(run)]
        for kf in df[key].unique():
            print("\n------------")
            print(run, kf)
            df1 = df[df[key].eq(kf)]
            print(df1[["method", "ATE/RMSE"]])
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
    parser.add_argument("--group-mode", choices=["test", "scenario"],
                        default="test",
                        help="'test': the paper's test-set comparison tables "
                             "(inspect_results_test.py); 'scenario': the "
                             "scenario ATE protocol (inspect_results.py)")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    if args.source == "wandb":
        df = collect_wandb(args.project, args.methods)
    else:
        df = collect_local(args.project, args.methods)
    if df.empty:
        print("no runs found")
        sys.exit(1)
    # stable method ordering exactly like the reference (categorical sort,
    # inspect_results_test.py:56-58)
    df["method"] = df["method"].astype("category").cat.set_categories(
        args.methods)
    df = df.sort_values(["method"])
    df.to_csv("project.csv")
    if args.group_mode == "test":
        report_test(df, args.methods)
    else:
        report_scenario(df, args.methods, args.plot)
