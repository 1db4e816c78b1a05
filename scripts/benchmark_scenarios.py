"""Scenario benchmark CLI — rebuild of reference scripts/benchmark_scenarios.py:7-81.

Runs infer_trajectory over 300-frame windows defined by ``scenarios.csv``
(breathing / tool-deformation scenarios) and aggregates per-window outputs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd
import yaml

from scripts.infer_trajectory import main as infer_trajectory

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="script to benchmark pose estimation on surgical scenarios")
    parser.add_argument("input", type=str, help="Path to input folder.")
    parser.add_argument("--checkpoint", type=str,
                        default="../trained/poseNet_2xf8up4b.pth")
    parser.add_argument("--outpath", type=str)
    parser.add_argument("--config", type=str,
                        default=os.path.join(os.path.dirname(__file__),
                                             "../configuration/infer_f2f.yaml"))
    parser.add_argument("--device", choices=["cpu", "tpu"], default="tpu")
    parser.add_argument("--step", type=int, default=1)
    parser.add_argument("--log", default=None)
    parser.add_argument("--viewer", default="none", choices=["none", "2d"])
    parser.add_argument("--block_viewer", action="store_true")
    parser.add_argument("--window", type=int, default=1,
                        help="track N frames per compiled dispatch (streaming)")
    parser.add_argument("--device-preproc", action="store_true",
                        dest="device_preproc",
                        help="on-device mask/resize/rectify (video datasets)")
    args = parser.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)
    assert os.path.exists(args.checkpoint), "no valid checkpoint file"
    assert os.path.isfile(os.path.join(args.input, "scenarios.csv"))

    base_out = args.outpath
    df = pd.read_csv(os.path.join(args.input, "scenarios.csv"))
    for i, row in df.iterrows():
        args.start = int(row["start"])
        args.stop = int(min(row["start"] + 300, row["end"]))
        if base_out is not None:
            args.outpath = os.path.join(base_out, f"{i}")
        config.update({"scenario": row["scenario"], "start": args.start,
                       "seq_number": i})
        print(f'{args.start} -> {args.stop} : {row["scenario"]}')
        infer_trajectory(args, config)
