"""Test-set benchmark CLI — rebuild of reference scripts/benchmark_test.py:8-82.

Runs infer_trajectory over the ranges defined in ``test_split.csv``.
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
        description="script to benchmark pose estimation on the test split")
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
    assert os.path.isfile(os.path.join(args.input, "test_split.csv"))

    base_out = args.outpath
    df = pd.read_csv(os.path.join(args.input, "test_split.csv"))
    for i, row in df.iterrows():
        args.start = int(row["start"])
        args.stop = int(row["end"])
        if base_out is not None:
            args.outpath = os.path.join(base_out, f"{i}")
        config.update({"start": args.start, "end": args.stop, "seq_number": i})
        print(f"{args.start} -> {args.stop}")
        infer_trajectory(args, config)
