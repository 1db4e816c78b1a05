"""MFU / roofline accounting for the shipped hot paths on one TPU chip.

For each path this script compiles the EXACT production program (the same
jitted callable `bench.py` times — not a proxy), pulls FLOPs and HBM bytes
from XLA's compiled cost analysis, measures steady-state wall time, and
reports:

  * MFU  = realized FLOP/s / v5e bf16 peak
  * HBM utilization = realized bytes/s / v5e HBM bandwidth
  * the roofline-binding resource (which lower bound is larger), and the
    dispatch overhead (measured time minus the larger bound)

so "is this actually fast?" has a first-principles answer and every future
optimization can target the binding resource (VERDICT r3 item 2).

Paths: f2f streaming window (configuration/infer_f2f.yaml shape), f2m
streaming window (infer_scared.yaml, lbgfs_iters=100), and optionally the
production train step (--train; batch 8, remat, ~minutes to compile cold).

Peaks: TPU v5e (v5 lite) — 197 TFLOP/s bf16 MXU, 819 GB/s HBM. XLA's
"bytes accessed" is post-fusion operand+output traffic; it overstates true
HBM bytes when buffers stay resident in VMEM across fused consumers, so the
HBM bound here is conservative (real utilization >= reported).

Usage: python scripts/roofline.py [--train] [--json out.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # reuses the production builders + device wait + compile cache
import jax
import jax.numpy as jnp

V5E_BF16_FLOPS = 197e12  # per chip, bf16 systolic array
V5E_HBM_BPS = 819e9      # per chip, HBM bandwidth


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def analyze(tag, compiled, run, n_frames_per_dispatch, n_dispatches=6):
    flops, bts = _cost(compiled)
    # warm twice (first exec of a fresh executable pays ~minutes of program
    # load on the axon tunnel), then force a readback before timing
    r = run()
    r = run()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(n_dispatches):
        r = run()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / (n_dispatches * n_frames_per_dispatch)

    f_frame = flops / n_frames_per_dispatch
    b_frame = bts / n_frames_per_dispatch
    t_compute = f_frame / V5E_BF16_FLOPS
    t_hbm = b_frame / V5E_HBM_BPS
    bound = "compute" if t_compute >= t_hbm else "HBM"
    row = {
        "path": tag,
        "gflops_per_frame": round(f_frame / 1e9, 2),
        "hbm_gb_per_frame": round(b_frame / 1e9, 3),
        "measured_ms_per_frame": round(dt * 1e3, 2),
        "compute_bound_ms": round(t_compute * 1e3, 2),
        "hbm_bound_ms": round(t_hbm * 1e3, 2),
        "mfu_pct": round(100.0 * f_frame / dt / V5E_BF16_FLOPS, 1),
        "hbm_util_pct": round(100.0 * b_frame / dt / V5E_HBM_BPS, 1),
        "binding_resource": bound,
        "overhead_ms": round(dt * 1e3 - max(t_compute, t_hbm) * 1e3, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def f2f_path(window):
    est = bench.build_estimator({
        "frame2frame": True, "lbgfs_iters": 20, "conf_weighing": True,
        "depth_clipping": [1, 250], "dist_thr": 0.05, "average_pts": False,
    })
    ls, rs = bench.make_sequence(1)
    mask1 = np.ones((1, bench.H, bench.W, 1), bool)
    est(ls[0], rs[0], mask1)
    masks = jnp.ones((window, 1, bench.H, bench.W, 1), bool)
    ls, rs = bench.make_sequence(window, seed=1)
    ls, rs = jax.device_put(jnp.asarray(ls)), jax.device_put(jnp.asarray(rs))
    est.track_window(ls, rs, masks)  # builds + caches the jitted window
    compiled = est._jit_windows[False].lower(
        est.variables, est.last_pose, est.frame, est._feats, ls, rs,
        masks).compile()
    return analyze("f2f_window", compiled,
                   lambda: est.track_window(ls, rs, masks), window)


def f2m_path(window):
    est = bench.build_estimator({
        "frame2frame": False, "lbgfs_iters": 100, "conf_weighing": True,
        "depth_clipping": [1, 250], "dist_thr": 0.05, "average_pts": False,
        "map_capacity": window * bench.H * bench.W,
        "initial_bucket": window * bench.H * bench.W,
    })
    ls, rs = bench.make_sequence(1)
    mask1 = np.ones((1, bench.H, bench.W, 1), bool)
    est(ls[0], rs[0], mask1)
    masks = jnp.ones((window, 1, bench.H, bench.W, 1), bool)
    ls, rs = bench.make_sequence(window, seed=11)
    ls, rs = jax.device_put(jnp.asarray(ls)), jax.device_put(jnp.asarray(rs))
    est.track_window(ls, rs, masks)
    est.track_window(ls, rs, masks)  # second call = steady-state signature
    (_key, win), = est._f2m_windows.items()
    compiled = win.lower(est.variables, est.last_pose, est.scene.state,
                         est._model_frame, ls, rs, masks).compile()
    return analyze("f2m_window_iters100", compiled,
                   lambda: est.track_window(ls, rs, masks), window,
                   n_dispatches=4)


def train_path(batch=8, accum=2):
    sys.path.insert(0, os.path.dirname(__file__))
    import bench_train_step as bts
    from robust_pose_tpu.parallel.mesh import shard_batch
    trainer, state = bts.build(batch, remat=True, accum=accum)
    step = trainer.make_train_step()
    b = shard_batch(trainer.mesh, bts.make_batch(batch))
    compiled = step.lower(state, b).compile()
    holder = {"state": state}

    def run():
        holder["state"], metrics = compiled(holder["state"], b)
        return metrics["train/loss_total"]

    # "frames" = samples: per-sample numbers for the train path
    return analyze(f"train_step_batch{batch}", compiled, run, batch,
                   n_dispatches=3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="include the production train step (slow compile)")
    ap.add_argument("--skip-f2m", action="store_true")
    ap.add_argument("--json", help="write rows to this file")
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()

    rows = [f2f_path(args.window)]
    if not args.skip_f2m:
        rows.append(f2m_path(4))
    if args.train:
        rows.append(train_path())
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
