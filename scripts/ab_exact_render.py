"""A/B: `exact_render` on vs off in the production f2m path.

The f2m surfel render resolves per-pixel winners either with an exact
two-pass argmax (`exact_render=True`, bit-identical to max-confidence-wins)
or a single-pass packed-key scatter-max (`False`, the production default at
slam/pose_estimator.py — confidence ties resolve at 2^-conf_bits granularity
with slot id as the tiebreak). The reference's own tie order is
sort-arbitrary (/root/reference/core/fusion/surfel_map.py:242-254), so
neither mode is "wrong" — this script MEASURES the trade (VERDICT r3
item 6): tracks the same synthetic sequence under both modes and reports

  * per-frame pose-vector divergence (max |Δ| over the chain),
  * ATE-RMSE between the two trajectories (Horn-aligned, mm-equivalent
    units of the benchmark scene),
  * streaming FPS of each mode,

as one JSON line. Run on the TPU chip: `python scripts/ab_exact_render.py`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench
import jax
import jax.numpy as jnp


def run_mode(exact, n_windows=4, t_window=4):
    est = bench.build_estimator({
        "frame2frame": False, "lbgfs_iters": 100, "conf_weighing": True,
        "depth_clipping": [1, 250], "dist_thr": 0.05, "average_pts": False,
        "map_capacity": t_window * bench.H * bench.W,
        "initial_bucket": t_window * bench.H * bench.W,
        "exact_render": exact,
    })
    ls, rs = bench.make_sequence(1)
    mask1 = np.ones((1, bench.H, bench.W, 1), bool)
    est(ls[0], rs[0], mask1)
    masks = jnp.ones((t_window, 1, bench.H, bench.W, 1), bool)
    windows = []
    for i in range(n_windows):
        ls, rs = bench.make_sequence(t_window, seed=31 + i)
        windows.append((jax.device_put(jnp.asarray(ls)),
                        jax.device_put(jnp.asarray(rs))))
    jax.block_until_ready(windows)
    # warm both compile signatures (first-frame + steady state), then replay
    # the SAME windows for the timed/recorded pass
    for i in (0, 1):
        est.track_window(windows[i][0], windows[i][1], masks)
    all_poses = []
    t0 = time.perf_counter()
    for lw, rw in windows:
        poses, succ = est.track_window(lw, rw, masks)
        all_poses.append(poses)
    flat = jnp.concatenate(all_poses)[:, 0]
    flat_np = np.asarray(flat)  # forced readback ends the timing honestly
    dt = (time.perf_counter() - t0) / (n_windows * t_window)
    return flat_np, 1.0 / dt


def main():
    from robust_pose_tpu.se3 import matrix as se3_matrix
    from robust_pose_tpu.utils.metrics import absolute_trajectory_error

    vec_on, fps_on = run_mode(True)
    vec_off, fps_off = run_mode(False)
    mats_on = np.asarray(se3_matrix(jnp.asarray(vec_on)))
    mats_off = np.asarray(se3_matrix(jnp.asarray(vec_off)))
    ate, *_ = absolute_trajectory_error(mats_on, mats_off)
    print(json.dumps({
        "metric": "exact_render_ab_f2m",
        "ate_rmse_between_modes": round(float(ate), 6),
        "max_pose_vec_delta": round(float(np.abs(vec_on - vec_off).max()), 6),
        "fps_exact_on": round(fps_on, 3),
        "fps_exact_off": round(fps_off, 3),
        "frames": len(vec_on),
    }))


if __name__ == "__main__":
    main()
