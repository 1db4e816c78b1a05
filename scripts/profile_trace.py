"""Hardware-counter profile of the SHIPPED window-tracking programs.

Runs the exact `bench.py` f2f / f2m window program under `jax.profiler.trace`
and aggregates the device xplane's per-HLO-op rows (xprof `hlo_stats`):
self time, measured HBM bandwidth (hardware counters, not XLA's static
"bytes accessed" model), operational intensity and bound-by classification.
This resolves the roofline ambiguity BASELINE.md carries — XLA's byte model
overstates f2f HBM traffic (118.9% "utilization"); the counters here are
what the chip physically moved.

Outputs:
  * total device ms/frame and TRUE HBM GB/frame (sum over ops of
    hbm_bw x self_time),
  * HBM utilization vs the v5e 819 GB/s peak,
  * top ops by self time with their HBM bytes and bound-by,
  * a by-category rollup.

Usage: python scripts/profile_trace.py [--path f2f|f2m] [--window 8]
          [--windows 2] [--top 25] [--json out.json]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_HBM_GBPS = 819.0  # GB/s


def run_traced(path_kind: str, t_window: int, n_windows: int, logdir: str):
    import jax
    import jax.numpy as jnp
    import bench

    cfg = {
        "frame2frame": path_kind == "f2f",
        "lbgfs_iters": 20 if path_kind == "f2f" else 100,
        "conf_weighing": True, "depth_clipping": [1, 250], "dist_thr": 0.05,
        "average_pts": False,
    }
    if path_kind == "f2m":
        cfg.update(map_capacity=bench.F2M_POOL_FRAMES * bench.H * bench.W,
                   initial_bucket=bench.F2M_POOL_FRAMES * bench.H * bench.W,
                   winner=os.environ.get("BENCH_F2M_WINNER", "segsort"))
    est = bench.build_estimator(cfg)
    print("estimator built", flush=True)
    ls, rs = bench.make_sequence(1)
    est(ls[0], rs[0], np.ones((1, bench.H, bench.W, 1), bool))
    print("first frame committed", flush=True)
    masks = jnp.ones((t_window, 1, bench.H, bench.W, 1), bool)
    windows = []
    for i in range(n_windows + 2):
        l, r = bench.make_sequence(t_window, seed=1 + i)
        windows.append((jax.device_put(jnp.asarray(l)),
                        jax.device_put(jnp.asarray(r))))
    jax.block_until_ready(windows)
    for i in (-1, -2):  # two warmups: first-frame + steady-state signatures
        poses, _ = est.track_window(windows[i][0], windows[i][1], masks)[:2]
        _ = float(jnp.sum(poses))
        print(f"warmup {-i} done", flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for i in range(n_windows):
            poses, _ = est.track_window(windows[i][0], windows[i][1],
                                        masks)[:2]
        _ = float(jnp.sum(poses))  # forced readback inside the trace
    wall = time.perf_counter() - t0
    return wall


def parse_hlo_stats(logdir: str):
    from xprof.convert import raw_to_tool_data as r2t
    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {logdir}"
    data, _ = r2t.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    tbl = json.loads(data if isinstance(data, str) else data.decode())
    idx = {c["id"]: i for i, c in enumerate(tbl["cols"])}

    def val(row, col):
        v = row["c"][idx[col]]
        return v.get("v") if v else None

    rows = []
    for row in tbl["rows"]:
        rows.append({
            "category": val(row, "category"),
            "name": val(row, "hlo_op_name"),
            "tf_op": val(row, "tf_op_name"),
            "n": val(row, "occurrences"),
            "self_us": val(row, "total_self_time"),
            "hbm_gibps": val(row, "hbm_bw") or 0.0,
            "mem_gibps": val(row, "measured_memory_bw") or 0.0,
            "bound_by": val(row, "bound_by"),
            "intensity": val(row, "operational_intensity"),
        })
    return rows


def report(rows, n_frames, top, json_out=None):
    GIB = 1 << 30
    tot_us = sum(r["self_us"] for r in rows)
    tot_hbm = sum(r["hbm_gibps"] * GIB * r["self_us"] * 1e-6 for r in rows)
    ms_frame = tot_us / 1e3 / n_frames
    gb_frame = tot_hbm / 1e9 / n_frames
    util = (tot_hbm / (tot_us * 1e-6)) / (V5E_HBM_GBPS * 1e9)
    print(f"device time: {ms_frame:.2f} ms/frame over {n_frames} frames")
    print(f"TRUE HBM traffic (hardware counters): {gb_frame:.2f} GB/frame")
    print(f"average HBM utilization: {100 * util:.1f}% of "
          f"{V5E_HBM_GBPS:.0f} GB/s")

    print("\n-- by category --")
    bycat = {}
    for r in rows:
        c = bycat.setdefault(r["category"] or "?", [0.0, 0.0])
        c[0] += r["self_us"]
        c[1] += r["hbm_gibps"] * GIB * r["self_us"] * 1e-6
    for cat, (us, hbm) in sorted(bycat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {cat:32s} {us / 1e3 / n_frames:7.2f} ms/fr "
              f"{hbm / 1e9 / n_frames:7.2f} GB/fr  ({100 * us / tot_us:4.1f}%)")

    print(f"\n-- top {top} ops by self time --")
    for r in sorted(rows, key=lambda r: -r["self_us"])[:top]:
        hbm_gb = r["hbm_gibps"] * GIB * r["self_us"] * 1e-6 / 1e9
        print(f"  {r['self_us'] / 1e3 / n_frames:7.3f} ms/fr "
              f"{hbm_gb / n_frames:6.3f} GB/fr {r['hbm_gibps']:7.1f} GiB/s "
              f"[{(r['bound_by'] or '?'):7s}] x{int(r['n'] or 0):<4d} "
              f"{(r['category'] or '?')[:18]:18s} "
              f"{(r['tf_op'] or r['name'] or '')[:70]}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"ms_per_frame": ms_frame, "hbm_gb_per_frame": gb_frame,
                       "hbm_utilization": util, "rows": rows}, f)
        print(f"\nwrote {json_out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="f2f", choices=["f2f", "f2m"])
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None)
    ap.add_argument("--logdir", default=None,
                    help="parse an existing trace instead of running one")
    args = ap.parse_args()

    logdir = args.logdir or f"/tmp/trace_{args.path}"
    if not args.logdir:
        wall = run_traced(args.path, args.window, args.windows, logdir)
        print(f"traced {args.windows} x {args.window}-frame windows, "
              f"wall {wall:.2f} s")
    rows = parse_hlo_stats(logdir)
    report(rows, args.window * args.windows, args.top, args.json)


if __name__ == "__main__":
    main()
