"""Benchmark: steady-state streaming throughput of the SHIPPED tracking API
on one TPU chip.

Drives ``PoseEstimator.track_window`` — the public streaming API used by
scripts/infer_trajectory.py — NOT a parallel re-implementation, so the
number includes the full production semantics: batched temporal+stereo RAFT
flow (12 GRU iterations), disparity->depth, flow warps, TinyUNet confidence
heads, Gauss-Newton pose solve with the ``|log(rel)| > 0.1`` failure branch
(reference core/pose/pose_estimator.py:81-87), pose chaining, and the f2f
frame-state carry. Production StereoMIS shape 512x640, lbgfs_iters=20
(configuration/infer_f2f.yaml).

A second metric — frame-to-model streaming FPS at the production SCARED
config (lbgfs_iters=100, configuration/infer_scared.yaml:11) — rides in the
same JSON line (``f2m_fps``): render-from-surfel-map + track + fuse per
frame with the surfel pool as a scan carry.

Frames are shifted crops of a blurred random texture (correlated like real
video, so tracking succeeds and the fuse path stays engaged), staged as
uint8 on device before timing. Per-stage device breakdowns live in
scripts/profile_stages.py.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}
where vs_baseline is FPS / 30 (the >30 FPS north-star from BASELINE.md).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def _wait_for_device(deadline_s: float) -> None:
    """The remote-attached TPU backend intermittently fails to initialize
    for stretches of minutes; a failed init inside THIS process can stick,
    so probe from subprocesses until the device answers (bounded — after
    the deadline we proceed and let the real init raise)."""
    t_end = time.monotonic() + deadline_s
    probe = ("import jax; d = jax.devices()[0]; "
             "assert d.platform != 'cpu', d.platform")
    while True:
        remaining = t_end - time.monotonic()
        if remaining <= 0:
            return
        try:
            if subprocess.run([sys.executable, "-c", probe],
                              timeout=min(300.0, remaining),
                              capture_output=True).returncode == 0:
                return
        except subprocess.TimeoutExpired:
            continue  # probe hung (tunnel down) — the wait already elapsed
        print("bench: accelerator not reachable yet; retrying...",
              file=sys.stderr)
        time.sleep(min(30.0, max(0.0, t_end - time.monotonic())))


if "cpu" not in os.environ.get("JAX_PLATFORMS", "").lower():
    _wait_for_device(float(os.environ.get("BENCH_WAIT_DEVICE_S", 900)))

import jax
import jax.numpy as jnp

# persistent compilation cache: the two tracking-window programs take
# ~2 min to compile cold; cached executables make repeat bench runs start
# in seconds (keyed by JAX/XLA version + HLO, safe to persist)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


H, W = 512, 640
FX = 500.0
# window-size overrides for sweeps (defaults are the shipped configuration)
F2F_WINDOW = int(os.environ.get("BENCH_F2F_WINDOW", 8))
F2M_WINDOW = int(os.environ.get("BENCH_F2M_WINDOW", 8))
# f2m pool capacity in frames, decoupled from the window length: the pool
# pass cost scales with the bucket (live surfels on a real sequence), not
# with how many frames ride one dispatch — kept at round-4's 4-frame bucket
# so window-length comparisons measure dispatch amortization, not a bigger
# pool (the synthetic sequence saturates whatever bucket it gets)
F2M_POOL_FRAMES = int(os.environ.get("BENCH_F2M_POOL_FRAMES", 4))


def make_sequence(n_frames, disparity=8, step=3, seed=0):
    """Shifted crops of one blurred random texture: a horizontally
    translating stereo camera with constant disparity (depth = fx*B/d)."""
    rng = np.random.default_rng(seed)
    pad = disparity + step * n_frames + 8
    base = rng.uniform(0.0, 255.0, (H + 16, W + pad, 3)).astype(np.float32)
    # separable box blur for smooth image gradients (pure numpy, cheap)
    k = 9
    c = np.cumsum(np.pad(base, ((k, k), (0, 0), (0, 0)), mode="edge"), axis=0)
    base = (c[2 * k:] - c[:-2 * k]) / (2 * k)
    c = np.cumsum(np.pad(base, ((0, 0), (k, k), (0, 0)), mode="edge"), axis=1)
    base = (c[:, 2 * k:] - c[:, :-2 * k]) / (2 * k)
    base = base[:H + 16]

    def crop(dx):
        return base[8:8 + H, dx:dx + W]

    ls = np.stack([crop(step * i)[None] for i in range(n_frames)])
    rs = np.stack([crop(step * i + disparity)[None] for i in range(n_frames)])
    return ls.astype(np.uint8), rs.astype(np.uint8)


def build_estimator(slam_cfg, disparity=8, early_exit=True):
    from robust_pose_tpu.models.posenet import PoseNet
    from robust_pose_tpu.slam.pose_estimator import PoseEstimator

    model_cfg = {"image_shape": (H, W), "iters": 12,
                 "lbgfs_iters": slam_cfg["lbgfs_iters"], "use_weights": True,
                 # benchmark-floor switch: False forces every LM iteration
                 # to the cap (no data-dependent early exit)
                 "solver_early_exit": early_exit,
                 # correlation-lookup kernel A/B (models/raft.py::RAFT.lookup)
                 "lookup": os.environ.get("BENCH_LOOKUP", "auto")}
    model = PoseNet(model_cfg)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    K = np.array([[FX, 0.0, W / 2], [0.0, FX, H / 2], [0.0, 0.0, 1.0]],
                 np.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, jnp.asarray(K)[None],
                           jnp.ones((1,)), img, img)
    # untrained-RAFT flow is near-random (the GRU's random-weight noise
    # accumulates to ~100 px over 12 iterations): depth would be invalid at
    # most pixels, the f2m rendering half-empty, and the |log|>0.1 failure
    # branch would skip every fuse — leaving the fuse/render work untimed.
    # Zero the flow-head kernel and bias it so every GRU iteration emits
    # exactly the sequence's constant disparity/12 (flow accumulates
    # 8*iters*bias px) — identical compute graph, but depth is valid
    # everywhere and every production path stays engaged.
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # fresh dicts
    fh = variables["params"]["flow"]["update"]["update_block"]["flow_head"]
    fh["conv2"]["kernel"] = jnp.zeros_like(fh["conv2"]["kernel"])
    fh["conv2"]["bias"] = jnp.array([-disparity / (8.0 * 12), 0.0])
    ckpt = {"params": variables, "config": {"model": model_cfg}}
    return PoseEstimator(slam_cfg, K, 16.0, ckpt, (W, H))


def bench_stream(est, t_window, n_windows, seed0=1, diagnostics=False,
                 fetch_diag=True):
    """Feed the first frame per-frame, then time n_windows track_window
    dispatches of t_window frames each (device-staged uint8 input).

    With ``diagnostics`` the window runs in viewer-attached mode: the
    per-frame flow/confidence/depth maps are materialized as outputs and
    bulk-fetched to the host EVERY window inside the timed loop — the
    structural cost a consuming viewer/logger adds to the streaming loop
    (scripts/infer_trajectory.py diag_mode; reference demo loop
    scripts/infer_trajectory.py:71-95). ``fetch_diag=False`` materializes
    the maps but skips the host fetch, isolating the device-side cost of
    diagnostics mode from the d2h link cost (the two are separable: on
    the benchmark's tunnel attachment the link is ~30 MB/s; a local PCIe
    chip moves the same payload 300x faster)."""
    ls, rs = make_sequence(1)
    mask1 = np.ones((1, H, W, 1), bool)
    est(ls[0], rs[0], mask1)

    masks = jnp.ones((t_window, 1, H, W, 1), bool)
    windows = []
    for i in range(n_windows + 2):
        ls, rs = make_sequence(t_window, seed=seed0 + i)
        windows.append((jax.device_put(jnp.asarray(ls)),
                        jax.device_put(jnp.asarray(rs))))
    jax.block_until_ready(windows)

    # warmup TWICE: first call compiles for the uncommitted first-frame state
    # placement, second compiles the steady-state signature (carry = jit
    # output); f2m additionally warms the bucket-growth recompile here
    for i in (-1, -2):
        res = est.track_window(windows[i][0], windows[i][1], masks,
                               diagnostics=diagnostics)
        poses, succ = res[:2]
    _ = float(jnp.sum(poses))  # warm the readback reduce
    if diagnostics:
        _ = jax.device_get(res[2])

    succs = []
    t0 = time.perf_counter()
    for i in range(n_windows):
        res = est.track_window(windows[i][0], windows[i][1], masks,
                               diagnostics=diagnostics)
        poses, succ = res[:2]
        succs.append(succ)  # keep on device — a per-window readback would
        # serialize the dispatch pipeline (each sync pays the tunnel RPC)
        if diagnostics and fetch_diag:
            # the viewer/logger consumes the whole window's maps: ONE bulk
            # transfer per window, synchronizing the pipeline like a real
            # interactive run does
            diag = jax.device_get(res[2])
    # forced host readback: on the axon tunnel block_until_ready can return
    # before remote execution completes; fetching a value cannot
    _ = float(jnp.sum(poses))
    dt = (time.perf_counter() - t0) / (n_windows * t_window)
    n_ok = int(sum(int(jnp.sum(s)) for s in succs))
    # realized LM iterations for the LAST window (diagnostic readback after
    # the timed loop — proves what the data-dependent early exit actually
    # did vs the lbgfs_iters cap)
    it = np.asarray(est.last_solver_iters).reshape(-1)
    iters = {"mean": round(float(it.mean()), 2), "max": int(it.max()),
             "min": int(it.min())}
    return 1.0 / dt, n_ok / (n_windows * t_window), iters


def measure_d2h_bandwidth(mb=24):
    """Device->host transfer rate of one bulk fetch (MB/s). The
    viewer-attached diagnostics FPS is fetch-bound whenever this is small
    (the axon tunnel measures in the tens of MB/s; a local PCIe v5e does
    ~10 GB/s) — reported alongside so the FPS number carries its own
    provenance."""
    # two distinct arrays: a repeat device_get of the SAME jax.Array is
    # served from its cached host copy (np.asarray caches _npy_value) and
    # measures nothing
    xs = [jax.block_until_ready(
        jnp.full((mb * (1 << 20) // 2,), float(i), jnp.float16))
        for i in range(2)]
    _ = jax.device_get(xs[0])  # warm the path
    t0 = time.perf_counter()
    _ = jax.device_get(xs[1])
    dt = time.perf_counter() - t0
    return mb / dt


def main():
    d2h_mbps = measure_d2h_bandwidth()
    # frame-to-frame, production configuration/infer_f2f.yaml
    f2f_cfg = {
        "frame2frame": True, "lbgfs_iters": 20, "conf_weighing": True,
        "depth_clipping": [1, 250], "dist_thr": 0.05, "average_pts": False,
    }
    f2f = build_estimator(f2f_cfg)
    f2f_fps, f2f_ok, f2f_iters = bench_stream(f2f, t_window=F2F_WINDOW,
                                              n_windows=6)
    # viewer-attached mode: same stream with the per-frame diagnostic maps
    # (flow/conf/depth, ~26 MB per 8-frame window) materialized and
    # bulk-fetched every window — what scripts/infer_trajectory.py pays when
    # a viewer or logger consumes the run (VERDICT r4 item 3)
    f2f_diag = f2f_diag_nofetch = None
    if not os.environ.get("BENCH_SKIP_DIAG"):
        f2f_diag, _, _ = bench_stream(f2f, t_window=F2F_WINDOW, n_windows=4,
                                      diagnostics=True)
        # materialize-only: device-side diagnostics cost without the d2h
        # fetch — separates compute from the attachment link rate
        f2f_diag_nofetch, _, _ = bench_stream(
            f2f, t_window=F2F_WINDOW, n_windows=4, diagnostics=True,
            fetch_diag=False)
    del f2f

    # early-exit-off floor: same program but every LM iteration runs to the
    # lbgfs_iters=20 cap — the pessimistic bound that does NOT depend on the
    # benchmark data being well-conditioned (set BENCH_SKIP_FLOOR=1 to skip)
    f2f_floor = None
    if not os.environ.get("BENCH_SKIP_FLOOR"):
        floor_est = build_estimator(f2f_cfg, early_exit=False)
        f2f_floor, _, _ = bench_stream(floor_est, t_window=F2F_WINDOW,
                                       n_windows=4)
        del floor_est

    # frame-to-model, production configuration/infer_scared.yaml (iters=100).
    # The pool is pre-sized to its cap: the synthetic sequence appends
    # aggressively (random-weight confidences defeat the depth-match test),
    # so without pre-sizing the bucket promotions would recompile the window
    # mid-benchmark; pool passes here cost the full F2M_POOL_FRAMES-frame
    # capacity — conservative vs a matched real sequence.
    f2m_cfg = {
        "frame2frame": False, "lbgfs_iters": 100, "conf_weighing": True,
        "depth_clipping": [1, 250], "dist_thr": 0.05, "average_pts": False,
        "map_capacity": F2M_POOL_FRAMES * H * W,
        "initial_bucket": F2M_POOL_FRAMES * H * W,
        # packed-winner primitive A/B (bit-identical outputs; see
        # slam/surfel_map.py::SurfelConfig.winner) — default follows the
        # shipped default (segsort, slam/pose_estimator.py)
        "winner": os.environ.get("BENCH_F2M_WINNER", "segsort"),
    }
    f2m = build_estimator(f2m_cfg)
    f2m_fps, f2m_ok, f2m_iters = bench_stream(f2m, t_window=F2M_WINDOW,
                                              n_windows=4, seed0=11)
    del f2m

    # f2m floors: every LM iteration forced to the cap — the pessimistic
    # bound independent of the benchmark data's conditioning. 100 forced
    # iterations is the production cap; the forced-20 run (the f2f cap)
    # exposes how FPS scales with realized solver iterations.
    f2m_floor100 = f2m_floor20 = None
    if not os.environ.get("BENCH_SKIP_FLOOR"):
        fl100 = build_estimator(f2m_cfg, early_exit=False)
        f2m_floor100, _, _ = bench_stream(fl100, t_window=F2M_WINDOW,
                                          n_windows=2, seed0=11)
        del fl100
        fl20 = build_estimator(dict(f2m_cfg, lbgfs_iters=20),
                               early_exit=False)
        f2m_floor20, _, _ = bench_stream(fl20, t_window=F2M_WINDOW,
                                         n_windows=2, seed0=11)
        del fl20

    out = {
        "metric": "stereomis_tracking_fps_512x640_streaming",
        "value": round(f2f_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(f2f_fps / 30.0, 3),
        "f2m_fps_iters100": round(f2m_fps, 3),
        "f2f_success_rate": round(f2f_ok, 3),
        "f2m_success_rate": round(f2m_ok, 3),
        # realized LM iterations (last window) vs the caps (20 f2f / 100 f2m)
        "f2f_lm_iters": f2f_iters,
        "f2m_lm_iters": f2m_iters,
    }
    if f2f_floor is not None:
        out["f2f_fps_noearlyexit"] = round(f2f_floor, 3)
    if f2f_diag is not None:
        out["f2f_fps_diagnostics"] = round(f2f_diag, 3)
        # the diagnostics fetch is ~26 MB (f16) per 8-frame window: on a
        # low-bandwidth link (axon tunnel) the FPS above is transfer-bound,
        # not compute-bound — d2h_MBps is the measured link rate and
        # _nofetch is the same program without the host fetch (the
        # device-side viewer-attached floor)
        out["f2f_fps_diagnostics_nofetch"] = round(f2f_diag_nofetch, 3)
        out["d2h_MBps"] = round(d2h_mbps, 1)
    if f2m_floor100 is not None:
        out["f2m_fps_noearlyexit"] = round(f2m_floor100, 3)
        out["f2m_fps_iters20_noearlyexit"] = round(f2m_floor20, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
