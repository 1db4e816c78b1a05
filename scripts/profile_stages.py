"""Per-stage device timing of the fused tracking step at production shape.

Times each stage of PoseNet.infer (512x640, reference configuration
infer_f2f.yaml compute shape) as its own jitted function to locate the
remaining milliseconds against the >30 FPS target. Distinct inputs per timed
call (the axon runtime caches byte-identical executions); each stage is timed
pipelined (dispatch N, block on the last) to subtract the ~30 ms axon RPC
latency the same way bench.py does.

Usage: python scripts/profile_stages.py [--iters N] [--stage NAME]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from robust_pose_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

H, W = 512, 640
H8, W8 = H // 8, W // 8


def _cost_str(fn, args):
    """flops + XLA bytes-accessed of the compiled stage (post-fusion operand
    +output traffic; HBM-conservative — VMEM-resident reuse is overcounted)."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return (f"  {ca.get('flops', 0) / 1e9:8.1f} GF "
                f"{ca.get('bytes accessed', 0) / 1e9:8.2f} GB")
    except Exception:
        return ""


def timed(fn, make_inputs, n=8, name=""):
    """Pipelined timing: dispatch all, block on last output."""
    batches = [jax.block_until_ready(make_inputs(i)) for i in range(n + 1)]
    out = fn(*batches[-1])          # compile
    # forced readback (axon tunnel: block_until_ready can return before the
    # first execution of a fresh executable completes; fetching bytes cannot)
    import numpy as _np
    _ = _np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*batches[i])
    _ = _np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:36s} {dt:8.2f} ms{_cost_str(fn, batches[-1])}")
    return dt


def rand(key, shape, scale=1.0):
    return scale * jax.random.uniform(jax.random.PRNGKey(key), shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stage", default="all")
    ap.add_argument("--window", type=int, default=8,
                    help="T for the infer_window stage")
    args = ap.parse_args()
    n = args.iters

    from robust_pose_tpu.models.posenet import PoseNet
    from robust_pose_tpu.models.raft import RAFT, BasicEncoder
    from robust_pose_tpu.models.unet import TinyUNet
    from robust_pose_tpu.ops.pallas_lookup_lanewise import (
        build_corr_pyramid_t, lanewise_lookup)
    from robust_pose_tpu.ops.warp import remap_from_flow
    from robust_pose_tpu.ops.geometry import create_img_coords, depth_to_pcl
    from robust_pose_tpu.solver.gauss_newton import SolverConfig, make_pose_layer
    from robust_pose_tpu.solver.objectives import PoseProblemInputs

    config = {"image_shape": (H, W), "iters": 12, "lbgfs_iters": 20,
              "use_weights": True}
    model = PoseNet(config)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    K = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])[None]
    bl = jnp.asarray([16.0], jnp.float32)
    want = lambda s: args.stage in ("all", s)

    # full-model init is itself a multi-minute TPU compile: only pay it for
    # stages that need weights, and run it on CPU (same params; the xla
    # lookup variant avoids tracing TPU pallas kernels on the CPU backend)
    variables = None
    if args.stage in ("all", "full", "raft", "enc", "gru", "unet",
                      "window"):
        init_model = PoseNet(dict(config, lookup="xla"))
        variables = jax.jit(
            lambda k: init_model.init(k, img, img, K, bl, img, img),
            backend="cpu")(key)
        variables = jax.device_put(variables, jax.devices()[0])

    # --- full step ---------------------------------------------------------
    if want("full"):
        @jax.jit
        def step(v, img1, img2, img2r, depth1, mask, sflow1):
            return model.apply(v, img1, img2, K, bl, depth1, img2r, mask,
                               mask, sflow1, method=PoseNet.infer)

        mk = lambda i: (variables, rand(3 * i, (1, H, W, 3), 255),
                        rand(3 * i + 1, (1, H, W, 3), 255),
                        rand(3 * i + 2, (1, H, W, 3), 255),
                        jnp.full((1, H, W, 1), 0.5),
                        jnp.ones((1, H, W, 1), bool),
                        jnp.full((1, H, W, 2), -16.0))
        timed(step, mk, n, "full infer step")

    # --- batched f2f window (PoseNet.infer_window, one batch-2T pass) -------
    if want("window"):
        T = args.window
        feats = jax.jit(
            lambda v, im: model.apply(v, im, method=PoseNet.encode_ref)
        )(variables, rand(999, (1, H, W, 3), 255))

        @jax.jit
        def wstep(v, limgs, rimgs, masks, pimg, pd, pm, psf, fts):
            return model.apply(v, limgs, rimgs, masks, K, bl, pimg, pd, pm,
                               psf, fts, method=PoseNet.infer_window)

        mk = lambda i: (variables, rand(5 * i, (T, H, W, 3), 255),
                        rand(5 * i + 1, (T, H, W, 3), 255),
                        jnp.ones((T, H, W, 1), bool),
                        rand(5 * i + 2, (1, H, W, 3), 255),
                        jnp.full((1, H, W, 1), 0.5),
                        jnp.ones((1, H, W, 1), bool),
                        jnp.full((1, H, W, 2), -16.0), feats)
        dt = timed(wstep, mk, n, f"infer_window (T={T}, batch-{2 * T} RAFT)")
        print(f"{'  -> per frame':36s} {dt / T:8.2f} ms")

    # --- RAFT (batch 2, as in infer) ---------------------------------------
    if want("raft"):
        raft = RAFT(iters=12, name="flow")
        rvars = {"params": variables["params"]["flow"],
                 "batch_stats": variables["batch_stats"].get("flow", {})}
        f = jax.jit(lambda v, a, b: raft.apply(v, a, b))
        mk = lambda i: (rvars, rand(2 * i, (2, H, W, 3), 255),
                        rand(2 * i + 1, (2, H, W, 3), 255))
        timed(f, mk, n, "RAFT total (batch 2)")

    # --- encoders only ------------------------------------------------------
    if want("enc"):
        enc = BasicEncoder(output_dim=256, norm="instance",
                           dtype=jnp.bfloat16)
        evars = {"params": variables["params"]["flow"]["fnet"]}
        f = jax.jit(lambda v, x: enc.apply(v, x))
        mk = lambda i: (evars, rand(i, (4, H, W, 3), 2.0))
        timed(f, mk, n, "fnet encoder (batch 4)")

    # --- corr pyramid build --------------------------------------------------
    if want("corr"):
        f = jax.jit(lambda a, b: build_corr_pyramid_t(a, b, dtype=jnp.bfloat16))
        mk = lambda i: (rand(2 * i, (2, H8, W8, 256), 1.0),
                        rand(2 * i + 1, (2, H8, W8, 256), 1.0))
        timed(f, mk, n, "corr pyramid build (batch 2)")

        pyr_shape = [(2, H8 // 2 ** l, W8 // 2 ** l, H8 * W8)
                     for l in range(4)]

        @jax.jit
        def lk12(pyr, coords):
            def body(c, _):
                outs = lanewise_lookup(pyr, c)
                # feed something back so iterations chain
                c = c + 1e-3 * outs[0][:, :1, :].reshape(2, H8, W8, 1)
                return c, None
            c, _ = jax.lax.scan(body, coords, None, length=12)
            return c

        def mkl(i):
            pyr = [rand(10 * i + l, s, 1.0).astype(jnp.bfloat16)
                   for l, s in enumerate(pyr_shape)]
            coords = rand(10 * i + 7, (2, H8, W8, 2), 60.0)
            return (pyr, coords)
        timed(lk12, mkl, n, "12x lanewise lookup (batch 2)")

    # --- on-the-fly lookup (volume never materialized) ----------------------
    if want("otf"):
        from robust_pose_tpu.ops.pallas_corr_onthefly import (
            onthefly_lookup, pool_fmap_pyramid)

        @jax.jit
        def otf12(f1, f2, coords):
            f2l = [l.astype(jnp.bfloat16)
                   for l in pool_fmap_pyramid(f2.astype(jnp.float32))]
            f1b = f1.astype(jnp.bfloat16)

            def body(c, _):
                outs = onthefly_lookup(f1b, f2l, c)
                c = c + 1e-3 * outs[0][:, :1, :].reshape(2, H8, W8, 1)
                return c, None
            c, _ = jax.lax.scan(body, coords, None, length=12)
            return c

        mko = lambda i: (rand(3 * i, (2, H8, W8, 256), 1.0),
                         rand(3 * i + 1, (2, H8, W8, 256), 1.0),
                         rand(3 * i + 2, (2, H8, W8, 2), 60.0))
        timed(otf12, mko, n, "12x onthefly lookup+pool (batch 2)")

    # --- GRU update scan without lookup -------------------------------------
    if want("gru"):
        from robust_pose_tpu.models.raft import BasicUpdateBlock
        blk = BasicUpdateBlock(dtype=jnp.bfloat16)
        bvars = {"params": variables["params"]["flow"]["update"]["update_block"]}

        @jax.jit
        def gru12(v, net, inp, corr_parts, flow):
            def body(c, _):
                net, dflow = blk.apply(v, c["net"], inp, corr_parts,
                                       flow + c["f"])
                # the block computes in bf16; keep scan carry dtypes fixed
                return dict(net=net.astype(c["net"].dtype),
                            f=c["f"] + dflow.astype(c["f"].dtype)), None
            c, _ = jax.lax.scan(body, dict(net=net.astype(jnp.bfloat16),
                                           f=jnp.zeros_like(flow)),
                                None, length=12)
            return c["f"]

        def mkg(i):
            net = rand(7 * i, (2, H8, W8, 128), 1.0)
            inp = rand(7 * i + 1, (2, H8, W8, 128), 1.0)
            corr = [rand(7 * i + 2 + l, (2, 81, H8 * W8), 1.0)
                    for l in range(4)]
            flow = rand(7 * i + 6, (2, H8, W8, 2), 1.0)
            return (bvars, net, inp, corr, flow)
        timed(gru12, mkg, n, "12x update block (batch 2, no lookup)")

    # --- TinyUNet heads -------------------------------------------------------
    if want("unet"):
        u2 = TinyUNet(in_channels=264, output_size=(H, W), dtype=jnp.bfloat16)
        u3 = TinyUNet(in_channels=272, output_size=(H, W), dtype=jnp.bfloat16)
        v2 = {"params": variables["params"]["weight_head_2d"],
              "batch_stats": variables["batch_stats"]["weight_head_2d"]}
        v3 = {"params": variables["params"]["weight_head_3d"],
              "batch_stats": variables["batch_stats"]["weight_head_3d"]}
        f = jax.jit(lambda a, b: (u2.apply(v2, a), u3.apply(v3, b)))
        mk = lambda i: (rand(2 * i, (1, H8, W8, 264), 1.0),
                        rand(2 * i + 1, (1, H8, W8, 272), 1.0))
        timed(f, mk, n, "TinyUNet heads (2d + 3d)")

    # --- warps ----------------------------------------------------------------
    if want("warp"):
        f = jax.jit(lambda x, fl: remap_from_flow(x, fl))
        mk = lambda i: (rand(2 * i, (1, H, W, 8), 1.0),
                        rand(2 * i + 1, (1, H, W, 2), 8.0))
        timed(f, mk, n, "8-channel flow warp")

    # --- GN solve --------------------------------------------------------------
    if want("solve"):
        coords = create_img_coords(H, W)
        layer = make_pose_layer(coords, SolverConfig(iters=20))

        @jax.jit
        def solve(flow, pcl1, pcl2, w1, w2, m, lw):
            xs = PoseProblemInputs(flow=flow, pcl1=pcl1, pcl2=pcl2,
                                   weights1=w1, weights2=w2, mask1=m, mask2=m,
                                   intrinsics=K, loss_weight=lw)
            return layer(xs)

        def mks(i):
            depth = jnp.full((1, H, W, 1), 0.5) + rand(9 * i, (1, H, W, 1), .1)
            pcl1 = depth_to_pcl(depth, K, coords)
            pcl2 = pcl1 + rand(9 * i + 1, (1, H, W, 3), 0.01)
            return (rand(9 * i + 2, (1, H, W, 2), 2.0), pcl1, pcl2,
                    rand(9 * i + 3, (1, H, W, 1), 1.0),
                    rand(9 * i + 4, (1, H, W, 1), 1.0),
                    jnp.ones((1, H, W, 1), bool), jnp.ones((1, 2)))
        timed(solve, mks, n, "GN pose solve (20 iters)")


if __name__ == "__main__":
    main()
