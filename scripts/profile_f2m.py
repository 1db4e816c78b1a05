"""Per-stage device timing of the frame-to-model step at production shape.

Times surfel_render / surfel_fuse / the tracking step (lbgfs_iters=100,
configuration/infer_scared.yaml) as separate jitted functions over a pool
bucket of ``--frames`` x (H*W) slots, to locate the f2m milliseconds
(VERDICT r2 item 1). Same pipelined-timing methodology as
scripts/profile_stages.py.

Usage: python scripts/profile_f2m.py [--frames 4] [--iters 8]
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
N = H * W


def timed(fn, make_inputs, n=8, name=""):
    batches = [jax.block_until_ready(make_inputs(i)) for i in range(n + 1)]
    out = fn(*batches[-1])
    # forced readback: on the axon tunnel block_until_ready can return
    # before the first execution of a fresh executable completes (program
    # load takes seconds-to-minutes); fetching bytes cannot
    import numpy as _np
    _ = _np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*batches[i])
    _ = _np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def rand(key, shape, scale=1.0):
    return scale * jax.random.uniform(jax.random.PRNGKey(key), shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4,
                    help="pool bucket in frames (capacity = frames * H * W)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stage", default="all")
    args = ap.parse_args()
    n = args.iters
    want = lambda s: args.stage in ("all", s)

    from robust_pose_tpu import se3
    from robust_pose_tpu.slam.frame import make_frame
    from robust_pose_tpu.slam.surfel_map import (
        SurfelConfig, SurfelState, surfel_fuse, surfel_render)

    cap = args.frames * N
    alloc = cap + N
    kmat = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])
    cfg = SurfelConfig(capacity=cap, img_shape=(H, W), d_thresh=0.05,
                       average_pts=False, exact_render=False)

    def mk_state(i):
        # active prefix covering ~90% of capacity, points in front of the
        # camera at depth ~0.5 spread over the frustum
        pts = rand(5 * i, (alloc, 3), 1.0)
        z = 0.3 + 0.4 * pts[:, 2]
        x = (pts[:, 0] - 0.5) * z * (W / 500.0)
        y = (pts[:, 1] - 0.5) * z * (H / 500.0)
        opts = jnp.stack([x, y, z], -1)
        hi = int(0.9 * cap)
        active = jnp.arange(alloc) < hi
        return SurfelState(
            opts=opts, rgb=rand(5 * i + 1, (alloc, 3), 255.0),
            conf=rand(5 * i + 2, (alloc,), 1.0),
            t_created=jnp.zeros((alloc,), jnp.int32),
            active=active, tick=jnp.asarray(3, jnp.int32),
            pmat=se3.identity(()),
            n_dropped=jnp.zeros((), jnp.int32),
            hi=jnp.asarray(hi, jnp.int32))

    def mk_frame(i):
        return make_frame(rand(7 * i, (1, H, W, 3), 255.0),
                          rand(7 * i + 1, (1, H, W, 3), 255.0),
                          depth=0.3 + rand(7 * i + 2, (1, H, W, 1), 0.4),
                          mask=jnp.ones((1, H, W, 1), bool),
                          flow=rand(7 * i + 3, (1, H, W, 2), 2.0))

    if want("render"):
        f = jax.jit(lambda st: surfel_render(st, kmat, cfg))
        timed(f, lambda i: (mk_state(i),), n,
              f"surfel_render (bucket {args.frames}xHW, packed)")
        cfg_e = cfg._replace(exact_render=True)
        fe = jax.jit(lambda st: surfel_render(st, kmat, cfg_e))
        timed(fe, lambda i: (mk_state(i),), n,
              f"surfel_render (bucket {args.frames}xHW, exact)")

    if want("fuse"):
        f = jax.jit(lambda st, fr: surfel_fuse(st, fr, se3.identity(()),
                                               kmat, cfg))
        timed(f, lambda i: (mk_state(i), mk_frame(i)), n,
              f"surfel_fuse (bucket {args.frames}xHW)")

    if want("fuse_render"):
        from robust_pose_tpu.slam.surfel_map import surfel_fuse_render
        f = jax.jit(lambda st, fr: surfel_fuse_render(
            st, fr, se3.identity(()), kmat, cfg))
        timed(f, lambda i: (mk_state(i), mk_frame(i)), n,
              f"surfel_fuse_render (merged, bucket {args.frames}xHW)")

    if want("winner"):
        # winner-selection strategies for the render splat: direct packed
        # scatter-max vs sort-based segment winner (alloc updates -> N px)
        def mk_pk(i):
            pix = jax.random.randint(jax.random.PRNGKey(9 * i), (alloc,), 0,
                                     N + 1, jnp.int32)
            key = jax.random.randint(jax.random.PRNGKey(9 * i + 1), (alloc,),
                                     0, 2 ** 30, jnp.int32)
            return (pix, jnp.where(pix < N, key, -1))

        @jax.jit
        def direct(pix, key):
            return jnp.full((N,), -1, jnp.int32).at[pix].max(key, mode="drop")

        @jax.jit
        def sorted_winner(pix, key):
            ps, ks = jax.lax.sort((pix, key), num_keys=2)
            is_last = jnp.concatenate(
                [ps[1:] != ps[:-1], jnp.ones((1,), bool)])
            idx = jnp.where(is_last, ps, N)
            return jnp.full((N,), -1, jnp.int32).at[idx].set(
                ks, mode="drop", unique_indices=True)

        timed(direct, mk_pk, n, f"winner: direct scatter-max ({args.frames}xHW)")
        timed(sorted_winner, mk_pk, n, f"winner: sort+unique-set ({args.frames}xHW)")

    if want("track") or want("split"):
        from robust_pose_tpu.models.posenet import PoseNet
        config = {"image_shape": (H, W), "iters": 12, "lbgfs_iters": 100,
                  "use_weights": True}
        model = PoseNet(config)
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        K = kmat[None]
        init_model = PoseNet(dict(config, lookup="xla"))
        variables = jax.jit(
            lambda k: init_model.init(k, img, img, K, jnp.ones((1,)), img,
                                      img), backend="cpu")(jax.random.PRNGKey(0))
        variables = jax.device_put(variables, jax.devices()[0])

    if want("track"):
        @jax.jit
        def step(v, img1, img2, img2r, depth1, mask, sflow1):
            return model.apply(v, img1, img2, K, jnp.ones((1,)), depth1,
                               img2r, mask, mask, sflow1,
                               method=PoseNet.infer)

        mk = lambda i: (variables, rand(3 * i, (1, H, W, 3), 255),
                        rand(3 * i + 1, (1, H, W, 3), 255),
                        rand(3 * i + 2, (1, H, W, 3), 255),
                        jnp.full((1, H, W, 1), 0.5),
                        jnp.ones((1, H, W, 1), bool),
                        jnp.full((1, H, W, 2), -16.0))
        timed(step, mk, n, "track step (infer, lbgfs_iters=100)")

    if want("split"):
        # the f2m fast path: map-independent pre-pass batched over the
        # window, then the lean sequential step (rendered-reference encode +
        # single temporal GRU problem + solve)
        T = args.frames

        @jax.jit
        def pre(v, limgs, rimgs, masks):
            return model.apply(v, limgs, rimgs, masks, jnp.ones((1,)),
                               method=PoseNet.f2m_precompute)

        mkp = lambda i: (variables, rand(11 * i, (T, H, W, 3), 255),
                         rand(11 * i + 1, (T, H, W, 3), 255),
                         jnp.ones((T, H, W, 1), bool))
        dtp = timed(pre, mkp, n, f"f2m_precompute (T={T}, batched)")
        print(f"{'  -> per frame':44s} {dtp / T:8.2f} ms")

        @jax.jit
        def track1(v, ref, depth1, sflow1, limg, mask, fmap_l, net_l, inp_l,
                   sf2, d2):
            return model.apply(v, ref, depth1,
                               jnp.ones((1, H, W, 1), bool), sflow1, limg,
                               mask, K, fmap_l, net_l, inp_l, sf2, d2,
                               method=PoseNet.f2m_track)

        h8, w8 = H // 8, W // 8

        def mkt(i):
            return (variables, rand(13 * i, (1, H, W, 3), 255),
                    jnp.full((1, H, W, 1), 0.5),
                    jnp.zeros((1, H, W, 2)),
                    rand(13 * i + 1, (1, H, W, 3), 255),
                    jnp.ones((1, H, W, 1), bool),
                    rand(13 * i + 2, (1, h8, w8, 256), 1.0),
                    rand(13 * i + 3, (1, h8, w8, 128), 1.0),
                    rand(13 * i + 4, (1, h8, w8, 128), 1.0),
                    jnp.full((1, H, W, 2), -16.0),
                    jnp.full((1, H, W, 1), 0.5))
        timed(track1, mkt, n, "f2m_track step (lbgfs_iters=100)")

    if want("trackstages"):
        # decompose the sequential f2m step: which of reference-encode /
        # GRU / weight heads / LM solve owns the milliseconds (VERDICT r3
        # item 3)
        from robust_pose_tpu.models.posenet import PoseNet
        from robust_pose_tpu.ops.geometry import depth_to_pcl
        from robust_pose_tpu.solver.gauss_newton import (
            PoseProblemInputs, SolverConfig, make_pose_layer)
        from robust_pose_tpu.ops.geometry import create_img_coords

        config = {"image_shape": (H, W), "iters": 12, "lbgfs_iters": 100,
                  "use_weights": True}
        model = PoseNet(config)
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        K = kmat[None]
        init_model = PoseNet(dict(config, lookup="xla"))
        variables = jax.jit(
            lambda k: init_model.init(k, img, img, K, jnp.ones((1,)), img,
                                      img), backend="cpu")(jax.random.PRNGKey(0))
        variables = jax.device_put(variables, jax.devices()[0])
        h8, w8 = H // 8, W // 8

        @jax.jit
        def enc_ref(v, ref):
            f1 = model.apply(v, ref, method=lambda m, x: m.flow_net.encode_fnet(x))
            n1, i1 = model.apply(v, ref, method=lambda m, x: m.flow_net.encode_cnet(x))
            return f1, n1, i1

        mk_ref = lambda i: (variables, rand(17 * i, (1, H, W, 3), 255))
        timed(enc_ref, mk_ref, n, "  ref encode (fnet+cnet, batch 1)")

        @jax.jit
        def gru(v, f1, f2, n1, i1):
            return model.apply(
                v, f1, f2, n1, i1,
                method=lambda m, a, b, c, d: m.flow_net.flow_from_features(
                    a, b, c, d))

        mk_gru = lambda i: (variables,
                            rand(19 * i, (1, h8, w8, 256), 1.0),
                            rand(19 * i + 1, (1, h8, w8, 256), 1.0),
                            rand(19 * i + 2, (1, h8, w8, 128), 1.0),
                            rand(19 * i + 3, (1, h8, w8, 128), 1.0))
        timed(gru, mk_gru, n, "  GRU flow (12 iters, batch 1)")

        @jax.jit
        def heads(v, pcl1, d2, img1, img2, mask2, tf, sf1, sf2, hid, ctx):
            return model.apply(
                v, pcl1, d2, jnp.asarray(K), img1, img2, mask2, tf, sf1, sf2,
                hid, ctx, method=PoseNet.get_weight_maps)

        def mk_heads(i):
            return (variables,
                    rand(23 * i, (1, H, W, 3), 1.0),
                    0.3 + rand(23 * i + 1, (1, H, W, 1), 0.4),
                    rand(23 * i + 2, (1, H, W, 3), 255.0),
                    rand(23 * i + 3, (1, H, W, 3), 255.0),
                    jnp.ones((1, H, W, 1), bool),
                    rand(23 * i + 4, (1, H, W, 2), 2.0),
                    jnp.zeros((1, H, W, 2)),
                    jnp.full((1, H, W, 2), -16.0),
                    rand(23 * i + 5, (1, h8, w8, 128), 1.0),
                    rand(23 * i + 6, (1, h8, w8, 128), 1.0))
        timed(heads, mk_heads, n, "  weight heads (2x TinyUNet + warps)")

        coords = create_img_coords(H, W)
        layer = make_pose_layer(coords, SolverConfig(iters=100))
        layer_ne = make_pose_layer(coords,
                                   SolverConfig(iters=100, early_exit=False))

        def mk_solve(i):
            d1 = 0.3 + rand(29 * i, (1, H, W, 1), 0.4)
            d2 = 0.3 + rand(29 * i + 1, (1, H, W, 1), 0.4)
            pcl1 = depth_to_pcl(d1, K, coords)
            pcl2 = depth_to_pcl(d2, K, coords)
            return PoseProblemInputs(
                flow=rand(29 * i + 2, (1, H, W, 2), 2.0),
                pcl1=pcl1, pcl2=pcl2,
                weights1=rand(29 * i + 3, (1, H, W, 1), 1.0),
                weights2=rand(29 * i + 4, (1, H, W, 1), 1.0),
                mask1=jnp.ones((1, H, W, 1), bool),
                mask2=jnp.ones((1, H, W, 1), bool),
                intrinsics=K,
                loss_weight=jnp.array([[10.0, 0.2]]))

        timed(jax.jit(lambda xs: layer(xs)), lambda i: (mk_solve(i),), n,
              "  LM solve (cap 100, early exit)")
        timed(jax.jit(lambda xs: layer_ne(xs)), lambda i: (mk_solve(i),), n,
              "  LM solve (100 iters, NO early exit)")


if __name__ == "__main__":
    main()
