"""Tunnel-proof per-op device timing: run the op K times INSIDE one jitted
dispatch, chained by a scalar data dependence, and report the K-difference
slope. Per-dispatch RPC latency, program-load time, and host readback all
cancel — only device compute scales with K. (The pipelined-dispatch harness
in profile_stages.py is unreliable on the axon tunnel for sub-10 ms ops:
dispatch overheads there are non-deterministic and do not always pipeline.)

Usage: python scripts/profile_device.py [--stage all] [--k1 4] [--k2 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 640
H8, W8 = H // 8, W // 8


def rand(key, shape, scale=1.0):
    return scale * jax.random.uniform(jax.random.PRNGKey(key), shape)


def _time_dispatch(fn, args, reps=3):
    """Median wall time of fn(*args) with a forced 1-element readback."""
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def kloop(make_fn, args, k1, k2, name, reps=3):
    """Time make_fn(k) at k1 and k2 chained iterations; report the slope.

    ``make_fn(k)`` must return a jitted callable running the op k times with
    a serializing data dependence between iterations.
    """
    t1 = _time_dispatch(make_fn(k1), args, reps)
    t2 = _time_dispatch(make_fn(k2), args, reps)
    per = (t2 - t1) / (k2 - k1) * 1000.0
    print(f"{name:46s} {per:8.2f} ms/op   (k{k1}:{t1*1e3:7.1f}  k{k2}:{t2*1e3:7.1f})",
          flush=True)
    return per


def chain_scalar(out):
    """A cheap scalar that depends on ``out`` (forces serialization)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1]).astype(jnp.float32) * 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=20)
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()
    k1, k2 = args.k1, args.k2
    want = lambda s: args.stage in ("all",) or s in args.stage.split(",")

    from robust_pose_tpu.models.posenet import PoseNet
    from robust_pose_tpu.models.raft import RAFT, BasicEncoder

    if want("norm"):
        from robust_pose_tpu.ops.pallas_instance_norm import instance_norm

        for shape in ((4, 256, 320, 64), (4, 128, 160, 96), (4, 64, 80, 128)):
            def mk(k, shape=shape):
                @jax.jit
                def f(x):
                    def body(i, c):
                        y = instance_norm(x * (1.0 + c))
                        return chain_scalar(y)
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                return f
            kloop(mk, (rand(0, shape).astype(jnp.bfloat16),), k1, k2,
                  f"instance_norm {shape}")

    if want("enc"):
        for b in (2, 4, 8, 16):
            enc = BasicEncoder(output_dim=256, norm="instance",
                               dtype=jnp.bfloat16)
            v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))

            def mk(k, enc=enc):
                @jax.jit
                def f(v, x):
                    def body(i, c):
                        y = enc.apply(v, x * (1.0 + c))
                        return chain_scalar(y)
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                return f
            kloop(mk, (v, rand(0, (b, H, W, 3), 2.0)), k1, k2,
                  f"fnet encoder (batch {b})")

    if want("gru"):
        # GRU+lookup loop exactly as flow_from_features runs it, batch 2/16
        for b in (2, 16):
            raft = RAFT(iters=12, name="flow")
            img = jnp.zeros((1, H, W, 3), jnp.float32)
            rv = jax.jit(lambda kk: RAFT(iters=1, lookup="xla", name="flow").init(
                kk, img, img), backend="cpu")(jax.random.PRNGKey(0))
            rv = jax.device_put(rv, jax.devices()[0])

            def mk(k, raft=raft, b=b):
                @jax.jit
                def f(v, f1, f2, net, inp):
                    def body(i, c):
                        fl, hid, _ = raft.apply(
                            v, f1 * (1.0 + c), f2, net, inp,
                            method=RAFT.flow_from_features)
                        return chain_scalar(fl) + chain_scalar(hid)
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                return f
            kloop(mk, (rv, rand(1, (b, H8, W8, 256), 1.0),
                       rand(2, (b, H8, W8, 256), 1.0),
                       rand(3, (b, H8, W8, 128), 1.0),
                       rand(4, (b, H8, W8, 128), 1.0)), max(2, k1 // 2),
                  max(6, k2 // 2),
                  f"flow_from_features 12 iters (batch {b})")

    if want("solve"):
        from robust_pose_tpu.ops.geometry import create_img_coords, depth_to_pcl
        from robust_pose_tpu.solver.gauss_newton import SolverConfig, make_pose_layer
        from robust_pose_tpu.solver.objectives import PoseProblemInputs

        coords = create_img_coords(H, W)
        K = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])[None]
        for b, iters in ((1, 20), (8, 20), (1, 100)):
            layer = make_pose_layer(coords, SolverConfig(iters=iters))

            def mk(k, layer=layer, b=b):
                @jax.jit
                def f(flow, pcl1, pcl2, w1, w2, m, lw):
                    def body(i, c):
                        xs = PoseProblemInputs(
                            flow=flow * (1.0 + c), pcl1=pcl1, pcl2=pcl2,
                            weights1=w1, weights2=w2, mask1=m, mask2=m,
                            intrinsics=jnp.broadcast_to(K, (b, 3, 3)),
                            loss_weight=lw)
                        pose, tau, _ = layer(xs)
                        return chain_scalar(tau)
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                return f

            depth = jnp.full((b, H, W, 1), 0.5) + rand(9, (b, H, W, 1), .1)
            pcl1 = depth_to_pcl(depth, jnp.broadcast_to(K, (b, 3, 3)), coords)
            pcl2 = pcl1 + rand(10, (b, H, W, 3), 0.01)
            kloop(mk, (rand(11, (b, H, W, 2), 2.0), pcl1, pcl2,
                       rand(12, (b, H, W, 1), 1.0), rand(13, (b, H, W, 1), 1.0),
                       jnp.ones((b, H, W, 1), bool), jnp.ones((b, 2))),
                  k1, k2, f"GN solve (batch {b}, iters {iters})")

    if want("warp"):
        from robust_pose_tpu.ops.warp import warp_bilinear_nearest, warp_then_eighth

        def mk(k):
            @jax.jit
            def f(x, m, fl):
                def body(i, c):
                    a, _, b_, v = warp_bilinear_nearest(x, m, fl * (1.0 + c))
                    return chain_scalar(a)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk, (rand(0, (8, H, W, 3), 1.0), rand(1, (8, H, W, 1), 1.0),
                   rand(2, (8, H, W, 2), 8.0)), k1, k2,
              "warp_bilinear_nearest pcl+mask (batch 8)")

        def mk2(k):
            @jax.jit
            def f(x, fl):
                def body(i, c):
                    y = warp_then_eighth(x, fl * (1.0 + c))
                    return chain_scalar(y)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk2, (rand(0, (8, H, W, 5), 1.0), rand(2, (8, H, W, 2), 8.0)),
              k1, k2, "warp_then_eighth 5ch (batch 8)")

    if want("unet"):
        from robust_pose_tpu.models.unet import TinyUNet
        u2 = TinyUNet(in_channels=264, output_size=(H, W), dtype=jnp.bfloat16)
        v2 = u2.init(jax.random.PRNGKey(0), jnp.zeros((1, H8, W8, 264)))

        for b in (1, 8):
            def mk(k, b=b):
                @jax.jit
                def f(v, x):
                    def body(i, c):
                        y = u2.apply(v, x * (1.0 + c))
                        return chain_scalar(y)
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                return f
            kloop(mk, (v2, rand(0, (b, H8, W8, 264), 1.0)), k1, k2,
                  f"TinyUNet 2d head (batch {b})")

    if want("prims"):
        # the surfel fuse/render primitives at production pool size: which
        # of projection / gathers / scatters / sort owns fuse_render's ms
        from robust_pose_tpu import se3
        from robust_pose_tpu.ops.gather import gather_rows
        from robust_pose_tpu.ops.geometry import project2image

        frames = 4
        n = H * W
        alloc = frames * n + n
        kmat = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])
        pts = rand(5, (alloc, 3), 1.0)
        z = 0.3 + 0.4 * pts[:, 2]
        opts = jnp.stack([(pts[:, 0] - 0.5) * z * (W / 500.0),
                          (pts[:, 1] - 0.5) * z * (H / 500.0), z], -1)
        pix = jax.random.randint(jax.random.PRNGKey(0), (alloc,), 0, n + 1)
        key = jax.random.randint(jax.random.PRNGKey(1), (alloc,), 0, 2 ** 30)
        rows7 = rand(2, (n, 7), 1.0)
        pool7 = rand(3, (alloc, 7), 1.0)
        pose = se3.identity(())

        def mk_case(fn):
            def mk(k):
                @jax.jit
                def f(*xs):
                    def body(i, c):
                        y = fn(c, *xs)
                        return chain_scalar(y)
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                return f
            return mk

        kloop(mk_case(lambda c, o: project2image(
            (o * (1.0 + c))[None], kmat[None], (H, W), pose[None])[0]),
            (opts,), k1, k2, f"project2image (pool {alloc})")
        kloop(mk_case(lambda c, r, p: gather_rows(
            r * (1.0 + c), jnp.clip(p, 0, n - 1))),
            (rows7, pix), k1, k2, f"gather_rows pool<-frame ({alloc}x7)")
        kloop(mk_case(lambda c, r, p: gather_rows(
            r * (1.0 + c), jnp.clip(p[:n], 0, alloc - 1))),
            (pool7, pix), k1, k2, f"gather_rows frame<-pool ({n}x7)")
        kloop(mk_case(lambda c, p, kk: jnp.full((n,), -1, jnp.int32).at[
            p + (c > 1).astype(jnp.int32)].max(kk, mode="drop")),
            (pix, key), k1, k2, f"scatter-max pool->img ({alloc})")
        kloop(mk_case(lambda c, p, m: jnp.zeros((n,), bool).at[
            p + (c > 1).astype(jnp.int32)].max(m, mode="drop")),
            (pix, key > 2 ** 29), k1, k2, f"scatter-max bool covered ({alloc})")

        def sort_winner(c, p, kk):
            ps, ks = jax.lax.sort((p + (c > 1).astype(jnp.int32), kk),
                                  num_keys=2)
            is_last = jnp.concatenate([ps[1:] != ps[:-1],
                                       jnp.ones((1,), bool)])
            idx = jnp.where(is_last, ps, n)
            return jnp.full((n,), -1, jnp.int32).at[idx].set(
                ks, mode="drop", unique_indices=True)
        kloop(mk_case(sort_winner), (pix, key), k1, k2,
              f"sort+set winner ({alloc})")
        kloop(mk_case(lambda c, m: jnp.cumsum(
            m & (c < 1.0)) - 1), (key > 2 ** 29,), k1, k2,
            f"cumsum rank ({alloc})")

        # covered-via-sort: the covered payload is ONE bit, so it packs into
        # a single-key i32 sort (pix<<1 | matched); segment tails give the
        # per-pixel any()
        def covered_sort(c, p, m):
            packed = ((p + (c > 1).astype(jnp.int32)) << 1) | m.astype(
                jnp.int32)
            s = jax.lax.sort(packed)
            spix = s >> 1
            is_last = jnp.concatenate([spix[1:] != spix[:-1],
                                       jnp.ones((1,), bool)])
            idx = jnp.where(is_last, spix, n)
            return jnp.zeros((n,), bool).at[idx].set(
                (s & 1) > 0, mode="drop", unique_indices=True)
        kloop(mk_case(covered_sort), (pix, key > 2 ** 29), k1, k2,
              f"covered via 1-key sort ({alloc})")
        kloop(mk_case(lambda c, p, m: (jnp.zeros((n,), jnp.int32).at[
            p + (c > 1).astype(jnp.int32)].max(m.astype(jnp.int32),
                                               mode="drop")) > 0),
            (pix, key > 2 ** 29), k1, k2,
            f"covered via i32 scatter-max ({alloc})")
        kloop(mk_case(lambda c, p: jnp.zeros((n,), jnp.int32).at[
            jnp.clip(p[:n], 0, n)].set(
                jnp.arange(n, dtype=jnp.int32) + (c > 1).astype(jnp.int32),
                mode="drop", unique_indices=True)),
            (pix,), k1, k2, "scatter-set src (N, unique)")

    if want("fuse_render"):
        from robust_pose_tpu import se3
        from robust_pose_tpu.slam.frame import make_frame
        from robust_pose_tpu.slam.surfel_map import (
            SurfelConfig, SurfelState, surfel_fuse_render)

        frames = 4
        cap = frames * H * W
        alloc = cap + H * W
        kmat = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])
        cfg = SurfelConfig(capacity=cap, img_shape=(H, W), d_thresh=0.05,
                           average_pts=False, exact_render=False)
        pts = rand(5, (alloc, 3), 1.0)
        z = 0.3 + 0.4 * pts[:, 2]
        x = (pts[:, 0] - 0.5) * z * (W / 500.0)
        y = (pts[:, 1] - 0.5) * z * (H / 500.0)
        hi = int(0.9 * cap)
        st = SurfelState(
            opts=jnp.stack([x, y, z], -1), rgb=rand(6, (alloc, 3), 255.0),
            conf=rand(7, (alloc,), 1.0),
            t_created=jnp.zeros((alloc,), jnp.int32),
            active=jnp.arange(alloc) < hi, tick=jnp.asarray(3, jnp.int32),
            pmat=se3.identity(()), n_dropped=jnp.zeros((), jnp.int32),
            hi=jnp.asarray(hi, jnp.int32))
        fr = make_frame(rand(8, (1, H, W, 3), 255.0),
                        rand(9, (1, H, W, 3), 255.0),
                        depth=0.3 + rand(10, (1, H, W, 1), 0.4),
                        mask=jnp.ones((1, H, W, 1), bool),
                        flow=rand(11, (1, H, W, 2), 2.0))

        def mk(k):
            @jax.jit
            def f(st, fr):
                def body(i, c):
                    st2, mf = surfel_fuse_render(
                        st._replace(conf=st.conf * (1.0 + c)), fr,
                        se3.identity(()), kmat, cfg)
                    return chain_scalar(mf.depth)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk, (st, fr), max(2, k1 // 2), max(6, k2 // 2),
              f"surfel_fuse_render (bucket {frames}xHW)")

    if want("f2m_track"):
        config = {"image_shape": (H, W), "iters": 12, "lbgfs_iters": 100,
                  "use_weights": True}
        model = PoseNet(config)
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        K = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])[None]
        init_model = PoseNet(dict(config, lookup="xla"))
        v = jax.jit(lambda kk: init_model.init(
            kk, img, img, K, jnp.ones((1,)), img, img),
            backend="cpu")(jax.random.PRNGKey(0))
        v = jax.device_put(v, jax.devices()[0])

        def mk(k):
            @jax.jit
            def f(v, ref, d1, sf1, limg, m, fm, nl, il, sf2, d2):
                def body(i, c):
                    out = model.apply(
                        v, ref * (1.0 + c), d1, jnp.ones((1, H, W, 1), bool),
                        sf1, limg, m, K, fm, nl, il, sf2, d2,
                        method=PoseNet.f2m_track)
                    return chain_scalar(out.pose)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk, (v, rand(0, (1, H, W, 3), 255.0),
                   jnp.full((1, H, W, 1), 0.5), jnp.zeros((1, H, W, 2)),
                   rand(1, (1, H, W, 3), 255.0), jnp.ones((1, H, W, 1), bool),
                   rand(2, (1, H8, W8, 256), 1.0), rand(3, (1, H8, W8, 128), 1.0),
                   rand(4, (1, H8, W8, 128), 1.0), jnp.full((1, H, W, 2), -16.0),
                   jnp.full((1, H, W, 1), 0.5)),
              max(2, k1 // 2), max(6, k2 // 2), "f2m_track (iters 100)")


if __name__ == "__main__":
    main()
