"""Decompose ``surfel_render``'s device milliseconds op by op.

The standalone render at a 4-frame bucket measures ~44 ms on v5e while its
logical HBM traffic is ~100 MB (~0.15 ms at peak BW) — so the time lives in
specific primitive lowerings, not raw bytes. This script times each phase of
the render pipeline (projection, key pack, scatter-max winner, pool-table
concat, winner gather, output assembly) as separate jitted programs over the
same pool shapes, to find the millisecond owners before optimizing.

Usage: python scripts/profile_render_decomp.py [--frames 4] [--iters 8]
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


_overhead_ms = [0.0]


def timed(fn, make_inputs, n=8, name=""):
    """Device milliseconds per application of ``fn``: the n input batches are
    stacked and scanned over INSIDE one jitted program (so the per-dispatch
    axon-tunnel RPC, ~20 ms, is paid once, not per iteration), and only a
    per-step scalar checksum leaves the device (a full-output fetch over the
    ~20-35 MB/s tunnel would otherwise dominate — it did: the first cut of
    this script 'measured' a 46 MB concat at 356 ms of pure transfer)."""
    batches = [make_inputs(i) for i in range(n)]
    stacked = jax.block_until_ready(
        [jnp.stack(xs) for xs in zip(*batches)])

    @jax.jit
    def scanned(stk):
        def body(_, inp):
            out = fn(*inp)
            # full-output checksum: consuming every element keeps XLA from
            # dead-code-eliminating unread output parts; the extra read is
            # one bandwidth pass over the output (~0.06 ms for 46 MB)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            return (), s
        _, ss = jax.lax.scan(body, (), tuple(stk))
        return ss

    _ = np.asarray(scanned(stacked))  # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _r in range(reps):
        ss = scanned(stacked)
    _ = np.asarray(ss)  # forced readback of (n,) scalars
    dt = (time.perf_counter() - t0) / (n * reps) * 1000.0
    dt -= _overhead_ms[0]
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def calibrate(n=8):
    """Measure the empty-scan + dispatch + readback floor and subtract it
    from every row."""
    _overhead_ms[0] = 0.0
    _overhead_ms[0] = max(0.0, timed(
        lambda x: x, lambda i: (jnp.zeros((8,), jnp.float32),), n,
        "(dispatch/readback floor, subtracted)"))


def rand(key, shape, scale=1.0, dtype=jnp.float32):
    return (scale * jax.random.uniform(jax.random.PRNGKey(key), shape)
            ).astype(dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    n = args.iters

    from robust_pose_tpu import se3
    from robust_pose_tpu.ops.gather import gather_rows
    from robust_pose_tpu.ops.geometry import project2image

    calibrate(n)

    cap = args.frames * N
    alloc = cap + N
    kmat = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])
    slot_bits = max(int(alloc - 1).bit_length(), 1)
    conf_bits = 31 - slot_bits
    qmax = (1 << conf_bits) - 1

    def mk_opts(i):
        pts = rand(5 * i, (alloc, 3))
        z = 0.3 + 0.4 * pts[:, 2]
        x = (pts[:, 0] - 0.5) * z * (W / 500.0)
        y = (pts[:, 1] - 0.5) * z * (H / 500.0)
        return jnp.stack([x, y, z], -1)

    def mk_pix(i):
        return jax.random.randint(jax.random.PRNGKey(9 * i), (alloc,), 0,
                                  N + 1, jnp.int32)

    def mk_key(i):
        k = jax.random.randint(jax.random.PRNGKey(9 * i + 1), (alloc,), 0,
                               2 ** 30, jnp.int32)
        return jnp.where(mk_pix(i) < N, k, -1)

    def mk_slotimg(i):
        return jax.random.randint(jax.random.PRNGKey(9 * i + 2), (N,), -1,
                                  alloc, jnp.int32)

    # 1. full-pool projection
    timed(jax.jit(lambda o: project2image(o[None], kmat[None], (H, W),
                                          se3.identity(())[None])),
          lambda i: (mk_opts(i),), n, "project2image (alloc pts)")

    # 2. key pack (elementwise over alloc)
    @jax.jit
    def pack(conf, valid):
        ids = jnp.arange(alloc, dtype=jnp.int32)
        q = jnp.clip((conf * qmax).astype(jnp.int32), 0, qmax)
        return jnp.where(valid, (q << slot_bits) | ids, -1)

    timed(pack, lambda i: (rand(3 * i, (alloc,)), mk_pix(i) < N), n,
          "key pack (elementwise alloc)")

    # 3. winner scatter-max
    timed(jax.jit(lambda pix, key: jnp.full((N,), -1, jnp.int32)
                  .at[pix].max(key, mode="drop")),
          lambda i: (mk_pix(i), mk_key(i)), n, "scatter-max winner (alloc->N)")

    # 4. pool-table concat (alloc, 7)
    @jax.jit
    def concat7(opts, rgb, conf):
        return jnp.concatenate([opts, rgb, conf[:, None]], axis=-1)

    timed(concat7, lambda i: (mk_opts(i), rand(2 * i, (alloc, 3), 255.0),
                              rand(3 * i, (alloc,))), n,
          "pool-table concat (alloc, 7)")

    # 5. winner payload gather (N rows from (alloc, 7))
    def mk_tbl(i):
        return concat7(mk_opts(i), rand(2 * i, (alloc, 3), 255.0),
                       rand(3 * i, (alloc,)))

    timed(jax.jit(lambda t, sl: gather_rows(t, jnp.clip(sl, 0, alloc - 1))),
          lambda i: (mk_tbl(i), mk_slotimg(i)), n,
          "winner gather (N rows of 7ch)")

    # 5b. same gather but channel-split (3 separate tables)
    @jax.jit
    def gsplit(opts, rgb, conf, sl):
        sl = jnp.clip(sl, 0, alloc - 1)
        return (gather_rows(opts, sl), gather_rows(rgb, sl),
                gather_rows(conf, sl))

    timed(gsplit, lambda i: (mk_opts(i), rand(2 * i, (alloc, 3), 255.0),
                             rand(3 * i, (alloc,)), mk_slotimg(i)), n,
          "winner gather (split 3+3+1)")

    # 6. output assembly (N-sized elementwise + transform)
    @jax.jit
    def assemble(win, slot_img):
        have = slot_img >= 0
        conf_img = jnp.where(have, win[:, 6], 0.0)
        zcam = se3.act(se3.identity(())[None], win[:, :3])[:, 2]
        depth_img = jnp.where(have, zcam, 0.0)
        rgb_img = jnp.where(have[:, None], win[:, 3:6], 0.0)
        return (rgb_img.reshape(1, H, W, 3), depth_img.reshape(1, H, W, 1),
                conf_img.reshape(1, H, W, 1))

    timed(assemble, lambda i: (rand(4 * i, (N, 7), 1.0), mk_slotimg(i)), n,
          "output assembly (N elementwise)")

    # 7. the valid mask + pix computation (elementwise over alloc)
    @jax.jit
    def pixcalc(ipts, inb, active):
        valid = inb & active
        px = jnp.clip(ipts[:, 0].astype(jnp.int32), 0, W - 1)
        py = jnp.clip(ipts[:, 1].astype(jnp.int32), 0, H - 1)
        return jnp.where(valid, py * W + px, N)

    timed(pixcalc, lambda i: (mk_opts(i), mk_pix(i) < N,
                              jnp.arange(alloc) < cap), n,
          "pix calc (elementwise alloc)")

    # 8. the per-frame scatter pair as shipped: covered (fuse) + winner
    # (render) as two independent scatter-maxes over the pool
    def mk_matched(i):
        return (jax.random.uniform(jax.random.PRNGKey(9 * i + 3),
                                   (alloc,)) < 0.5).astype(jnp.int32)

    @jax.jit
    def two_scatters(pix, key, matched):
        cov = jnp.zeros((N,), jnp.int32).at[pix].max(matched, mode="drop")
        win = jnp.full((N,), -1, jnp.int32).at[pix].max(key, mode="drop")
        return cov, win

    timed(two_scatters, lambda i: (mk_pix(i), mk_key(i), mk_matched(i)), n,
          "two scatter-maxes (covered + winner)")

    # 8b. same result in ONE windowed scatter: operand (N, 2), each index
    # visit max-combines a 2-element row — if the serialization cost is
    # per index visit (not per element), this halves the scatter wall time
    @jax.jit
    def fused_scatter(pix, key, matched):
        init = jnp.tile(jnp.array([[0, -1]], jnp.int32), (N, 1))
        upd = jnp.stack([matched, key], axis=-1)
        out = init.at[pix].max(upd, mode="drop")
        return out[:, 0], out[:, 1]

    timed(fused_scatter, lambda i: (mk_pix(i), mk_key(i), mk_matched(i)), n,
          "fused 2-col windowed scatter-max")

    # 8c. scatter-update-count scaling: N updates (one frame block) vs the
    # full pool — is the scatter per-update serialized or bandwidth-like?
    timed(jax.jit(lambda pix, key: jnp.full((N,), -1, jnp.int32)
                  .at[pix].max(key, mode="drop")),
          lambda i: (mk_pix(i)[:N], mk_key(i)[:N]), n,
          "scatter-max winner (N updates only)")

    # 8c'. chunked scatter-max: the same alloc rows split into K disjoint
    # chunks chained in place (bit-identical — max is associative and the
    # chunks partition the rows). 8c shows per-row cost FALLS at smaller
    # update counts; if that holds as a chain, the production covered and
    # winner scatters should each run as K chunks.
    def chunked(K):
        chunk = alloc // K

        @jax.jit
        def f(pix, key):
            out = jnp.full((N,), -1, jnp.int32)
            for j in range(K):
                out = out.at[jax.lax.dynamic_slice_in_dim(pix, j * chunk,
                                                          chunk)].max(
                    jax.lax.dynamic_slice_in_dim(key, j * chunk, chunk),
                    mode="drop")
            return out
        return f

    for K in (2, 4, 8):
        timed(chunked(K), lambda i: (mk_pix(i), mk_key(i)), n,
              f"scatter-max winner (chained {K} chunks)")

    # 8c''. coherent-index scatter-max: raster-ordered indices (the real
    # fuse/render projections are near-raster) vs 8b's random draw — does
    # XLA's scatter lowering exploit locality at all?
    def mk_pix_coherent(i):
        base = jnp.tile(jnp.arange(N, dtype=jnp.int32), alloc // N + 1)
        jig = jax.random.randint(jax.random.PRNGKey(7 * i), (alloc,), -2, 3)
        return jnp.clip(base[:alloc] + jig, 0, N - 1)

    timed(jax.jit(lambda pix, key: jnp.full((N,), -1, jnp.int32)
                  .at[pix].max(key, mode="drop")),
          lambda i: (mk_pix_coherent(i), mk_key(i)), n,
          "scatter-max winner (coherent idx)")

    # 8d. sort-based winner at the pool size (the cfg.winner='sort' path)
    @jax.jit
    def sort_winner(pix, key):
        ps, ks = jax.lax.sort((pix, key), num_keys=2)
        is_last = jnp.concatenate([ps[1:] != ps[:-1], jnp.ones((1,), bool)])
        idx = jnp.where(is_last, ps, N)
        return jnp.full((N,), -1, jnp.int32).at[idx].set(
            ks, mode="drop", unique_indices=True)

    timed(sort_winner, lambda i: (mk_pix(i), mk_key(i)), n,
          "sort-based winner (pool)")

    # sanity: fused == two-pass on one batch
    pix, key, mat = mk_pix(0), mk_key(0), mk_matched(0)
    c2, w2 = two_scatters(pix, key, mat)
    cf, wf = fused_scatter(pix, key, mat)
    ok = bool(jnp.all(c2 == cf) & jnp.all(w2 == wf))
    print(f"fused == two-pass: {ok}")


if __name__ == "__main__":
    main()
