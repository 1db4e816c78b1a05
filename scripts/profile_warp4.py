"""Does chunk-serializing a SINGLE large rank-2 gather speed it up?

profile_warp3.py: one 327k-row gather = 7.3 ms, but eight of them chained
by barriers = 12.8 ms total (1.6 ms each). If the win comes from issuing
multiple gathers per dependency chain, splitting one big gather into S
serialized chunks should approach 13 GB/s too.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 640
N = H * W
M = (H + 1) * (W + 1)


def rand(key, shape, scale=1.0):
    return scale * jax.random.uniform(jax.random.PRNGKey(key), shape)


def _time_dispatch(fn, args, reps=3):
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
    t1 = _time_dispatch(make_fn(k1), args, reps)
    t2 = _time_dispatch(make_fn(k2), args, reps)
    per = (t2 - t1) / (k2 - k1) * 1000.0
    print(f"{name:58s} {per:8.2f} ms/op", flush=True)
    return per


def chain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1]).astype(jnp.float32) * 0.0


def gather_chunked(flat, idx, s):
    """take_along_axis(axis=0) split into s serialized chunks."""
    n = idx.shape[0]
    assert n % s == 0
    outs = []
    for j in range(s):
        ij = jax.lax.dynamic_slice_in_dim(idx, j * (n // s), n // s)
        if outs:
            ij, _ = jax.lax.optimization_barrier((ij, outs[-1]))
        outs.append(jnp.take_along_axis(flat, ij[:, None], axis=0))
    return jnp.concatenate(outs, axis=0)


def main():
    k1, k2 = 3, 9

    # surfel-fuse-like: gather 1.6M rows of 7ch f32 from a 327k-row table
    tbl7 = rand(0, (N, 8), 1.0)  # pad 7 -> 8 for alignment comparison
    big = 5 * N
    idxb = jax.random.randint(jax.random.PRNGKey(1), (big,), 0, N, jnp.int32)

    for s in (1, 4, 8, 16, 32):
        def mk(k, s=s):
            @jax.jit
            def f(tbl, idx):
                def body(i, c):
                    ix = jnp.clip(idx + i, 0, N - 1)
                    r = gather_chunked(tbl, ix, s)
                    return chain(r)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk, (tbl7, idxb), k1, k2,
              f"fuse-like gather 1.6M rows x 32B, chunks={s}")

    # warp-like: 327k rows x 64B
    tblq = rand(2, (M, 16), 1.0)
    idxq = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, M, jnp.int32)
    for s in (1, 4, 8, 16):
        def mk2(k, s=s):
            @jax.jit
            def f(tbl, idx):
                def body(i, c):
                    ix = jnp.clip(idx + i, 0, M - 1)
                    r = gather_chunked(tbl, ix, s)
                    return chain(r)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk2, (tblq, idxq), k1, k2,
              f"warp-like gather 327k rows x 64B, chunks={s}")

    # scatter-max, surfel-render-like: 1.6M int32 updates -> 327k pixels
    key = jax.random.randint(jax.random.PRNGKey(4), (big,), 0, 2 ** 30,
                             jnp.int32)

    def scatter_chunked(pix, key, s):
        outs = jnp.full((N,), -1, jnp.int32)
        n = pix.shape[0]
        for j in range(s):
            pj = jax.lax.dynamic_slice_in_dim(pix, j * (n // s), n // s)
            kj = jax.lax.dynamic_slice_in_dim(key, j * (n // s), n // s)
            if j:
                pj, _ = jax.lax.optimization_barrier((pj, outs))
            outs = outs.at[pj].max(kj, mode="drop")
        return outs

    for s in (1, 4, 8, 16):
        def mk3(k, s=s):
            @jax.jit
            def f(pix, key):
                def body(i, c):
                    p = jnp.clip(pix + i, 0, N)
                    r = scatter_chunked(p, key, s)
                    return chain(r)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk3, (idxb, key), k1, k2,
              f"scatter-max 1.6M -> 327k int32, chunks={s}")


if __name__ == "__main__":
    main()
