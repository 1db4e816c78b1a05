"""Scatter-side microbenchmarks for the surfel fuse/render winner passes.

Chunk-serialization does not help scatters (profile_warp4.py). Sweep what
does: payload width (can `covered` ride the winner scatter as a second
channel?), update count, and the lax.sort-based segment-winner alternative.
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


def main():
    k1, k2 = 3, 9
    for upd in (N, 5 * N):
        pix = jax.random.randint(jax.random.PRNGKey(0), (upd,), 0, N + 1,
                                 jnp.int32)
        key = jax.random.randint(jax.random.PRNGKey(1), (upd,), 0, 2 ** 30,
                                 jnp.int32)

        def mk1(k):
            @jax.jit
            def f(pix, key):
                def body(i, c):
                    p = jnp.clip(pix + i, 0, N)
                    r = jnp.full((N,), -1, jnp.int32).at[p].max(
                        key, mode="drop")
                    return chain(r)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk1, (pix, key), k1, k2, f"scatter-max 1ch ({upd//N}N updates)")

        def mk2(k):
            @jax.jit
            def f(pix, key):
                def body(i, c):
                    p = jnp.clip(pix + i, 0, N)
                    payload = jnp.stack([key, (key > 0).astype(jnp.int32)],
                                        axis=-1)
                    r = jnp.full((N, 2), -1, jnp.int32).at[p].max(
                        payload, mode="drop")
                    return chain(r)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk2, (pix, key), k1, k2, f"scatter-max 2ch ({upd//N}N updates)")

        def mk_sort(k):
            @jax.jit
            def f(pix, key):
                def body(i, c):
                    p = jnp.clip(pix + i, 0, N)
                    ps, ks = jax.lax.sort((p, key), num_keys=2)
                    is_last = jnp.concatenate(
                        [ps[1:] != ps[:-1], jnp.ones((1,), bool)])
                    idx = jnp.where(is_last, ps, N)
                    r = jnp.full((N,), -1, jnp.int32).at[idx].set(
                        ks, mode="drop", unique_indices=True)
                    return chain(r)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk_sort, (pix, key), k1, k2,
              f"sort+tail-set winner ({upd//N}N updates)")

        # unique-index set at update count (the src build in _fuse_core)
        def mk_set(k):
            @jax.jit
            def f(pix):
                def body(i, c):
                    p = jnp.clip(pix + i, 0, N)
                    ids = jnp.arange(upd, dtype=jnp.int32) % N
                    r = jnp.zeros((N,), jnp.int32).at[p].set(
                        ids, mode="drop", unique_indices=True)
                    return chain(r)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return f
        kloop(mk_set, (pix,), k1, k2,
              f"unique set ({upd//N}N updates)")

    # bool any-covered scatter at 1.6M updates
    pix = jax.random.randint(jax.random.PRNGKey(3), (5 * N,), 0, N + 1)
    m = jax.random.randint(jax.random.PRNGKey(4), (5 * N,), 0, 2) > 0

    def mk_cov(k):
        @jax.jit
        def f(pix, m):
            def body(i, c):
                p = jnp.clip(pix + i, 0, N)
                r = jnp.zeros((N,), bool).at[p].max(m, mode="drop")
                return chain(r.astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return f
    kloop(mk_cov, (pix, m), k1, k2, "covered bool scatter-max (5N updates)")


if __name__ == "__main__":
    main()
