"""Winner-primitive probe (round 5): the shipped double-sort segment
pipeline vs the scatter-max production passes, at the real f2m pool shapes.

Findings feeding this design (earlier probe iterations, one v5e):
  - production scatter-max: 7-9 ms/pass, 18.3 ms for the covered+winner
    pair (TPU scatter serializes per update row; pairing does not overlap)
  - 1.3M-row 2-key bitonic sort: 2.3-2.8 ms  <-- the fast full-pool prim
  - searchsorted extraction: 51 ms (XLA 'scan' binary search — dead end)
  - Pallas serial VMEM scatter: unsupported (unaligned 1-elem vector store)

Measures the helpers the surfel map now ships (slam/surfel_map.py):
``_seg_kmax`` (winner max: 2-op sort + tail-compaction sort + n-row
unique+sorted set), ``_seg_covered`` (segment OR with the flag packed into
the key LSB: two 1-op sorts), and the hinted appended-block extension
scatter (unique ascending source pixels).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from robust_pose_tpu.slam.surfel_map import _seg_covered, _seg_kmax

H, W = 512, 640
N = H * W
ALLOC = 4 * N + N  # capacity + the N-row append scratch margin


def kloop(make_fn, args, name, k1=3, k2=9, reps=3):
    def timed(k):
        fn = make_fn(k)
        out = fn(*args)
        _ = np.asarray(out).ravel()[:1]
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(out).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]
    per = (timed(k2) - timed(k1)) / (k2 - k1) * 1000.0
    print(f"{name:58s} {per:8.2f} ms/op", flush=True)
    return per


def chain(leaf):
    return jnp.sum(leaf.ravel()[:1]).astype(jnp.float32) * 0.0


def mk(body_fn):
    def make(k):
        @jax.jit
        def f(*args):
            def body(i, c):
                p = jnp.clip(args[0] + i, 0, N)  # i-dependent: no hoisting
                return c + body_fn(p, *args[1:])
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return f
    return make


def main():
    rows = int(os.environ.get("ROWS", ALLOC))
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.integers(0, N + 1, rows).astype(np.int32))
    key = jnp.asarray(rng.integers(0, 2 ** 30, rows).astype(np.int32))
    mat = jnp.asarray(rng.integers(0, 2, rows).astype(np.int32))
    # appended-block extension: unique ascending pixels, sentinel tail
    bp = np.full(N, N, np.int32)
    placed = rng.random(N) < 0.5
    bp[: placed.sum()] = np.nonzero(placed)[0]
    blk_pix = jnp.asarray(bp)
    blk_key = jnp.asarray(rng.integers(0, 2 ** 30, N).astype(np.int32))
    print(f"rows={rows} targets={N}", flush=True)

    @jax.jit
    def check(pix, key, mat):
        ref_w = jnp.full((N,), -1, jnp.int32).at[pix].max(key, mode="drop")
        ref_c = jnp.zeros((N,), jnp.int32).at[pix].max(mat, mode="drop") > 0
        pixc = jnp.minimum(pix, N - 1)  # covered pass uses clipped indices
        ref_cc = jnp.zeros((N,), jnp.int32).at[pixc].max(
            mat, mode="drop") > 0
        got_w = _seg_kmax(pix, key, N)
        got_c = _seg_covered(pixc, mat, N)
        ref_e = ref_w.at[blk_pix].max(blk_key, mode="drop")
        got_e = ref_w.at[blk_pix].max(blk_key, mode="drop",
                                      unique_indices=True,
                                      indices_are_sorted=True)
        return (jnp.all(ref_w == got_w), jnp.all(ref_cc == got_c),
                jnp.all(ref_e == got_e))
    ok_w, ok_c, ok_e = check(pix, key, mat)
    assert bool(ok_w), "winner mismatch"
    assert bool(ok_c), "covered mismatch"
    assert bool(ok_e), "extension mismatch"
    print("correctness: segment pipeline == scatter (winner/covered/ext)",
          flush=True)

    kloop(mk(lambda p, k: chain(
        jnp.full((N,), -1, jnp.int32).at[p].max(k, mode="drop"))),
        (pix, key), "winner: scatter-max (production)")
    kloop(mk(lambda p, k: chain(_seg_kmax(p, k, N))),
          (pix, key), "winner: _seg_kmax")

    kloop(mk(lambda p, m: chain(
        jnp.zeros((N,), jnp.int32).at[jnp.minimum(p, N - 1)].max(
            m, mode="drop"))),
        (pix, mat), "covered: scatter-max (production)")
    kloop(mk(lambda p, m: chain(
        _seg_covered(jnp.minimum(p, N - 1), m, N).astype(jnp.int32))),
        (pix, mat), "covered: _seg_covered")

    base = jnp.full((N,), -1, jnp.int32)
    kloop(mk(lambda p, bk: chain(
        base.at[jnp.minimum(p[:N] + 0 * bk[:1], N)].max(bk, mode="drop"))),
        (blk_pix, blk_key), "ext: scatter-max N rows (no hints)")

    def ext_hinted(p, bk):
        return chain(base.at[p[:N] + 0 * bk[:1]].max(
            bk, mode="drop", unique_indices=True, indices_are_sorted=True))
    kloop(mk(ext_hinted), (blk_pix, blk_key),
          "ext: scatter-max N rows (unique+sorted)")

    # stage decomposition of _seg_kmax
    kloop(mk(lambda p, k: chain(
        jax.lax.sort((p, k), num_keys=2, is_stable=False)[1])),
        (pix, key), "  2-op 2-key sort (rows)")
    kloop(mk(lambda p, m: chain(jax.lax.sort((p << 1) | m,
                                             is_stable=False))),
          (pix, mat), "  1-op sort (rows)")


if __name__ == "__main__":
    main()
