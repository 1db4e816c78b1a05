"""Decompose the BasicEncoder cost on TPU: norm variants, batch scaling,
and a conv-only ablation — to locate the encoder milliseconds.

Usage: python scripts/profile_encoder.py [--iters 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

H, W = 512, 640


def timed(fn, make_inputs, n=8, name=""):
    batches = [jax.block_until_ready(make_inputs(i)) for i in range(n + 1)]
    out = fn(*batches[-1])
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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    n = args.iters

    from robust_pose_tpu.models.raft import BasicEncoder

    for norm in ("instance", "none"):
        for b in (2, 4, 8):
            enc = BasicEncoder(output_dim=256, norm=norm, dtype=jnp.bfloat16)
            v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
            f = jax.jit(lambda v, x: enc.apply(v, x))
            timed(f, lambda i: (v, rand(i, (b, H, W, 3), 2.0)), n,
                  f"fnet norm={norm} (batch {b})")

    # instance_norm kernel in isolation at the encoder's biggest shape
    from robust_pose_tpu.ops.pallas_instance_norm import instance_norm
    f = jax.jit(instance_norm)
    timed(f, lambda i: (rand(i, (4, 256, 320, 64), 1.0).astype(jnp.bfloat16),),
          n, "instance_norm (4, 256, 320, 64) bf16")
    timed(f, lambda i: (rand(i, (4, 128, 160, 96), 1.0).astype(jnp.bfloat16),),
          n, "instance_norm (4, 128, 160, 96) bf16")


if __name__ == "__main__":
    main()
