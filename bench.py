"""Benchmark: fused per-frame tracking step throughput on one TPU chip.

Measures the complete PoseNet tracking step (batched temporal+stereo RAFT
flow at 12 GRU iterations, disparity->depth, flow warps, TinyUNet confidence
heads, 20-iteration Gauss-Newton pose solve) at the production StereoMIS
shape 512x640 — the per-frame work of reference scripts/infer_trajectory.py
(configuration/infer_f2f.yaml compute shape).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is FPS / 30 (the >30 FPS north-star target from BASELINE.md).
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from robust_pose_tpu.models.posenet import PoseNet

    H, W = 512, 640
    config = {"image_shape": (H, W), "iters": 12, "lbgfs_iters": 20,
              "use_weights": True}
    model = PoseNet(config)

    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    K = jnp.array([[500.0, 0.0, W / 2], [0.0, 500.0, H / 2],
                   [0.0, 0.0, 1.0]])[None]
    bl = jnp.asarray([16.0], jnp.float32)
    variables = model.init(key, img, img, K, bl, img, img)

    @jax.jit
    def step(variables, img1, img2, img2r, depth1, mask, sflow1):
        return model.apply(
            variables, img1, img2, K, bl, depth1, img2r, mask, mask, sflow1,
            method=PoseNet.infer,
        )

    # distinct inputs per timed call: the axon runtime caches results of
    # byte-identical executions, which would fake the steady-state FPS
    def make_inputs(i):
        ks = jax.random.split(jax.random.PRNGKey(i), 3)
        return (
            255.0 * jax.random.uniform(ks[0], (1, H, W, 3)),
            255.0 * jax.random.uniform(ks[1], (1, H, W, 3)),
            255.0 * jax.random.uniform(ks[2], (1, H, W, 3)),
            jnp.full((1, H, W, 1), 0.5),
            jnp.ones((1, H, W, 1), bool),
            jnp.full((1, H, W, 2), -16.0),
        )

    n_iters = 12
    batches = [jax.block_until_ready(make_inputs(i)) for i in range(n_iters + 1)]

    # warmup (compile)
    out = step(variables, *batches[-1])
    jax.block_until_ready(out.pose)

    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(variables, *batches[i])
    jax.block_until_ready(out.pose)
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "stereomis_tracking_step_fps_512x640",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
