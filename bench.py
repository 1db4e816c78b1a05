"""Benchmark: steady-state streaming throughput of the tracking step on one
TPU chip.

Measures the complete PoseNet tracking step (batched temporal+stereo RAFT
flow at 12 GRU iterations, disparity->depth, flow warps, TinyUNet confidence
heads, 20-iteration Gauss-Newton pose solve) at the production StereoMIS
shape 512x640 — the per-frame work of reference scripts/infer_trajectory.py
(configuration/infer_f2f.yaml compute shape).

Frames are processed as a lax.scan over a pre-staged window with the REAL
sequential dependency (frame t consumes frame t-1's image/depth/stereo-flow
state and the poses chain), one dispatch per window — the steady-state
throughput a double-buffered host pipeline sustains. Distinct random frames
per window (the axon runtime caches byte-identical executions).

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
    T = 8             # frames per window (one dispatch)
    N_WINDOWS = 6
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
    def window(variables, state, limgs, rimgs, masks):
        """Track T frames sequentially in one dispatch (f2f chaining; the
        reference image's encoder features are carried, not recomputed)."""
        def body(st, fr):
            img1, depth1, sflow1, last_pose, feats = st
            limg, rimg, mask = fr
            out = model.apply(
                variables, img1, limg, K, bl, depth1, rimg, mask, mask,
                sflow1, method=PoseNet.infer, feats=feats,
            )
            new_pose = jnp.where(
                jnp.all(jnp.isfinite(out.pose)), out.pose, last_pose)
            return ((limg, out.depth2, out.stereo_flow2, new_pose, out.feats),
                    new_pose)

        st, poses = jax.lax.scan(body, state, (limgs, rimgs, masks))
        return st, poses

    @jax.jit
    def encode_ref(variables, img):
        return model.apply(variables, img, method=PoseNet.encode_ref)

    def make_window(i):
        # uint8 frames: what a real camera/decoder delivers — 4x fewer
        # staged bytes than f32 (the model normalizes internally)
        ks = jax.random.split(jax.random.PRNGKey(i), 2)
        return (
            jax.random.randint(ks[0], (T, 1, H, W, 3), 0, 255, jnp.uint8),
            jax.random.randint(ks[1], (T, 1, H, W, 3), 0, 255, jnp.uint8),
            jnp.ones((T, 1, H, W, 1), bool),
        )

    img0 = jnp.zeros((1, H, W, 3), jnp.uint8)
    state0 = (img0,
              jnp.full((1, H, W, 1), 0.5),
              jnp.full((1, H, W, 2), -16.0),
              jnp.zeros((1, 7)).at[:, 6].set(1.0),
              encode_ref(variables, img0))
    windows = [jax.block_until_ready(make_window(i))
               for i in range(N_WINDOWS + 2)]

    # warmup TWICE: the first call compiles for the uncommitted state0
    # placement; the second compiles the steady-state signature where the
    # carry is a committed jit output — both must be cached before timing
    st, poses = window(variables, state0, *windows[-1])
    jax.block_until_ready(poses)
    st, poses = window(variables, st, *windows[-2])
    # warm the readback path too — its (tiny) reduce would otherwise compile
    # inside the timed region (~10 s via the remote compile helper)
    _ = float(jnp.sum(poses))

    t0 = time.perf_counter()
    for i in range(N_WINDOWS):
        st, poses = window(variables, st, *windows[i])
    # forced host readback: on the axon tunnel block_until_ready can return
    # before remote execution completes; fetching a value cannot
    _ = float(jnp.sum(poses))
    dt = (time.perf_counter() - t0) / (N_WINDOWS * T)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "stereomis_tracking_fps_512x640_streaming",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
