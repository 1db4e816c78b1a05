"""Full-depth, full-model multichip validation (VERDICT r3 item 5).

Jits the PRODUCTION train step — full RAFT (temporal + 2x stereo passes),
full-depth ``levels=3`` TinyUNet confidence heads (reference
core/unet/unet.py:80-82, core/pose/pose_net.py:24-27), IFT backward through
the pose argmin, AdamW — over the 8-device test mesh at 352x448, the
smallest image admitting the full-depth heads (the VALID 3x3 conv stacks at
1/8 scale need >= 44x44 features). No ``unet_levels`` truncation anywhere.

AOT-compiling the SPMD program exercises sharding propagation through every
layer of the real architecture, the partitioner's collective insertion
(gradient all-reduce over the mesh), and per-device buffer assignment.
EXECUTION then runs one real step: XLA:CPU's collective rendezvous
terminates when participants arrive > 40 s apart, so conftest.py raises
``--xla_cpu_collective_call_terminate_timeout_seconds`` — with it, the
full-depth 8-device step executes in ~6 min on the single-core CI host
(measured 357 s, round 5). Execution is the heavy-tier default; set
``SKIP_FULLDEPTH_EXEC=1`` to fall back to compile-only on hosts where the
serialized-device step time is prohibitive.
"""
import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 352, 448


@pytest.mark.heavy
def test_fulldepth_train_step_compiles_8dev():
    from robust_pose_tpu.parallel.mesh import make_mesh, shard_batch
    from robust_pose_tpu.train.trainer import PoseNetTrainer

    n = 8
    assert len(jax.devices()) >= n
    B = n
    config = {
        # full depth: no unet_levels override -> levels=3 TinyUNet heads;
        # iters/lbgfs trimmed only to bound compile time (they scale the
        # scan trip counts, not the sharded graph structure)
        "model": {"iters": 1, "lbgfs_iters": 2, "use_weights": True,
                  "pose_scale": 1.0, "dropout": 0.0, "small": False},
        "image_shape": [H, W],
        "depth_scale": 250,
        "train": {"batch_size": B, "learning_rate": 1e-4,
                  "weight_decay": 5e-5, "epsilon": 1e-8, "grad_clip": 1.0},
        "val": {"batch_size": B},
    }
    mesh = make_mesh(n)
    trainer = PoseNetTrainer(config, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    # valid-disparity flow head (see tests/test_training.py)
    state.params["flow"]["update"]["update_block"]["flow_head"]["conv2"][
        "bias"] = jnp.array([-2.5, 0.0])

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    imgs = [255.0 * jax.random.uniform(k, (B, 3, H, W)) for k in ks]
    mask = jnp.ones((B, 1, H, W), bool)
    gt = jnp.zeros((B, 7)).at[:, 6].set(1.0).at[:, 0].set(0.01)
    K = jnp.tile(jnp.array([[100.0, 0, W / 2], [0, 100.0, H / 2],
                            [0, 0, 1.0]])[None], (B, 1, 1))
    bl = jnp.full((B,), 30.0)
    batch = shard_batch(mesh, (*imgs, mask, mask, gt, K, bl))

    step = trainer.make_train_step()
    compiled = step.lower(state, batch).compile()

    # the SPMD partitioner must have inserted cross-device collectives
    # (gradient all-reduce at minimum) and assigned per-device buffers
    mem = compiled.memory_analysis()
    assert mem.temp_size_in_bytes > 0
    hlo = compiled.as_text()
    assert ("all-reduce" in hlo) or ("all-gather" in hlo) or (
        "collective" in hlo), "expected cross-device collectives in the HLO"

    if not os.environ.get("SKIP_FULLDEPTH_EXEC"):
        new_state, metrics = compiled(state, batch)
        jax.block_until_ready(new_state.params)
        assert bool(jnp.isfinite(metrics["train/loss_total"]))
