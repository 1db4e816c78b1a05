"""PoseNet training CLI — rebuild of reference scripts/train_posenet.py:55-179.

Supervised tangent-space pose training with flow-freeze, best/last checkpoint
saving driven by validation loss, NaN-stop, and SPMD data-parallel execution
over all available devices (replacing the reference's nn.DataParallel).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml

SUM_FREQ = 100
VAL_FREQ = 1000


def _collate(samples):
    return tuple(np.stack([s[i] for s in samples]) for i in range(9))


def _batches(dataset, batch_size, rng=None, shuffle=False):
    idx = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        yield _collate([dataset[j] for j in idx[i:i + batch_size]])


def run_val(trainer, state, val_step, data_val, batch_size, logger, mesh):
    from robust_pose_tpu.data.dataset_utils import prefetch_iterator
    from robust_pose_tpu.parallel.mesh import shard_batch

    losses = []
    for batch in prefetch_iterator(_batches(data_val, batch_size)):
        m = val_step(state, shard_batch(mesh, batch))
        logger.push({k: float(v) for k, v in m.items() if k != "val/loss"},
                    max(len(data_val) // batch_size, 1), "val")
        losses.append(float(m["val/loss"]))
    logger.flush("val")
    return float(np.mean(losses)) if losses else float("nan")


def main(args, config, force_cpu=False):
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from robust_pose_tpu.data import train_datasets as datasets
    from robust_pose_tpu.data.dataset_utils import prefetch_iterator
    from robust_pose_tpu.parallel.mesh import make_mesh, shard_batch
    from robust_pose_tpu.train.trainer import PoseNetTrainer
    from robust_pose_tpu.utils.checkpoints import (
        load_checkpoint_any,
        save_checkpoint,
    )
    from robust_pose_tpu.utils.logging import TrainLogger

    config["model"]["image_shape"] = config["image_shape"]
    rng = np.random.default_rng(1234)

    data_train = datasets.get_data(config["data"]["train"],
                                   config["image_shape"], config["depth_scale"])
    data_val = datasets.get_data(config["data"]["val"], config["image_shape"],
                                 config["depth_scale"])
    print(f"train: {len(data_train)} samples, val: {len(data_val)} samples")

    mesh = make_mesh()
    freeze_flow = config["train"].get("freeze_flow_steps", 1) > 0
    trainer = PoseNetTrainer(config, mesh=mesh, freeze_flow=freeze_flow)

    variables = None
    pretrained = config["model"].get("pretrained")
    if pretrained and os.path.isfile(pretrained):
        # RAFT warm start (reference train_posenet.py:68-69 init_from_raft)
        from robust_pose_tpu.utils.torch_convert import convert_raft_pth
        import jax.numpy as jnp

        H, W = config["image_shape"]
        img = jnp.zeros((1, H, W, 3))
        K = jnp.eye(3)[None]
        variables = trainer.model.init(jax.random.PRNGKey(1234), img, img, K,
                                       jnp.ones((1,)), img, img)
        variables = dict(variables)
        raft = convert_raft_pth(pretrained)
        variables["params"] = dict(variables["params"], flow=raft["params"])
        variables["batch_stats"] = dict(variables.get("batch_stats", {}),
                                        flow=raft["batch_stats"])
    if args.restore_ckpt:
        ck = load_checkpoint_any(args.restore_ckpt)
        variables = ck["params"]

    state = trainer.init_state(jax.random.PRNGKey(1234), variables)
    train_step = trainer.make_train_step()
    val_step = trainer.make_val_step()

    logger = TrainLogger(config, args.name, args.log)
    os.makedirs(args.outpath, exist_ok=True)

    total_steps = 0
    best_loss = 1e6
    batch_size = config["train"]["batch_size"]
    should_keep_training = True
    while should_keep_training:
        # background-thread batch prefetch: decode/augment the next batches
        # while the device runs the current step (reference used DataLoader
        # workers — train_posenet.py:64-65; without this a real TPU run is
        # host-bound on cv2 decode)
        for batch in prefetch_iterator(
                _batches(data_train, batch_size, rng, shuffle=True)):
            state, metrics = train_step(state, shard_batch(mesh, batch))
            logger.push({k: float(v) for k, v in metrics.items()}, SUM_FREQ)
            if total_steps % SUM_FREQ == SUM_FREQ - 1:
                logger.flush()

            if total_steps % VAL_FREQ == 0:
                val_loss = run_val(trainer, state, val_step, data_val,
                                   config["val"]["batch_size"], logger, mesh)
                if np.isnan(val_loss):
                    # NaN-stop (reference train_posenet.py:144-146)
                    should_keep_training = False
                    break
                variables_out = {"params": state.params,
                                 "batch_stats": state.batch_stats}
                if val_loss < best_loss:
                    best_loss = val_loss
                    path = os.path.join(args.outpath, args.name)
                    save_checkpoint(path, variables_out, config)
                    logger.save_model(path)
                save_checkpoint(os.path.join(args.outpath, f"{args.name}_last"),
                                variables_out, config)
            total_steps += 1
            if total_steps > config["train"]["epochs"]:
                should_keep_training = False
                break
        if len(data_train) < batch_size:
            break

    logger.close()
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="RAFT-poseEstimator",
                        help="name your experiment")
    parser.add_argument("--outpath", default="output", help="output path")
    parser.add_argument("--log", action="store_true")
    parser.add_argument("--restore_ckpt", help="restore checkpoint")
    parser.add_argument("--config", help="yaml config file",
                        default=os.path.join(os.path.dirname(__file__),
                                             "../configuration/train.yaml"))
    parser.add_argument("--force_cpu", action="store_true")
    parser.add_argument("--dbg", action="store_true")
    args = parser.parse_args()

    np.random.seed(1234)
    with open(args.config, "r") as f:
        config = yaml.safe_load(f)
    main(args, config, args.force_cpu)
