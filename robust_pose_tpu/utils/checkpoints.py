"""Checkpoint save/load: {params, config} bundles.

Rebuild of the reference's checkpoint contract — torch .pth dicts holding
``{'state_dict', 'config'}`` (reference scripts/train_posenet.py:147-153,
core/pose/pose_estimator.py:26-37) — as a directory with a msgpack-serialized
flax variable tree plus a JSON config. Orbax is used for training state
(params + optimizer) checkpoints with async writes.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import flax.serialization
import jax


def save_checkpoint(path: str, variables: Any, config: Dict) -> None:
    """Write {params, config} to ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "checkpoint.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Dict:
    """Load a {params, config} bundle.

    :param target: optional template pytree (restores exact array types);
        without it the tree is restored as nested dicts of numpy arrays.
    :return: {'params': variables, 'config': config}
    """
    with open(os.path.join(path, "checkpoint.msgpack"), "rb") as f:
        data = f.read()
    if target is not None:
        variables = flax.serialization.from_bytes(target, data)
    else:
        variables = flax.serialization.msgpack_restore(data)
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    return {"params": variables, "config": config}


def load_checkpoint_any(path: str) -> Dict:
    """Load either our bundle directory or a reference torch .pth checkpoint
    (converted on the fly via utils/torch_convert)."""
    if os.path.isdir(path):
        return load_checkpoint(path)
    if path.endswith((".pth", ".pt")):
        from robust_pose_tpu.utils.torch_convert import convert_posenet_pth
        return convert_posenet_pth(path)
    raise ValueError(f"unrecognized checkpoint: {path}")


# ---------------------------------------------------------------------------
# full training-state checkpoints (params + batch_stats + optimizer state)
# ---------------------------------------------------------------------------

def save_train_state(path: str, state) -> None:
    """Orbax checkpoint of a TrainState (async-capable, atomic renames).

    The reference only ever checkpoints model weights (train_posenet.py:150),
    so optimizer state is lost on resume; this preserves it.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state(path: str, target):
    """Restore a TrainState saved by save_train_state.

    :param target: a template TrainState (e.g. from trainer.init_state) that
        provides the tree structure and array dtypes
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=target)
