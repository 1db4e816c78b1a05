"""PoseNet training: optax AdamW + grad clip, flow-freeze masking, SPMD
data-parallel step over an ICI mesh, orbax train-state checkpoints.

TPU-native rebuild of reference scripts/train_posenet.py:55-160:
* AdamW(lr 1e-5, wd 5e-5, eps 1e-8) + global-norm clip 1.0
  (reference train_posenet.py:80-86, 118-136; AMP GradScaler is unnecessary —
  TPU bf16 matmuls need no loss scaling)
* RAFT weights frozen via an optax mask (reference ``freeze_flow``,
  pose_net.py:149-154 + freeze_flow_steps ~ infinity in train.yaml)
* gradients flow through the GN argmin via the IFT custom_vjp
* the whole fwd+bwd+update is ONE jitted SPMD step: batch sharded over the
  ``data`` mesh axis, params replicated, XLA all-reduces grads over ICI
  (replaces reference nn.DataParallel, train_posenet.py:77-79)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import freeze, unfreeze
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from robust_pose_tpu.models.posenet import PoseNet
from robust_pose_tpu.parallel.mesh import DATA_AXIS, make_mesh
from robust_pose_tpu.train.losses import loss_metrics, supervised_pose_loss

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def _flow_mask(params):
    """True for every leaf under the RAFT ('flow') subtree."""
    def label_fn(path, _):
        return len(path) > 0 and getattr(path[0], "key", None) == "flow"

    return jax.tree_util.tree_map_with_path(label_fn, params)


def _freeze_until(inner, mask, n_steps):
    """Freeze ``mask`` leaves for the first ``n_steps`` optimizer steps.

    Matches torch AdamW-with-requires_grad-False semantics (reference
    scripts/train_posenet.py:75,98-99 ``freeze_flow`` + unfreeze at
    ``freeze_flow_steps``): while frozen, gradients are zeroed BEFORE the
    inner transform (moments stay exactly zero) and updates are zeroed AFTER
    it (no weight-decay drift); at unfreeze the moments ramp from zero, like
    torch params whose ``.grad`` was None.

    :param n_steps: step count before unfreezing; None freezes forever
    """
    def _zero_masked(tree, frozen):
        return jax.tree.map(
            lambda m, x: jnp.where(frozen, jnp.zeros_like(x), x) if m else x,
            mask, tree,
        )

    def init(params):
        return (jnp.zeros((), jnp.int32), inner.init(params))

    def update(grads, state, params=None):
        count, inner_state = state
        frozen = (jnp.array(True) if n_steps is None
                  else count < jnp.asarray(n_steps, jnp.int32))
        grads = _zero_masked(grads, frozen)
        updates, inner_state = inner.update(grads, inner_state, params)
        updates = _zero_masked(updates, frozen)
        return updates, (count + 1, inner_state)

    return optax.GradientTransformation(init, update)


def make_optimizer(train_cfg: Dict, params, freeze_flow: bool = True):
    """AdamW + clip; RAFT weights frozen for the first ``freeze_flow_steps``
    steps (reference configuration/train.yaml:51 — effectively forever in the
    published config — with the mid-run unfreeze of train_posenet.py:98-99)."""
    opt = optax.chain(
        optax.clip_by_global_norm(train_cfg.get("grad_clip", 1.0)),
        optax.adamw(
            learning_rate=train_cfg.get("learning_rate", 1e-5),
            weight_decay=train_cfg.get("weight_decay", 5e-5),
            eps=train_cfg.get("epsilon", 1e-8),
        ),
    )
    if not freeze_flow:
        return opt
    n_steps = train_cfg.get("freeze_flow_steps", None)  # None = forever
    return _freeze_until(opt, _flow_mask(params), n_steps)


class PoseNetTrainer:
    """Builds the jitted SPMD train/val steps for a PoseNet.

    :param config: full training config (reference configuration/train.yaml
        layout: model / train / val / image_shape / depth_scale keys)
    :param mesh: optional device mesh; defaults to all local devices
    """

    def __init__(self, config: Dict, mesh: Optional[Mesh] = None,
                 freeze_flow: bool = True):
        self.config = config
        model_cfg = dict(config["model"])
        model_cfg["image_shape"] = tuple(config["image_shape"])
        # While RAFT stays frozen for the WHOLE run (the reference's
        # published config: freeze_flow with freeze_flow_steps ~ infinity,
        # train_posenet.py:75,98-99 + configuration/train.yaml), gradients
        # into the flow network are exactly dead — every trainable leaf is
        # downstream — so the train step cuts them at the RAFT output
        # boundary (models/posenet.py stop_flow_grad) instead of computing
        # a full RAFT backward whose result the optimizer mask zeroes.
        # With a finite freeze_flow_steps (mid-run unfreeze) the gradients
        # become live, so the cut is disabled and the mask carries the
        # freeze semantics alone.
        stop_flow = config["train"].get(
            "stop_flow_grad",
            freeze_flow and config["train"].get("freeze_flow_steps",
                                                None) is None)
        model_cfg.setdefault("stop_flow_grad", stop_flow)
        # rematerialize the GRU-iteration + encoder activations in the
        # backward pass: MEASURED on one v5e (scripts/bench_train_step.py),
        # batch 8 at 512x640 without remat needs 267.5 GiB of HBM (XLA
        # refuses to compile; 12 scan iterations of stored conv
        # activations) vs the chip's 15.75 GiB; with remat it compiles at
        # 15.10 GiB peak (13.23 GiB with train.grad_accum=2). With
        # stop_flow_grad those activations have no backward consumers at
        # all, so remat defaults OFF on that path.
        # CPU CI skips it (no memory ceiling; remat doubles test wall time)
        model_cfg.setdefault(
            "remat",
            jax.default_backend() != "cpu" and not model_cfg["stop_flow_grad"])
        # Correlation lookup in training: with stop_flow_grad the lookup
        # sits in a gradient-dead region — no VJP is ever taken through it —
        # so the production Pallas kernels run as-is ("auto"). When RAFT
        # gradients are live (finite freeze_flow_steps), training
        # differentiates the lookup and pins the one-hot-matmul XLA
        # formulation: fully differentiable with the volume stored ONCE
        # outside the GRU scan (bf16), forward cost negligible against the
        # step. (The Pallas kernels' custom VJPs don't compose with
        # nn.remat's replay — Mosaic rejects the re-traced kernel — and
        # onthefly's backward would rebuild f32 volumes per iteration.)
        model_cfg.setdefault("lookup",
                             "auto" if model_cfg["stop_flow_grad"] else "xla")
        self.model = PoseNet(model_cfg)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.freeze_flow = freeze_flow
        self._train_cfg = config["train"]
        self.optimizer = None  # built on init_state

    # -- state ----------------------------------------------------------

    def init_state(self, rng: Array, variables: Optional[Dict] = None
                   ) -> TrainState:
        if variables is None:
            H, W = self.config["image_shape"]
            img = jnp.zeros((1, H, W, 3))
            K = jnp.eye(3)[None]
            bl = jnp.ones((1,))
            variables = self.model.init(rng, img, img, K, bl, img, img)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.optimizer = make_optimizer(self._train_cfg, params,
                                        self.freeze_flow)
        opt_state = self.optimizer.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    # -- steps ----------------------------------------------------------

    @staticmethod
    def _nhwc_batch(batch):
        """Datasets emit NCHW (reference tensor contract); the model is NHWC.
        One boundary transpose per step."""
        (img1, img2, img1r, img2r, mask1, mask2, gt_pose, K, bl) = batch
        t = lambda x: jnp.transpose(x, (0, 2, 3, 1))
        return (t(img1), t(img2), t(img1r), t(img2r), t(mask1), t(mask2),
                gt_pose, K, bl)

    def _loss_fn(self, params, batch_stats, batch, step):
        (img1, img2, img1r, img2r, mask1, mask2, gt_pose, K, bl) = (
            self._nhwc_batch(batch))
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = None
        if self.config["model"].get("dropout", 0.0) > 0.0:
            rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(1234),
                                                  step)}
        out, mutated = self.model.apply(
            variables, img1, img2, K, bl, img1r, img2r,
            mask1.astype(bool), mask2.astype(bool), train=True,
            mutable=["batch_stats"], rngs=rngs,
        )
        loss_pose = supervised_pose_loss(out.pose_tan, gt_pose)
        loss = jnp.mean(loss_pose)
        return loss, (loss_pose, mutated["batch_stats"])

    def make_train_step(self):
        """Jitted SPMD step: (state, batch) -> (state, metrics).

        ``train.grad_accum`` splits the global batch into that many
        microbatches inside a ``lax.scan``, summing gradients — the same
        update at a fraction of the activation memory. Measured on one v5e
        at the production shape (batch 8, 512x640, remat): accum=1 peaks at
        15.10 GiB, 250 MB under the HBM ceiling, and XLA's compressed-remat
        copies serialize the step to ~58 s; accum=2 drops the peak by ~2x
        and runs at full speed (scripts/bench_train_step.py). batch_stats
        chain through the microbatches sequentially (same values the
        reference's DataParallel BN would see per replica, just serial)."""
        mesh = self.mesh
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(DATA_AXIS))
        accum = int(self._train_cfg.get("grad_accum", 1))

        def grads_metrics(state, batch):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            if accum == 1:
                (_, (loss_pose, new_stats)), grads = grad_fn(
                    state.params, state.batch_stats, batch, state.step)
                return grads, new_stats, loss_pose
            micro = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum)
                                    + x.shape[1:]), batch)

            def body(carry, mb):
                stats, gsum = carry
                (_, (loss_pose, stats)), grads = grad_fn(
                    state.params, stats, mb, state.step)
                gsum = jax.tree.map(jnp.add, gsum, grads)
                return (stats, gsum), loss_pose

            gzero = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, gsum), loss_pose = jax.lax.scan(
                body, (state.batch_stats, gzero), micro)
            grads = jax.tree.map(lambda g: g / accum, gsum)
            # (accum, B/accum, 6) -> (B, 6): merge the microbatch axes only
            return grads, new_stats, loss_pose.reshape(
                (-1,) + loss_pose.shape[2:])

        def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
            grads, new_stats, loss_pose = grads_metrics(state, batch)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            metrics = loss_metrics(loss_pose, "train")
            metrics["train/grad_norm"] = optax.global_norm(grads)
            new_state = TrainState(params=params, batch_stats=new_stats,
                                   opt_state=opt_state, step=state.step + 1)
            return new_state, metrics

        batch_shardings = tuple([shard] * 9)
        return jax.jit(
            step,
            in_shardings=(rep, batch_shardings),
            out_shardings=(rep, rep),
        )

    def make_val_step(self):
        mesh = self.mesh
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(DATA_AXIS))

        def step(state: TrainState, batch) -> Dict:
            (img1, img2, img1r, img2r, mask1, mask2, gt_pose, K, bl) = (
                self._nhwc_batch(batch))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            out = self.model.apply(
                variables, img1, img2, K, bl, img1r, img2r,
                mask1.astype(bool), mask2.astype(bool), train=False,
            )
            loss_pose = supervised_pose_loss(out.pose_tan, gt_pose)
            m = loss_metrics(loss_pose, "val")
            m["val/loss"] = jnp.nanmean(loss_pose)
            return m

        return jax.jit(step, in_shardings=(rep, tuple([shard] * 9)),
                       out_shardings=rep)
