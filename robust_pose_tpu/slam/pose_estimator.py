"""Stateful per-frame SLAM tracker.

TPU-native rebuild of reference core/pose/pose_estimator.py:11-159. The
per-frame computation — RAFT flows, depth, weight maps, GN pose solve, failure
check, pose chaining and frame-state update — is ONE jitted step whose state
(last frame buffers + absolute pose) stays resident in HBM between frames;
the host loop only feeds camera images and reads back poses (the reference
instead drove LBFGS from Python and moved tensors per frame,
scripts/infer_trajectory.py:71-95).

Failure semantics preserved from reference pose_estimator.py:80-91: a solved
relative pose that is non-finite or with |log| > 0.1 is replaced by identity
and the frame is not fused.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robust_pose_tpu import se3
from robust_pose_tpu.models.posenet import PoseNet
from robust_pose_tpu.slam.frame import Frame, make_frame

Array = jax.Array


class PoseEstimator:
    """Frame-to-frame stereo camera pose estimator.

    :param config: SLAM config dict (keys: frame2frame, depth_clipping,
        conf_weighing, lbgfs_iters, dist_thr, average_pts — mirrors the
        reference configuration/infer_f2f.yaml)
    :param intrinsics: (3, 3) rectified camera intrinsics
    :param baseline: stereo baseline in pixels
    :param checkpoint: {'params': ..., 'config': {'model': ...}} dict (see
        utils/checkpoints.py); the stored model config is rewritten with the
        SLAM config's image_shape / solver iters / conf_weighing exactly like
        the reference (pose_estimator.py:26-29)
    :param img_shape: (width, height) — reference argument order
    :param init_pose: (7,) initial SE(3) vec
    """

    def __init__(self, config: dict, intrinsics, baseline: float,
                 checkpoint: dict, img_shape: Tuple[int, int],
                 init_pose: Optional[Array] = None):
        model_config = dict(checkpoint["config"]["model"])
        model_config["image_shape"] = (img_shape[1], img_shape[0])  # (H, W)
        model_config["lbgfs_iters"] = config["lbgfs_iters"]
        model_config["use_weights"] = config["conf_weighing"]
        self.config = config
        self.model_config = model_config
        self.model = PoseNet(model_config)
        self.variables = checkpoint["params"]

        self.intrinsics = jnp.asarray(intrinsics, jnp.float32)[None]
        self.scale = float(1.0 / config["depth_clipping"][1])
        self.baseline = jnp.asarray([baseline], jnp.float32)
        self.frame2frame = config.get("frame2frame", True)

        self.last_pose = (jnp.asarray(init_pose, jnp.float32)
                          if init_pose is not None else se3.identity((1,)))
        if self.last_pose.ndim == 1:
            self.last_pose = self.last_pose[None]
        self.last_frame: Optional[Frame] = None
        self.frame: Optional[Frame] = None
        self.scene = None
        self._feats = None  # reference-image encoder cache (f2f streaming)
        self._model_frame = None  # carried f2m reference rendering
        self.last_solver_iters = None  # realized LM iterations (diagnostic)

        self._jit_first = jax.jit(self._first_step)
        self._jit_step = jax.jit(self._track_step)
        self._f2m_steps = {}    # SurfelConfig -> jitted fused f2m step
        self._f2m_windows = {}  # SurfelConfig -> jitted f2m window scan
        self._jit_windows = {}  # diag -> jitted f2f window (built lazily)

    # ------------------------------------------------------------------
    # jitted step functions
    # ------------------------------------------------------------------

    def _rel_check(self, rel):
        """Failure detection + depth-scale de-normalization (reference
        pose_estimator.py:81-87), shared by the per-frame, f2m and windowed
        paths: a non-finite or |log| > 0.1 relative pose becomes identity.

        :param rel: (B, 7) solved relative poses in normalized-depth space
        :return: (rel (B, 7) in world depth units, success (B,) bool)
        """
        bad = (jnp.any(~jnp.isfinite(rel), axis=-1)
               | jnp.any(jnp.abs(se3.log(rel)) > 0.1, axis=-1))
        rel = jnp.where(bad[:, None], se3.identity((rel.shape[0],)), rel)
        return se3.scale(rel, 1.0 / self.scale), ~bad

    def _first_step(self, variables, limg, rimg, mask):
        """First frame: stereo depth + the reference-feature cache for the
        next tracking step (reference pose_estimator.py:103-110)."""
        depth, valid, stereo_flow = self.model.apply(
            variables, limg, rimg, self.baseline * self.scale,
            method=PoseNet.flow2depth,
        )
        feats = self.model.apply(variables, limg, method=PoseNet.encode_ref)
        frame = make_frame(limg, rimg, depth=depth / self.scale, mask=mask,
                           flow=stereo_flow)
        return frame, valid, feats

    def _track_step(self, variables, last_pose, last: Frame, limg, rimg, mask,
                    feats=None):
        """One tracking step; everything on device (reference
        pose_estimator.py:50-96 + pose_net.py:60-85 fused). ``feats`` is the
        reference image's cached encoder features (f2f streaming only — the
        f2m reference is a fresh surfel rendering every frame)."""
        out = self.model.apply(
            variables,
            last.img, limg, self.intrinsics, self.baseline * self.scale,
            last.depth * self.scale, rimg, last.mask, mask, last.flow,
            method=PoseNet.infer, feats=feats,
        )
        rel, success = self._rel_check(out.pose)
        new_pose = se3.normalize(se3.mul(last_pose, se3.inv(rel)))

        frame = make_frame(limg, rimg, depth=out.depth2 / self.scale,
                           mask=mask, flow=out.stereo_flow2)
        return new_pose, frame, out, success[0]

    def _f2m_body(self, cfg):
        """Raw fused frame-to-model step: track against the CARRIED model
        frame, then fuse + render-the-next-reference in ONE pool pass
        (the reference composes transform_cpy + render + infer + fuse with
        a host sync between each — pose_estimator.py:127-144).

        Consumes the frame's :meth:`PoseNet.f2m_precompute` slice (``pre``):
        the map-independent work — input-frame encoders and the whole
        stereo branch — is hoisted out so the step itself only encodes the
        rendered reference and runs the single temporal GRU problem
        (PoseNet.f2m_track; f32-exact vs PoseNet.infer, see
        tests/test_models.py::test_posenet_f2m_split_matches_infer).

        The model frame rides the carry: the render the reference performs
        at the START of step t+1 (extrinsics inv(last_pose), i.e. the pose
        solved at step t) is exactly computable at the END of step t — and
        with ``average_pts`` off it shares the fuse's own full-pool
        projection (``surfel_fuse_render``). On a failed frame the pool and
        pose are unchanged, so the carried rendering is reused outright.
        Built per surfel-capacity bucket (cfg is closed over)."""
        from robust_pose_tpu.slam.surfel_map import (
            surfel_fuse,
            surfel_fuse_render,
            surfel_render,
        )

        kmat = self.intrinsics[0]
        merged = (not cfg.average_pts) and cfg.upscale == 1

        def step(variables, last_pose, state, model_frame, limg, rimg, mask,
                 pre):
            f_l, n_l, i_l, sf2, d2, m2 = pre
            out = self.model.apply(
                variables, model_frame.img, model_frame.depth * self.scale,
                model_frame.mask, jnp.zeros_like(model_frame.flow), limg,
                m2, self.intrinsics, f_l, n_l, i_l, sf2, d2,
                method=PoseNet.f2m_track)
            rel, ok = self._rel_check(out.pose)
            success = ok[0]
            new_pose = se3.normalize(se3.mul(last_pose, se3.inv(rel)))
            frame = make_frame(limg, rimg, depth=d2 / self.scale, mask=mask,
                               flow=sf2)
            if merged:
                new_state, new_mf = jax.lax.cond(
                    success,
                    lambda s, mf: surfel_fuse_render(
                        s, frame, new_pose[0], kmat, cfg),
                    lambda s, mf: (s, mf),
                    state, model_frame,
                )
            else:
                new_state = jax.lax.cond(
                    success,
                    lambda s: surfel_fuse(s, frame, new_pose[0], kmat, cfg),
                    lambda s: s,
                    state,
                )
                new_mf = surfel_render(
                    new_state, kmat, cfg, extrinsics=se3.inv(new_pose[0]))
            return (new_pose, frame, out, success, new_state, new_mf,
                    model_frame)

        return step

    def _get_f2m_step(self, cfg):
        if cfg not in self._f2m_steps:
            body = self._f2m_body(cfg)

            def full(variables, last_pose, state, model_frame, limg, rimg,
                     mask):
                pre = self.model.apply(
                    variables, limg, rimg, mask,
                    self.baseline * self.scale,
                    method=PoseNet.f2m_precompute)
                return body(variables, last_pose, state, model_frame, limg,
                            rimg, mask, pre)

            self._f2m_steps[cfg] = jax.jit(full)
        return self._f2m_steps[cfg]

    def _get_f2m_window(self, cfg, diag=False):
        """Jitted f2m window: the map-independent work (input-frame encoders,
        stereo flow -> depth) runs BATCHED over all T frames up front
        (PoseNet.f2m_precompute); the lax.scan keeps only what truly depends
        on the fused map — rendered-reference encode, temporal GRU, solve,
        fuse+render — with (pose, surfel state, model frame) as carries.
        Identical math to the per-frame f2m step (equivalence-tested).
        With ``diag`` the scan additionally stacks per-frame flow/confidence
        maps as outputs (viewer/logger data; dead-code-eliminated otherwise).
        """
        key = (cfg, diag)
        if key not in self._f2m_windows:
            body = self._f2m_body(cfg)

            def window(variables, last_pose, state, model_frame,
                       limgs, rimgs, masks):
                pre = self.model.apply(
                    variables, limgs[:, 0], rimgs[:, 0], masks[:, 0],
                    self.baseline * self.scale,
                    method=PoseNet.f2m_precompute)
                fl, net_l, inp_l, sflow2, depth2, mask2 = pre

                def scan_body(carry, fr):
                    pose, st, mf = carry
                    limg, rimg, mask = fr[:3]
                    new_pose, frame, out, success, st2, mf2, _ = body(
                        variables, pose, st, mf, limg, rimg, mask, fr[3:])
                    ys = (new_pose, success, out.solver_iters)
                    if diag:
                        # f16: viewer/logger payload, fetched to host
                        ys += ((out.flow[0].astype(jnp.float16),
                                out.conf1[0].astype(jnp.float16),
                                out.conf2[0].astype(jnp.float16)),)
                    return (new_pose, st2, mf2), ys

                (pose, st, mf), ys = jax.lax.scan(
                    scan_body, (last_pose, state, model_frame),
                    (limgs, rimgs, masks, fl[:, None], net_l[:, None],
                     inp_l[:, None], sflow2[:, None], depth2[:, None],
                     mask2[:, None]))
                poses, succ, niter = ys[:3]
                # the final frame state is map-independent — built from the
                # batched pre-pass, not materialized per scan step
                frame = make_frame(limgs[-1], rimgs[-1],
                                   depth=depth2[-1:] / self.scale,
                                   mask=masks[-1], flow=sflow2[-1:])
                out = (pose, st, frame, mf, poses, succ, niter)
                if diag:
                    flow, conf1, conf2 = ys[3]
                    out += ({"flow": flow, "conf1": conf1, "conf2": conf2,
                             "depth": (depth2 / self.scale
                                       ).astype(jnp.float16)},)
                return out

            self._f2m_windows[key] = jax.jit(window)
        return self._f2m_windows[key]

    def _window_step(self, variables, last_pose, frame, feats, limgs, rimgs,
                     masks):
        """Track T frames in ONE compiled dispatch (f2f).

        The only sequential dependency in frame-to-frame tracking is the
        pose chain (frame t's reference is always frame t-1, success or
        not — reference pose_estimator.py:62-63 resets ``last_frame`` from
        ``frame`` unconditionally), so the whole window runs as one
        batch-2T RAFT pass + a batch-T solve (PoseNet.infer_window); only
        the (T, 7) failure-checked pose compose is a scan. Identical math
        to the per-frame step, far better MXU utilization."""
        out = self.model.apply(
            variables, limgs[:, 0], rimgs[:, 0], masks[:, 0],
            self.intrinsics, self.baseline * self.scale,
            frame.img, frame.depth * self.scale, frame.mask, frame.flow,
            feats, method=PoseNet.infer_window)

        rel, success = self._rel_check(out.pose)  # (T, 7), (T,)

        def chain(pose, r):
            new = se3.normalize(se3.mul(pose, se3.inv(r[None])))
            return new, new

        pose, poses = jax.lax.scan(chain, last_pose, rel)

        fr_state = make_frame(
            limgs[-1], rimgs[-1], depth=out.depth2[-1:] / self.scale,
            mask=masks[-1], flow=out.stereo_flow2[-1:])
        # per-frame diagnostics for viewers/loggers: already computed by the
        # batched window pass, materialized as outputs only in diag mode.
        # f16: display/logging data whose consumer is a host fetch — halves
        # the device->host bytes (the fetch dominates viewer-attached FPS on
        # bandwidth-limited links; see BASELINE.md)
        diag = {"flow": out.flow.astype(jnp.float16),
                "conf1": out.conf1.astype(jnp.float16),
                "conf2": out.conf2.astype(jnp.float16),
                "depth": (out.depth2 / self.scale).astype(jnp.float16)}
        return (pose, fr_state, out.feats, poses, success, out.solver_iters,
                diag)

    def track_window(self, limgs, rimgs, masks, diagnostics=False):
        """Track a window of frames in one dispatch (streaming mode).

        :param limgs/rimgs: (T, 1, 3, H, W) or (T, 1, H, W, 3) stereo frames
        :param masks: (T, 1, 1, H, W) or (T, 1, 1, H, W) or (T, 1, H, W, 1)
        :param diagnostics: also return the per-frame viewer/logger data the
            window pass computes anyway — dict of ``flow`` (T, H, W, 2),
            ``conf1``/``conf2``/``depth`` (T, H, W, 1), all device arrays
            in float16 (display/logging payload: half the fetch bytes; ONE
            bulk readback beats T per-frame syncs on a remote chip)
        :return: (poses (T, 1, 7) absolute SE(3) vecs, successes (T,) bool
            [, diagnostics dict])
        Requires the first frame to have been processed via ``__call__``.
        Works for both f2f (frame state + feature cache as scan carries) and
        f2m (surfel map as a scan carry; render+track+fuse per scan step).
        """
        assert self.frame is not None, "process the first frame via __call__"
        limgs = jnp.asarray(limgs, jnp.float32)
        rimgs = jnp.asarray(rimgs, jnp.float32)
        masks = jnp.asarray(masks, bool)
        if limgs.shape[-1] not in (1, 3):  # NCHW -> NHWC
            limgs = limgs.transpose(0, 1, 3, 4, 2)
            rimgs = rimgs.transpose(0, 1, 3, 4, 2)
        if masks.shape[-1] != 1:
            masks = masks.transpose(0, 1, 3, 4, 2)
        if not self.frame2frame:
            return self._track_window_f2m(limgs, rimgs, masks, diagnostics)
        if diagnostics not in self._jit_windows:
            step = self._window_step
            if diagnostics:
                fn = step
            else:  # drop the diag outputs BEFORE jit so XLA DCEs the work
                def fn(*a):
                    return step(*a)[:-1]
            self._jit_windows[diagnostics] = jax.jit(fn)
        res = self._jit_windows[diagnostics](
            self.variables, self.last_pose, self.frame, self._feats,
            limgs, rimgs, masks)
        (self.last_pose, self.frame, self._feats, poses, succ,
         self.last_solver_iters) = res[:6]
        self.last_frame = self.frame
        self.success = succ[-1]
        if diagnostics:
            return poses, succ, res[6]
        return poses, succ

    def _track_window_f2m(self, limgs, rimgs, masks, diagnostics=False):
        """f2m windowed streaming with bucket maintenance: if the surfel pool
        overflowed its capacity bucket mid-window, grow it and re-run the
        (pure) window from the pre-window carries — lossless, exact."""
        pre_mf = self._model_frame_f2m()
        pre_pose, pre_state = self.last_pose, self.scene.state
        result = {}

        def run(state, cfg):
            win = self._get_f2m_window(cfg, diagnostics)
            (pose, st, frame, mf, poses, succ, niter,
             *diag) = win(self.variables, pre_pose, state, pre_mf, limgs,
                          rimgs, masks)
            self.last_pose, self.frame = pose, frame
            self._model_frame = mf
            result["poses"], result["succ"] = poses, succ
            if diag:
                result["diag"] = diag[0]
            self.last_solver_iters = niter
            return st

        self.scene.state = run(self.scene.state, self.scene.cfg)
        self.scene.post_fuse(pre_state, run, frames=limgs.shape[0])
        self.last_frame = self.frame
        self.success = result["succ"][-1]
        if diagnostics:
            return result["poses"], result["succ"], result["diag"]
        return result["poses"], result["succ"]

    def _model_frame_f2m(self):
        """The f2m reference rendering for the NEXT tracking step (carried
        across steps; rendered fresh only when no carry exists yet — i.e.
        right after scene init — or after pool maintenance invalidated it)."""
        from robust_pose_tpu.slam.surfel_map import surfel_render

        if self._model_frame is None:
            render = jax.jit(surfel_render, static_argnums=2)
            self._model_frame = render(
                self.scene.state, self.intrinsics[0], self.scene.cfg,
                se3.inv(self.last_pose[0]))
        return self._model_frame

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------

    def _init_scene(self, frame: Frame):
        """Initialize the surfel map from the first frame
        (reference pose_estimator.py:68-77)."""
        from robust_pose_tpu.slam.surfel_map import SurfelMap

        self.scene = SurfelMap(
            frame, jnp.asarray(self.intrinsics[0]),
            config={"dist_thr": self.config.get("dist_thr", 0.05),
                    "average_pts": self.config.get("average_pts", True),
                    # perf-critical f2m path: single-pass packed winner by
                    # default (ties at 2^-conf_bits granularity resolve by
                    # slot id — the reference's own tie order is arbitrary).
                    # MEASURED trade (scripts/ab_exact_render.py, one v5e,
                    # 16-frame synthetic f2m sequence at lbgfs_iters=100):
                    # pose trajectories IDENTICAL between modes (max pose-vec
                    # delta 0.0, ATE-RMSE between modes 0.0) while exact mode
                    # runs 4.6 vs 12.0 FPS — the approximation is free.
                    "exact_render": self.config.get("exact_render", False),
                    # winner primitive: the double-sort segment pipeline by
                    # default — bit-identical to the scatter-max (test-
                    # asserted) but ~2.2x its throughput on v5e, where
                    # duplicate-combining scatters serialize per update row
                    # (covered 11.0 -> 3.7 ms, winner 11.8 -> 5.5 ms at the
                    # production 1.6M-row pool, scripts/
                    # profile_winner_prims.py; f2m 13.48 -> 18.41 FPS in the
                    # round-5 driver-style bench.py capture)
                    "winner": self.config.get("winner", "segsort"),
                    "initial_bucket": self.config.get("initial_bucket"),
                    "upscale": self.config.get("upscale", 1)},
            pmat=self.last_pose[0],
            # slot-pool bound: every fuse/render pass scales with capacity,
            # not the live surfel count — tune per sequence length
            capacity=self.config.get("map_capacity"),
        )

    def __call__(self, limg, rimg, mask):
        """Estimate the absolute camera pose for a new stereo frame.

        :param limg/rimg: (1, 3, H, W) rectified images in [0, 255]
            (reference NCHW contract; NHWC (1, H, W, 3) is also accepted and
            skips the boundary transpose)
        :param mask: (1, 1, H, W) or (1, H, W, 1) valid mask
        :return: (abs_pose (1,7), scene, flow (1,H,W,2),
            (conf1, conf2) (1,H,W,1)) — mirrors reference
            pose_estimator.forward with NHWC outputs
        """
        limg = jnp.asarray(limg, jnp.float32)
        rimg = jnp.asarray(rimg, jnp.float32)
        mask = jnp.asarray(mask, bool)
        if limg.shape[-1] not in (1, 3):  # NCHW -> NHWC at the API boundary
            limg = limg.transpose(0, 2, 3, 1)
            rimg = rimg.transpose(0, 2, 3, 1)
        if mask.shape[-1] != 1:
            mask = mask.transpose(0, 2, 3, 1)

        if self.last_frame is None and self.frame is None:
            self.frame, valid, self._feats = self._jit_first(
                self.variables, limg, rimg, mask)
            self.last_frame = None
            self.success = True
            if not self.frame2frame:
                # scene init also rejects invalid-depth pixels
                # (reference pose_estimator.py:73)
                self._init_scene(self.frame.replace(mask=self.frame.mask & valid))
            return self.last_pose, self.scene, None, None

        self.last_frame = self.frame
        if self.frame2frame:
            new_pose, frame, out, success = self._jit_step(
                self.variables, self.last_pose, self.frame, limg, rimg, mask,
                self._feats,
            )
            self._feats = out.feats
            if self.scene is not None and bool(success):
                self.scene.fuse(frame, new_pose[0])
        else:
            # frame-to-model (reference pose_estimator.py:127-144
            # ``get_pose_f2m``): track against the carried reference
            # rendering, fuse on success and render the NEXT reference in
            # the same dispatch — no per-frame host sync
            step = self._get_f2m_step(self.scene.cfg)
            prev_state = self.scene.state
            prev_mf = self._model_frame_f2m()
            (new_pose, frame, out, success, new_state, new_mf,
             model_frame) = step(
                self.variables, self.last_pose, self.scene.state, prev_mf,
                limg, rimg, mask,
            )
            self.scene.state = new_state
            self._model_frame = new_mf

            # bucket maintenance (pose is solved BEFORE the fuse, so an
            # overflow redo only needs the fuse + next-reference render
            # re-run)
            def _redo(st, cfg):
                from robust_pose_tpu.slam.surfel_map import surfel_fuse_render
                merged = (not cfg.average_pts) and cfg.upscale == 1
                if merged:
                    st2, mf2 = jax.jit(
                        surfel_fuse_render, static_argnums=4)(
                        st, frame, new_pose[0], self.scene.kmat, cfg)
                else:
                    st2 = self.scene._fuse(
                        st, frame, new_pose[0], self.scene.kmat, cfg)
                    mf2 = self.scene._render(
                        st2, self.scene.kmat, cfg, se3.inv(new_pose[0]))
                self._model_frame = mf2
                return st2

            self.scene.post_fuse(prev_state, _redo)
            # keep the rendered model frame inspectable with its confidences
            self.last_frame = model_frame.replace(
                rimg=self.frame.rimg, confidence=out.conf1)

        self.last_pose = new_pose
        self.frame = frame
        self.success = success
        self.last_solver_iters = out.solver_iters
        return self.last_pose, self.scene, out.flow, (out.conf1, out.conf2)

    def get_last_frame(self):
        return self.last_frame

    def get_frame(self):
        return self.frame

    @property
    def pose_numpy(self) -> np.ndarray:
        return np.asarray(self.last_pose[0])
