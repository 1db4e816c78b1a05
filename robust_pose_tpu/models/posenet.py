"""PoseNet: RAFT flow + TinyUNet confidence heads + differentiable GN pose solve.

TPU-native rebuild of reference core/pose/pose_net.py:13-164. The entire
inference path — stereo flow -> depth -> point clouds -> flow warp -> weight
maps -> Gauss-Newton pose solve — is one jittable function with no host
round-trips (the BASELINE.json north-star restructuring).

All tensors are NHWC end-to-end (TPU-native layout; images in [0, 255]) —
NCHW exists only at the reference-parity API boundary (PoseEstimator).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from robust_pose_tpu.models.raft import CDIM, HDIM, RAFT
from robust_pose_tpu.models.unet import TinyUNet
from robust_pose_tpu.ops.geometry import create_img_coords, depth_to_pcl
from robust_pose_tpu.ops.warp import remap_from_flow, remap_from_flow_nearest
from robust_pose_tpu.solver.gauss_newton import SolverConfig, make_pose_layer
from robust_pose_tpu.solver.objectives import PoseProblemInputs

Array = jax.Array


def _resize_eighth(x: Array) -> Array:
    """F.interpolate(scale_factor=0.125, mode='bilinear') analogue
    (reference core/pose/pose_net.py:110-113). NHWC.

    The half-pixel-centers 1/8 bilinear downsample reads only rows/cols
    {8i+3, 8i+4} with 0.5/0.5 weights (see ops/warp.warp_then_eighth), so it
    is computed by its exact tap decomposition — 1/16 of the input bytes vs
    a generic resize."""
    from robust_pose_tpu.ops.warp import eighth_from_fullres_warp

    return eighth_from_fullres_warp(x)


class PoseNetOutputs(NamedTuple):
    pose: Array          # (B, 7) SE(3) vec (inference) — reference returns SE3
    pose_tan: Array      # (B, 6) tangent (training target space)
    depth1: Array        # (B, H, W, 1)
    depth2: Array        # (B, H, W, 1)
    conf1: Array         # (B, H, W, 1) 2D confidence
    conf2: Array         # (B, H, W, 1) 3D confidence
    flow: Array          # (B, H, W, 2) temporal flow
    stereo_flow2: Array  # (B, H, W, 2)
    feats: Any = None    # (fmap, net, inp) of image2l — feed as ``feats`` of
    # the NEXT infer call (frame t's reference == frame t-1's image) to skip
    # re-encoding the reference image in the streaming loop
    solver_iters: Any = None  # (B,) int32 realized LM iterations (diagnostic)


class PoseNet(nn.Module):
    """config keys mirror the reference checkpoint config
    (reference core/pose/pose_net.py:14-27): image_shape (H, W), iters,
    lbgfs_iters (solver iterations), use_weights."""

    config: Any

    def setup(self):
        H, W = self.config["image_shape"]
        mp = self.config.get("mixed_precision", True)
        self.flow_net = RAFT(
            iters=self.config.get("iters", 12),
            dtype=jnp.bfloat16 if mp else jnp.float32,
            corr_dtype=jnp.bfloat16 if mp else jnp.float32,
            small=self.config.get("small", False),
            dropout=self.config.get("dropout", 0.0),
            lookup=self.config.get("lookup", "auto"),
            remat=self.config.get("remat", False),
            remat_policy=self.config.get("remat_policy", "nothing"),
            name="flow",
        )
        compute_dtype = (jnp.bfloat16 if self.config.get("mixed_precision", True)
                         else jnp.float32)
        unet_levels = self.config.get("unet_levels", 3)
        self.weight_head_2d = TinyUNet(
            in_channels=HDIM + CDIM + 8, output_size=(H, W),
            dtype=compute_dtype, levels=unet_levels, name="weight_head_2d"
        )
        self.weight_head_3d = TinyUNet(
            in_channels=HDIM + CDIM + 8 + 8, output_size=(H, W),
            dtype=compute_dtype, levels=unet_levels, name="weight_head_3d"
        )
        self.loss_weight = self.param(
            "loss_weight", lambda k: jnp.ones((2,), jnp.float32)
        )
        self._img_coords = create_img_coords(H, W)
        self._pose_layer = make_pose_layer(
            self._img_coords,
            SolverConfig(
                iters=self.config.get("lbgfs_iters", 20),
                # benchmark floor switch: False runs every LM iteration to
                # the cap (no data-dependent early exit)
                early_exit=self.config.get("solver_early_exit", True),
            ),
        )

    # ------------------------------------------------------------------
    # building blocks
    # ------------------------------------------------------------------

    def run_flow(self, img1: Array, img2: Array, train: bool = False):
        """RAFT pass; returns (flow (B,H,W,2), hidden (B,H/8,W/8,128),
        context (B,H/8,W/8,128))."""
        return self.flow_net(img1, img2, train)

    def flow2depth(self, imagel: Array, imager: Array, baseline: Array):
        """Stereo flow -> normalized depth (reference pose_net.py:127-135).

        depth = baseline / -flow_x, valid iff 0 < depth <= 1 (depth is
        normalized by the depth cutoff; baseline is pre-scaled accordingly).
        """
        flow, _, _ = self.run_flow(imagel, imager)
        return self.disparity_to_depth(flow, baseline) + (flow,)

    @staticmethod
    def disparity_to_depth(stereo_flow: Array, baseline: Array):
        depth = baseline[:, None, None] / -stereo_flow[..., 0]
        valid = (depth > 0) & (depth <= 1.0)
        depth = jnp.where(valid, depth, 1.0)
        return depth[..., None], valid[..., None]

    def get_weight_maps(self, pcl1, depth2, intrinsics, image1l, image2l,
                        mask2, time_flow, stereo_flow1, stereo_flow2, hidden,
                        context, train: bool = False):
        """Warp frame-2 quantities into frame-1 correspondence and predict
        2D/3D confidence maps (reference pose_net.py:102-119).

        TPU warp cost is gather-bytes-bound, so only what the solver consumes
        at full resolution is warped densely — and that warp fetches ONE
        packed channel: rays are affine in pixel coords, so the bilinear
        point-cloud warp reduces exactly to depth-moment sums with the
        nearest-sampled mask riding in the depth mantissa LSB
        (ops/warp.warp_pcl_mask; frame 2's cloud is never materialized at
        full res). The image/stereo-flow channels are consumed exclusively
        through the 1/8 bilinear downsample, whose taps touch just rows/cols
        {8i+3, 8i+4} — their warp runs at 1/16 of the samples
        (ops/warp.warp_then_eighth, exact)."""
        from robust_pose_tpu.ops.warp import (
            eighth_from_fullres_warp,
            warp_pcl_mask,
            warp_then_eighth,
        )

        pcl2_w, mask2 = warp_pcl_mask(depth2, mask2, time_flow, intrinsics)
        pcl2 = pcl2_w

        if self.config.get("use_weights", True):
            inp1 = _resize_eighth(
                jnp.concatenate([stereo_flow1, image1l, pcl1], axis=-1)
            )
            five_c = warp_then_eighth(
                jnp.concatenate([stereo_flow2, image2l], axis=-1), time_flow
            )
            inp2 = jnp.concatenate(
                [five_c, eighth_from_fullres_warp(pcl2_w)], axis=-1
            )
            feat = jnp.concatenate([inp1, hidden, context], axis=-1)
            conf1 = nn.sigmoid(self.weight_head_2d(feat, train))
            feat3 = jnp.concatenate([inp1, inp2, hidden, context], axis=-1)
            conf2 = nn.sigmoid(self.weight_head_3d(feat3, train))
        else:
            conf1 = jnp.ones_like(mask2, dtype=jnp.float32)
            conf2 = jnp.ones_like(mask2, dtype=jnp.float32)
        return conf1, conf2, pcl2, mask2

    def _solve(self, time_flow, pcl1, pcl2, conf1, conf2, mask1, mask2,
               intrinsics) -> Tuple[Array, Array, Array]:
        b = time_flow.shape[0]
        lw = jnp.broadcast_to(self.loss_weight[None], (b, 2))
        xs = PoseProblemInputs(
            flow=time_flow, pcl1=pcl1, pcl2=pcl2, weights1=conf1, weights2=conf2,
            mask1=mask1, mask2=mask2, intrinsics=intrinsics, loss_weight=lw,
        )
        return self._pose_layer(xs)  # (pose7, tau6, realized LM iters)

    # ------------------------------------------------------------------
    # inference path (reference pose_net.py:60-85)
    # ------------------------------------------------------------------

    def encode_ref(self, image):
        """Encode a reference image's (fmap, net, inp) — the ``feats`` cache
        seed for the first streaming step."""
        fmap = self.flow_net.encode_fnet(image)
        net, inp = self.flow_net.encode_cnet(image)
        return fmap, net, inp

    def infer(self, image1l, image2l, intrinsics, baseline, depth1, image2r,
              mask1, mask2, stereo_flow1, feats=None) -> PoseNetOutputs:
        """Single fused step: temporal + stereo flow batched through one RAFT
        pass (reference pose_net.py:62-69), depth, weight maps, GN solve.

        The pairs (img1,img2),(img2,img2r) share img2, so the encoders run
        only on UNIQUE images; with ``feats`` (the previous step's cached
        ``out.feats`` — frame t's reference IS frame t-1's image) img1 is
        not re-encoded at all: fnet batch 2, cnet batch 1 per frame."""
        b = image1l.shape[0]
        if feats is None:
            enc = self.flow_net.encode_fnet(
                jnp.concatenate([image1l, image2l, image2r], axis=0))
            f1l, f2l, f2r = enc[:b], enc[b:2 * b], enc[2 * b:]
            net_u, inp_u = self.flow_net.encode_cnet(
                jnp.concatenate([image1l, image2l], axis=0))
            net1l, net2l = net_u[:b], net_u[b:]
            inp1l, inp2l = inp_u[:b], inp_u[b:]
        else:
            f1l, net1l, inp1l = feats
            enc = self.flow_net.encode_fnet(
                jnp.concatenate([image2l, image2r], axis=0))
            f2l, f2r = enc[:b], enc[b:]
            net2l, inp2l = self.flow_net.encode_cnet(image2l)

        flows, hidden, context = self.flow_net.flow_from_features(
            jnp.concatenate([f1l, f2l], axis=0),
            jnp.concatenate([f2l, f2r], axis=0),
            jnp.concatenate([net1l, net2l], axis=0),
            jnp.concatenate([inp1l, inp2l], axis=0),
        )
        feats_out = (f2l, net2l, inp2l)
        time_flow, stereo_flow2 = flows[:b], flows[b:]
        hidden, context = hidden[:b], context[:b]

        depth2, valid2 = self.disparity_to_depth(stereo_flow2, baseline)
        mask2 = mask2 & valid2
        pcl1 = depth_to_pcl(depth1, intrinsics, self._img_coords)

        conf1, conf2, pcl2, mask2 = self.get_weight_maps(
            pcl1, depth2, intrinsics, image1l, image2l, mask2, time_flow,
            stereo_flow1, stereo_flow2, hidden, context,
        )
        pose, pose_tan, niter = self._solve(
            time_flow, pcl1, pcl2, conf1, conf2, mask1, mask2, intrinsics
        )
        return PoseNetOutputs(pose, pose_tan, depth1, depth2, conf1, conf2,
                              time_flow, stereo_flow2, feats_out, niter)

    def infer_window(self, limgs, rimgs, masks, intrinsics, baseline,
                     prev_img, prev_depth1, prev_mask, prev_stereo_flow,
                     feats) -> "PoseNetOutputs":
        """Fused inference over a WINDOW of T frames in one batched pass.

        Frame-to-frame tracking has only one true sequential dependency —
        the pose chain, a (T, 7) compose the caller performs afterwards.
        The temporal flow (t-1 -> t) and stereo flow (t, t) depend on the
        images alone, so the whole window runs as ONE RAFT pass at batch 2T
        (encoders batched over the 2T unique images, a single 12-iteration
        GRU scan) instead of T sequential batch-2 steps — identical math
        (instance norm is per-sample; cnet BatchNorm runs on running stats),
        far better MXU utilization at the 1/8-scale feature shape.

        :param limgs/rimgs: (T, H, W, 3) window frames
        :param masks: (T, H, W, 1) bool
        :param prev_*: the carried reference-frame state (frame t-1 of the
            first window element): image (1, H, W, 3), depth1 (1, H, W, 1)
            ALREADY depth-scale-normalized, mask (1, H, W, 1),
            stereo flow (1, H, W, 2)
        :param feats: (fmap, net, inp) encoder cache of ``prev_img``
        :return: PoseNetOutputs with leading dim T (pose (T, 7), depth2
            (T, H, W, 1), ...); ``feats`` holds the LAST frame's cache
        """
        t = limgs.shape[0]
        enc = self.flow_net.encode_fnet(
            jnp.concatenate([limgs, rimgs], axis=0))
        fl, fr = enc[:t], enc[t:]
        net_u, inp_u = self.flow_net.encode_cnet(limgs)
        pf, pnet, pinp = feats

        # problem batch: T temporal pairs then T stereo pairs
        fmap1 = jnp.concatenate([pf, fl[:-1], fl], axis=0)
        fmap2 = jnp.concatenate([fl, fr], axis=0)
        net0 = jnp.concatenate([pnet, net_u[:-1], net_u], axis=0)
        inp0 = jnp.concatenate([pinp, inp_u[:-1], inp_u], axis=0)
        flows, hidden, context = self.flow_net.flow_from_features(
            fmap1, fmap2, net0, inp0)
        time_flow, stereo_flow2 = flows[:t], flows[t:]
        hidden, context = hidden[:t], context[:t]

        bl = jnp.broadcast_to(baseline, (t,))
        depth2, valid2 = self.disparity_to_depth(stereo_flow2, bl)
        mask2 = masks & valid2

        # per-problem reference quantities: frame t-1's (image, depth, mask,
        # stereo flow) — the window inputs shifted by one, seeded by carry
        image1l = jnp.concatenate([prev_img, limgs[:-1]], axis=0)
        depth1 = jnp.concatenate([prev_depth1, depth2[:-1]], axis=0)
        # the carried frame state stores the RAW input mask (reference
        # get_pose_f2f updates depth/flow but not the mask)
        mask1 = jnp.concatenate([prev_mask, masks[:-1]], axis=0)
        stereo_flow1 = jnp.concatenate([prev_stereo_flow, stereo_flow2[:-1]],
                                       axis=0)

        K = jnp.broadcast_to(intrinsics, (t,) + intrinsics.shape[-2:])
        pcl1 = depth_to_pcl(depth1, K, self._img_coords)

        conf1, conf2, pcl2_w, mask2_w = self.get_weight_maps(
            pcl1, depth2, K, image1l, limgs, mask2, time_flow,
            stereo_flow1, stereo_flow2, hidden, context,
        )
        pose, pose_tan, niter = self._solve(
            time_flow, pcl1, pcl2_w, conf1, conf2, mask1, mask2_w, K
        )
        feats_out = (fl[-1:], net_u[-1:], inp_u[-1:])
        return PoseNetOutputs(pose, pose_tan, depth1, depth2, conf1, conf2,
                              time_flow, stereo_flow2, feats_out, niter)

    # ------------------------------------------------------------------
    # frame-to-model split (reference pose_net.py:60-85 semantics)
    # ------------------------------------------------------------------

    def f2m_precompute(self, limgs, rimgs, masks, baseline):
        """Batched MAP-INDEPENDENT pre-pass for frame-to-model tracking.

        In f2m (reference pose_estimator.py:127-144) frame t's reference is
        a rendering of the fused map — truly sequential. But the stereo
        branch (stereo flow -> depth -> validity) and the input frame's own
        encoder features depend only on the camera images, so they run for
        the whole window as ONE batched pass; the sequential scan keeps only
        the rendered-reference encode + temporal GRU + solve + fuse.

        :param limgs/rimgs: (T, H, W, 3); masks (T, H, W, 1) bool
        :param baseline: (1,) pre-scaled stereo baseline
        :return: (fmap_l, net_l, inp_l, stereo_flow2, depth2, mask2) with
            leading dim T; depth2 normalized, mask2 = masks & stereo-valid
        """
        t = limgs.shape[0]
        enc = self.flow_net.encode_fnet(
            jnp.concatenate([limgs, rimgs], axis=0))
        fl, fr = enc[:t], enc[t:]
        net_u, inp_u = self.flow_net.encode_cnet(limgs)
        stereo_flow2, _, _ = self.flow_net.flow_from_features(
            fl, fr, net_u, inp_u)
        bl = jnp.broadcast_to(baseline, (t,))
        depth2, valid2 = self.disparity_to_depth(stereo_flow2, bl)
        return fl, net_u, inp_u, stereo_flow2, depth2, masks & valid2

    def f2m_track(self, ref_img, ref_depth1, ref_mask, ref_sflow1, limg,
                  mask2, intrinsics, fmap_l, net_l, inp_l, stereo_flow2,
                  depth2) -> "PoseNetOutputs":
        """Sequential f2m tracking step against a rendered reference.

        Consumes the per-frame slice of :meth:`f2m_precompute`; per step
        only the reference rendering is encoded (fnet+cnet batch 1) and the
        GRU runs the single temporal problem — identical math to
        :meth:`infer` on (reference, frame) with the stereo quantities
        precomputed.

        :param ref_*: rendered model frame: image (1,H,W,3), depth1
            (1,H,W,1) ALREADY depth-scale-normalized, mask (1,H,W,1),
            stereo flow (zeros for a rendering — reference pose_net.py:75)
        :param mask2/fmap_l/...: this frame's f2m_precompute slice (lead 1)
        """
        f1 = self.flow_net.encode_fnet(ref_img)
        net1, inp1 = self.flow_net.encode_cnet(ref_img)
        time_flow, hidden, context = self.flow_net.flow_from_features(
            f1, fmap_l, net1, inp1)

        pcl1 = depth_to_pcl(ref_depth1, intrinsics, self._img_coords)
        conf1, conf2, pcl2_w, mask2_w = self.get_weight_maps(
            pcl1, depth2, intrinsics, ref_img, limg, mask2, time_flow,
            ref_sflow1, stereo_flow2, hidden, context,
        )
        pose, pose_tan, niter = self._solve(
            time_flow, pcl1, pcl2_w, conf1, conf2, ref_mask, mask2_w,
            intrinsics,
        )
        return PoseNetOutputs(pose, pose_tan, ref_depth1, depth2, conf1,
                              conf2, time_flow, stereo_flow2, None, niter)

    # ------------------------------------------------------------------
    # training path (reference pose_net.py:29-58)
    # ------------------------------------------------------------------

    def __call__(self, image1l, image2l, intrinsics, baseline, image1r,
                 image2r, mask1=None, mask2=None, train: bool = False
                 ) -> PoseNetOutputs:
        b = image1l.shape[0]
        # batch both stereo pairs and the temporal pair through one RAFT pass
        # (generalizes the reference's inference-time batching trick to
        # train); of the 6 pair slots only 4 images are unique — the encoders
        # run deduplicated (pairs: (1l,1r), (2l,2r), (1l,2l))
        enc = self.flow_net.encode_fnet(
            jnp.concatenate([image1l, image2l, image1r, image2r], axis=0),
            train)
        e1l, e2l = enc[:b], enc[b:2 * b]
        e1r, e2r = enc[2 * b:3 * b], enc[3 * b:]
        net_u, inp_u = self.flow_net.encode_cnet(
            jnp.concatenate([image1l, image2l], axis=0), train)
        flows, hidden, context = self.flow_net.flow_from_features(
            jnp.concatenate([e1l, e2l, e1l], axis=0),
            jnp.concatenate([e1r, e2r, e2l], axis=0),
            jnp.concatenate([net_u[:b], net_u[b:], net_u[:b]], axis=0),
            jnp.concatenate([inp_u[:b], inp_u[b:], inp_u[:b]], axis=0),
        )
        stereo_flow1, stereo_flow2, time_flow = flows[:b], flows[b:2 * b], flows[2 * b:]
        hidden, context = hidden[2 * b:], context[2 * b:]

        if self.config.get("stop_flow_grad", False):
            # While RAFT is frozen (reference freeze_flow with
            # freeze_flow_steps ~ infinity, train_posenet.py:75,98-99) every
            # trainable parameter — the TinyUNet heads and loss_weight — sits
            # DOWNSTREAM of the flow network, so gradients flowing back into
            # RAFT can only reach frozen leaves the optimizer mask zeroes
            # anyway. Cutting them here is exact for the frozen phase and
            # deletes the entire RAFT backward (the 12-iteration GRU scan's
            # stored/rematerialized conv activations — the reason the
            # no-remat step needed 267.5 GiB).
            stop = jax.lax.stop_gradient
            stereo_flow1, stereo_flow2, time_flow = (
                stop(stereo_flow1), stop(stereo_flow2), stop(time_flow))
            hidden, context = stop(hidden), stop(context)

        depth1, valid1 = self.disparity_to_depth(stereo_flow1, baseline)
        depth2, valid2 = self.disparity_to_depth(stereo_flow2, baseline)
        mask1 = (mask1 & valid1) if mask1 is not None else valid1
        mask2 = (mask2 & valid2) if mask2 is not None else valid2

        pcl1 = depth_to_pcl(depth1, intrinsics, self._img_coords)

        conf1, conf2, pcl2, mask2 = self.get_weight_maps(
            pcl1, depth2, intrinsics, image1l, image2l, mask2, time_flow,
            stereo_flow1, stereo_flow2, hidden, context, train,
        )
        pose, pose_tan, niter = self._solve(
            time_flow, pcl1, pcl2, conf1, conf2, mask1, mask2, intrinsics
        )
        return PoseNetOutputs(pose, pose_tan, depth1, depth2, conf1, conf2,
                              time_flow, stereo_flow2, solver_iters=niter)
