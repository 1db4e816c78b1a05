"""RAFT optical flow in JAX/flax — TPU-native rebuild of the reference's RAFT
submodule (aimi-lab fork of princeton-vl/RAFT; reference imports it at
core/pose/pose_net.py:6 and calls ``flow(img1, img2, upsample=True) ->
(flow_predictions, gru_hidden_state, context)``, see core/pose/pose_net.py:47,65,129).

Architecture (RAFT "large"): feature + context encoders at 1/8 resolution,
4-level all-pairs correlation pyramid with radius-4 bilinear lookup, a
separable ConvGRU update operator iterated ``iters`` times, and convex
upsampling of the 1/8-res flow. The fork-specific API addition — returning the
final GRU hidden state and the context features for the downstream confidence
weight heads — is preserved.

TPU-first design choices:
* NHWC layout throughout (MXU-friendly convs; the PoseNet boundary transposes
  from the reference's NCHW contract).
* the recurrent update loop is a ``lax.scan`` — one compiled region, no
  Python-driven iteration (reference hot loop A, SURVEY.md §3.1).
* correlation pyramid levels are built by 2x2 mean pooling; the radius-4
  bilinear lookup is expressed as batched one-hot matmuls (W_y @ corr @ W_x^T)
  that run on the MXU — TPU gathers along minor axes are ~70x slower (see
  lookup_corr).
* instance/batch norms run in inference mode (the reference freezes RAFT BN
  permanently: core/pose/pose_net.py:22 ``freeze_bn`` and config
  ``freeze_flow_steps`` ~ infinity).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

CORR_LEVELS = 4
CORR_RADIUS = 4
HDIM = 128  # GRU hidden dim (proven by reference weight-head input channel math,
CDIM = 128  # core/pose/pose_net.py:24-27: 128 + 128 + 8)


from robust_pose_tpu.ops.pallas_instance_norm import instance_norm  # noqa: E402
# (torch InstanceNorm2d(affine=False) semantics; single-pass Pallas stats on
# TPU — nn.GroupNorm(group_size=1) and plain XLA mean/var formulations both
# cost ~1 ms per norm in-context at 512x640, see ops/pallas_instance_norm.py)


class ResidualBlock(nn.Module):
    planes: int
    norm: str = "instance"
    stride: int = 1
    dtype: Any = jnp.float32

    def _norm(self, name):
        if self.norm == "instance":
            return instance_norm
        elif self.norm == "batch":
            return nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                                name=name)
        elif self.norm == "none":
            return lambda x: x
        else:
            raise ValueError(self.norm)

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(self._norm("norm1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(self._norm("norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="downsample")(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Feature/context encoder: 1/8 resolution, output_dim channels.

    ``dropout`` mirrors upstream RAFT's Dropout2d after the final 1x1 conv
    (active only in training; whole channels dropped)."""

    output_dim: int = 256
    norm: str = "instance"
    dtype: Any = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        if self.norm == "instance":
            x = instance_norm(x)
        else:
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name="norm1")(x)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(planes, self.norm, stride, dtype=self.dtype,
                              name=f"layer{i+1}_0")(x)
            x = ResidualBlock(planes, self.norm, 1, dtype=self.dtype,
                              name=f"layer{i+1}_1")(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                    name="conv2")(x)
        if self.dropout > 0.0:
            # torch Dropout2d: drop whole channels (broadcast over H, W)
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


class _SplitConv1x1(nn.Module):
    """1x1 conv applied to a channel-concatenation WITHOUT materializing the
    concat: the kernel is sliced per input part and the partial products are
    summed. Parameter layout is identical to ``nn.Conv`` (kernel
    (1, 1, Cin, Cout) + bias) so checkpoints are interchangeable. Avoids the
    ~13 ms/step relayout DMA the 324-channel corr concat costs on TPU.

    Parts may be NHWC ``(B, H, W, C)`` or channel-first flat ``(B, C, N)``
    (the lanewise lookup kernel's native output — consumed via a
    contract-dim-0 matmul, no transpose); ``hw`` gives (H, W) for the
    latter."""

    features: int
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts, hw=None):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_channels, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        out = None
        off = 0
        for part in parts:
            if part.ndim == 3:  # (B, C, N) channel-first
                ci = part.shape[1]
                k = kernel[0, 0, off:off + ci].astype(self.dtype)
                y = jnp.einsum("bcn,cf->bnf", part.astype(self.dtype), k)
                y = y.reshape(y.shape[0], hw[0], hw[1], self.features)
            else:
                ci = part.shape[-1]
                k = kernel[0, 0, off:off + ci].astype(self.dtype)
                y = jnp.einsum("bhwc,cf->bhwf", part.astype(self.dtype), k)
            out = y if out is None else out + y
            off += ci
        assert off == self.in_channels, (off, self.in_channels)
        return out + bias.astype(self.dtype)


class BasicMotionEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        corr_parts = corr if isinstance(corr, (list, tuple)) else [corr]
        cin = sum(p.shape[1] if p.ndim == 3 else p.shape[-1]
                  for p in corr_parts)
        hw = flow.shape[1:3]
        c = nn.relu(_SplitConv1x1(256, cin, dtype=dt, name="convc1")(
            corr_parts, hw))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=dt, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=dt, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=dt, name="convf2")(f))
        out = nn.relu(nn.Conv(128 - 2, (3, 3), padding=1, dtype=dt, name="conv")(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv``: declares an identical
    (kh, kw, Cin, Cout) kernel + (Cout,) bias under the same child-module
    path, but lets the caller run the convolution itself (e.g. fused with a
    sibling conv over the same input). Checkpoints are interchangeable with
    ``nn.Conv``."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class SepConvGRU(nn.Module):
    hidden_dim: int = HDIM
    dtype: Any = jnp.float32

    def _zr(self, hx, ksize, pad, zname, rname):
        """z and r gates share the input ``hx``: run them as ONE conv with
        the kernels concatenated along the output channels (the separate-
        conv formulation reads the same ~26 MB im2col stream from HBM
        twice per pass; mathematically identical per output channel)."""
        d = self.hidden_dim
        cin = hx.shape[-1]
        kz, bz = _ConvParams(d, ksize, cin, name=zname)()
        kr, br = _ConvParams(d, ksize, cin, name=rname)()
        dt = self.dtype
        out = jax.lax.conv_general_dilated(
            hx.astype(dt), jnp.concatenate([kz, kr], axis=-1).astype(dt),
            window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.concatenate([bz, br]).astype(dt)
        return nn.sigmoid(out[..., :d]), nn.sigmoid(out[..., d:])

    @nn.compact
    def __call__(self, h, x):
        dt = self.dtype
        h = h.astype(dt)
        x = x.astype(dt)
        # horizontal pass (1x5)
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = self._zr(hx, (1, 5), [(0, 0), (2, 2)], "convz1", "convr1")
        q = nn.tanh(nn.Conv(self.hidden_dim, (1, 5), padding=(0, 2), dtype=dt, name="convq1")(
            jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q
        # vertical pass (5x1)
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = self._zr(hx, (5, 1), [(2, 2), (0, 0)], "convz2", "convr2")
        q = nn.tanh(nn.Conv(self.hidden_dim, (5, 1), padding=(2, 0), dtype=dt, name="convq2")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="conv1")(x))
        # flow deltas accumulate over 12 iterations: emit f32
        return nn.Conv(2, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv2")(x.astype(jnp.float32))


class BasicUpdateBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.dtype
        corr = [c.astype(dt) for c in corr] if isinstance(corr, (list, tuple)) \
            else corr.astype(dt)
        motion = BasicMotionEncoder(dtype=dt, name="encoder")(
            flow.astype(dt), corr)
        net = SepConvGRU(dtype=dt, name="gru")(
            net, jnp.concatenate([inp.astype(dt), motion], axis=-1))
        delta_flow = FlowHead(dtype=dt, name="flow_head")(net)
        return net, delta_flow


class UpMaskHead(nn.Module):
    """Convex-upsampling mask head (upstream RAFT's ``self.mask``).

    Lives OUTSIDE the scanned GRU step: only the final iteration's mask is
    ever consumed (every reference consumer takes ``flow_predictions[-1]`` —
    core/pose/pose_net.py:48,66-67,129), so computing it per iteration and
    threading the (B, H/8, W/8, 576) f32 logits through the scan carry is
    pure waste (~280 MB of carry HBM traffic + 11 redundant conv pairs per
    RAFT pass). Applying it once to the final hidden state is exact."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net):
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="mask_conv1")(net.astype(self.dtype)))
        return 0.25 * nn.Conv(64 * 9, (1, 1), dtype=jnp.float32,
                              name="mask_conv2")(m.astype(jnp.float32))


class SmallEncoder(nn.Module):
    """Small feature/context encoder (upstream RAFT small=True variant:
    32/64/96 bottleneck channels, output_dim at 1/8 res)."""

    output_dim: int = 128
    norm: str = "instance"
    dtype: Any = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        if self.norm == "instance":
            x = instance_norm(x)
        elif self.norm == "batch":
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name="norm1")(x)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate([(32, 1), (64, 2), (96, 2)]):
            x = ResidualBlock(planes, self.norm, stride, dtype=self.dtype,
                              name=f"layer{i+1}_0")(x)
            x = ResidualBlock(planes, self.norm, 1, dtype=self.dtype,
                              name=f"layer{i+1}_1")(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                    name="conv2")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


class SmallMotionEncoder(nn.Module):
    """Motion encoder of the small update block (corr 1x1 -> 96, flow 7x7 ->
    64 -> 32, joint 3x3 -> 80, concat flow -> 82)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        corr_parts = corr if isinstance(corr, (list, tuple)) else [corr]
        cin = sum(p.shape[1] if p.ndim == 3 else p.shape[-1]
                  for p in corr_parts)
        c = nn.relu(_SplitConv1x1(96, cin, dtype=dt, name="convc1")(
            corr_parts, flow.shape[1:3]))
        f = nn.relu(nn.Conv(64, (7, 7), padding=3, dtype=dt, name="convf1")(flow))
        f = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=dt, name="convf2")(f))
        out = nn.relu(nn.Conv(80, (3, 3), padding=1, dtype=dt, name="conv")(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class ConvGRU(nn.Module):
    """Plain 3x3 ConvGRU (small update block)."""

    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        dt = self.dtype
        h = h.astype(dt)
        x = x.astype(dt)
        hx = jnp.concatenate([h, x], axis=-1)
        d = self.hidden_dim
        kz, bz = _ConvParams(d, (3, 3), hx.shape[-1], name="convz")()
        kr, br = _ConvParams(d, (3, 3), hx.shape[-1], name="convr")()
        zr = jax.lax.conv_general_dilated(
            hx, jnp.concatenate([kz, kr], axis=-1).astype(dt),
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.concatenate([bz, br]).astype(dt)
        z, r = nn.sigmoid(zr[..., :d]), nn.sigmoid(zr[..., d:])
        q = nn.tanh(nn.Conv(self.hidden_dim, (3, 3), padding=1, dtype=dt,
                            name="convq")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SmallUpdateBlock(nn.Module):
    """Small update operator: no convex-upsampling mask head (flow is
    bilinearly upsampled instead)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.dtype
        corr = [c.astype(dt) for c in corr] if isinstance(corr, (list, tuple)) \
            else corr.astype(dt)
        motion = SmallMotionEncoder(dtype=dt, name="encoder")(
            flow.astype(dt), corr)
        net = ConvGRU(hidden_dim=96, dtype=dt, name="gru")(
            net, jnp.concatenate([inp.astype(dt), motion], axis=-1))
        delta_flow = FlowHead(dtype=dt, name="flow_head")(net)
        return net, delta_flow


# ---------------------------------------------------------------------------
# correlation pyramid
# ---------------------------------------------------------------------------

LOOKUP_PAD = 2 * CORR_RADIUS + 2


def build_corr_pyramid(fmap1: Array, fmap2: Array,
                       pad_for_lookup: bool = False,
                       dtype=None) -> Sequence[Array]:
    """All-pairs correlation + 4-level pyramid.

    :param fmap1, fmap2: (B, H, W, C) 1/8-res feature maps
    :param pad_for_lookup: zero-pad each level spatially by LOOKUP_PAD once,
        so the 12 GRU-iteration lookups skip their per-call padding
    :param dtype: storage dtype of the volume (bf16 halves the HBM traffic of
        the 12 lookups; the values only feed bf16 MXU matmuls downstream)
    :return: list of (B, H*W, Hl[, +2*pad], Wl[, +2*pad]) volumes
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2) / jnp.sqrt(jnp.asarray(c, f1.dtype))
    if dtype is not None:
        corr = corr.astype(dtype)
    corr = corr.reshape(b, h * w, h, w)
    pyramid = [corr]
    for _ in range(CORR_LEVELS - 1):
        prev = pyramid[-1]
        bq, n_, hl, wl = prev.shape
        if hl % 2 == 0 and wl % 2 == 0:
            # reshape-mean (reduce_window is ~50x slower on TPU here)
            p = prev.reshape(bq, n_, hl // 2, 2, wl // 2, 2).mean(axis=(3, 5))
        else:
            # 2x2/2 average pool with floor semantics (torch avg_pool2d)
            p = jax.lax.reduce_window(
                prev, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            ) * 0.25
        pyramid.append(p)
    if pad_for_lookup:
        pyramid = [
            jnp.pad(p, ((0, 0), (0, 0), (LOOKUP_PAD, LOOKUP_PAD),
                        (LOOKUP_PAD, LOOKUP_PAD)))
            for p in pyramid
        ]
    return pyramid


def lookup_corr_gather(pyramid: Sequence[Array], coords: Array) -> Array:
    """Radius-4 bilinear lookup via per-element XLA gathers.

    Reference semantics oracle (matches torch grid_sample zeros padding), but
    lane-axis element gathers are ~20x slower than ``lookup_corr`` on TPU —
    kept for testing only.
    """
    b, h, w, _ = coords.shape
    r = CORR_RADIUS
    d = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=coords.dtype)
    dgrid_x, dgrid_y = jnp.meshgrid(dx, dx, indexing="xy")  # (d, d)

    out = []
    for lvl, corr in enumerate(pyramid):
        _, _, hl, wl = corr.shape
        c = coords.reshape(b, h * w, 2) / (2 ** lvl)
        cx = c[..., 0:1] + dgrid_x.reshape(1, 1, -1)  # (B, N, d*d)
        cy = c[..., 1:2] + dgrid_y.reshape(1, 1, -1)

        # shared bilinear corner weights across the integer offset window
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        wx = cx - x0
        wy = cy - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)

        flat = corr.reshape(b, h * w, hl * wl)

        def gather(ix, iy):
            inb = (ix >= 0) & (ix < wl) & (iy >= 0) & (iy < hl)
            idx = jnp.clip(iy, 0, hl - 1) * wl + jnp.clip(ix, 0, wl - 1)
            return jnp.take_along_axis(flat, idx, axis=-1) * inb

        v = (
            gather(x0, y0) * (1 - wx) * (1 - wy)
            + gather(x0 + 1, y0) * wx * (1 - wy)
            + gather(x0, y0 + 1) * (1 - wx) * wy
            + gather(x0 + 1, y0 + 1) * wx * wy
        )
        out.append(v.reshape(b, h, w, d * d))
    return jnp.concatenate(out, axis=-1)


def lookup_corr(pyramid: Sequence[Array], coords: Array,
                padded: bool = False, precise: bool = False,
                as_list: bool = False, radius: int = CORR_RADIUS) -> Array:
    """Radius-4 bilinear lookup in every pyramid level (TPU-fast path).

    TPU gathers along minor axes are pathologically slow (~190 ms/lookup at
    production scale), so the lookup is reformulated as **batched one-hot
    matmuls**: per pixel, ``out = W_y @ corr @ W_x^T`` where ``W_y (9, Hl)``
    and ``W_x (9, Wl)`` carry the bilinear corner weights at one-hot
    positions. Out-of-bounds corners get all-zero rows, which reproduces
    torch grid_sample zeros-padding semantics exactly. Everything maps onto
    the MXU — no padding, dynamic slices, or transposes (~70x faster than
    the gather oracle, ~2 ms/lookup).

    :param coords: (B, H, W, 2) correspondence estimates (x, y), 1/8-res px
    :param padded: accept pyramids padded by build_corr_pyramid(pad_for_lookup)
    :param precise: f32 weight matrices + HIGHEST-precision contractions
        (bit-exact vs the gather oracle; default folds weights into the
        volume dtype, adding <=0.4% interpolation rounding in bf16)
    :return: (B, H, W, CORR_LEVELS * (2r+1)^2) correlation features
    """
    b, h, w, _ = coords.shape
    n = h * w
    r = radius
    d = 2 * r + 1
    dd = jnp.arange(d, dtype=jnp.int32) - r

    outs = []
    for lvl, corr in enumerate(pyramid):
        _, _, hl, wl = corr.shape
        if padded:
            hl, wl = hl - 2 * LOOKUP_PAD, wl - 2 * LOOKUP_PAD
            corr = corr[:, :, LOOKUP_PAD:LOOKUP_PAD + hl,
                        LOOKUP_PAD:LOOKUP_PAD + wl]
        wdtype = jnp.float32 if precise else corr.dtype
        prec = jax.lax.Precision.HIGHEST if precise else None

        c = coords.reshape(b, n, 2) / (2 ** lvl)
        cx, cy = c[..., 0], c[..., 1]
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        wx = (cx - x0).astype(jnp.float32)[..., None, None]
        wy = (cy - y0).astype(jnp.float32)[..., None, None]
        ys = y0.astype(jnp.int32)[..., None, None] + dd[:, None]  # (B,N,9,1)
        xs = x0.astype(jnp.int32)[..., None, None] + dd[:, None]
        ygrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, hl), 3)
        xgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, wl), 3)
        # bilinear corner weights at one-hot positions; OOB rows are all-zero
        Wy = ((ygrid == ys) * (1.0 - wy) + (ygrid == ys + 1) * wy).astype(wdtype)
        Wx = ((xgrid == xs) * (1.0 - wx) + (xgrid == xs + 1) * wx).astype(wdtype)
        A = jnp.einsum("bnih,bnhw->bniw", Wy, corr, precision=prec)
        val = jnp.einsum("bniw,bnjw->bnij", A, Wx, precision=prec)
        outs.append(val.astype(jnp.float32).reshape(b, h, w, d * d))
    if as_list:
        return outs
    return jnp.concatenate(outs, axis=-1)


def upsample_flow_convex(flow: Array, mask: Array) -> Array:
    """Convex-combination 8x upsampling of 1/8-res flow.

    :param flow: (B, H, W, 2)
    :param mask: (B, H, W, 64*9) logits
    :return: (B, 8H, 8W, 2)
    """
    b, h, w, _ = flow.shape
    # TPU layout note: the textbook formulation reshapes the mask to
    # (B, H, W, 9, 8, 8) and einsums over the 9-neighborhood — but trailing
    # dims (8, 8) tile to the TPU's (8, 128) native tile, a 14-16x padding
    # blowup (~3.7 GB padded per stored copy at train shape, and the
    # dominant remat buffers of the whole train step). Slab-wise softmax
    # over the 9 neighbors keeps every intermediate at a 64-wide minor dim
    # (the 8x8 subpixel block, flattened): mathematically identical.
    slabs = [mask[..., 64 * k:64 * (k + 1)] for k in range(9)]  # (B,H,W,64)
    mx = slabs[0]
    for s in slabs[1:]:
        mx = jnp.maximum(mx, s)
    es = [jnp.exp(s - mx) for s in slabs]
    den = sum(es)

    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood (unfold order matches the reference's F.unfold:
    # row-major over (di, dj)), one (B, H, W) plane per neighbor/channel
    up_c = []
    for c in range(2):
        acc = 0.0
        for k, (i, j) in enumerate((i, j) for i in range(3) for j in range(3)):
            acc = acc + es[k] * fp[:, i:i + h, j:j + w, c:c + 1]
        u = acc / den                                     # (B, H, W, 64)
        u = u.reshape(b, h, w, 8, 8).transpose(0, 1, 3, 2, 4)
        up_c.append(u.reshape(b, 8 * h, 8 * w))
    return jnp.stack(up_c, axis=-1)


class _UpdateStep(nn.Module):
    """One GRU iteration, shaped for ``nn.scan``.

    Loop invariants (correlation pyramid, context features, base coords)
    arrive as ``nn.broadcast`` arguments — putting the ~400 MB pyramid in
    the scan carry would thread a copy of it through every iteration."""

    dtype: Any = jnp.float32
    small: bool = False
    lookup: str = "lanewise"

    @nn.compact
    def __call__(self, carry, pyramid, inp, coords0):
        radius = 3 if self.small else CORR_RADIUS
        if self.lookup == "onthefly":
            from robust_pose_tpu.ops.pallas_corr_onthefly import (
                onthefly_lookup,
            )
            f1, f2_levels = pyramid
            corr = onthefly_lookup(f1, f2_levels, carry["coords1"],
                                   radius=radius,
                                   interpret=jax.default_backend() == "cpu")
        elif self.lookup == "lanewise":
            from robust_pose_tpu.ops.pallas_lookup_lanewise import (
                lanewise_lookup,
            )
            # Pallas TPU kernels run via the interpreter on the CPU backend
            corr = lanewise_lookup(pyramid, carry["coords1"], radius=radius,
                                   interpret=jax.default_backend() == "cpu")
        elif self.lookup == "grouped":
            from robust_pose_tpu.ops.pallas_lookup import (
                pallas_lookup_pyramid_grouped,
            )
            corr = pallas_lookup_pyramid_grouped(pyramid, carry["coords1"])
        else:
            corr = lookup_corr(pyramid, carry["coords1"], as_list=True,
                               radius=radius)
        flow = carry["coords1"] - coords0
        block = SmallUpdateBlock if self.small else BasicUpdateBlock
        net, delta = block(dtype=self.dtype, name="update_block")(
            carry["net"], inp, corr, flow
        )
        carry = dict(carry, net=net, coords1=carry["coords1"] + delta)
        return carry, None


class RAFT(nn.Module):
    """RAFT with the aimi-lab fork API.

    __call__(image1, image2) -> (flow_up (B, H, W, 2), net (B, H/8, W/8, 128),
    inp (B, H/8, W/8, 128)); images are (B, H, W, 3) in [0, 255].
    Only the final flow prediction is materialized (the reference keeps a list
    but every consumer uses ``[-1]`` — core/pose/pose_net.py:48,66-67,129).
    """

    iters: int = 12
    corr_dtype: Any = jnp.bfloat16
    dtype: Any = jnp.bfloat16  # compute dtype of convs (params stay f32)
    small: bool = False  # upstream RAFT small variant (hdim 96, cdim 64)
    dropout: float = 0.0  # encoder Dropout2d rate (upstream RAFT; train only)
    remat: bool = False  # rematerialize GRU iterations in backward (training)
    remat_policy: str = "nothing"  # what remat may KEEP instead of
    # recomputing: "nothing" (full recompute — minimum memory),
    # "dots" (jax.checkpoint_policies.dots_saveable: conv/matmul outputs are
    # kept, cheap elementwise ops recompute — trades the measured HBM
    # headroom at grad_accum >= 2 for backward-pass FLOPs; see
    # scripts/bench_train_step.py)
    lookup: str = "auto"  # correlation lookup implementation:
    # "auto" — "onthefly" on TPU, "xla" on CPU (avoids interpret-mode Pallas
    #   in CPU CI; kernel correctness is covered by dedicated interpret tests)
    # "onthefly" — alt_cuda_corr-style Pallas kernel: the volume is never
    #   materialized; each 128-query block is recomputed on the MXU from the
    #   feature maps (ops/pallas_corr_onthefly.py) — removes ~1.7 GB/step of
    #   HBM volume traffic
    # "lanewise" — lane-parallel Pallas kernel over the transposed volume
    #   (ops/pallas_lookup_lanewise.py, ~3x faster than the XLA path on v5e)
    # "xla" — one-hot-matmul formulation (lookup_corr)
    # "grouped" — round-1 block-diagonal Pallas kernel (kept for comparison)

    def _resolve_lookup(self) -> str:
        if self.lookup == "auto":
            return "xla" if jax.default_backend() == "cpu" else "onthefly"
        if self.lookup not in ("onthefly", "lanewise", "grouped", "xla"):
            # fail fast: an unrecognized value would otherwise silently fall
            # through to the XLA path and corrupt kernel A/B comparisons
            raise ValueError(
                f"unknown correlation lookup {self.lookup!r}; expected one of "
                "'auto', 'onthefly', 'lanewise', 'grouped', 'xla'")
        return self.lookup

    def setup(self):
        hdim = 96 if self.small else HDIM
        cdim = 64 if self.small else CDIM
        enc_cls = SmallEncoder if self.small else BasicEncoder
        policy = (jax.checkpoint_policies.dots_saveable
                  if self.remat_policy == "dots" else None)
        if self.remat:
            # training: recompute encoder activations in backward too (their
            # stored intermediates are ~250 MB each at batch 8 512x640)
            enc_cls = nn.remat(enc_cls, prevent_cse=False,
                               static_argnums=(2,), policy=policy)
        self.fnet = enc_cls(output_dim=128 if self.small else 256,
                            norm="instance", dtype=self.dtype,
                            dropout=self.dropout)
        self.cnet = enc_cls(output_dim=hdim + cdim,
                            norm="none" if self.small else "batch",
                            dtype=self.dtype, dropout=self.dropout)
        # remat: recompute each GRU iteration's activations in the backward
        # pass instead of storing all `iters` of them (training at batch 8
        # 512x640 otherwise needs ~2x the chip's HBM); no effect on inference
        step_cls = (nn.remat(_UpdateStep, prevent_cse=False, policy=policy)
                    if self.remat else _UpdateStep)
        self.update = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            length=self.iters,
        )(dtype=self.dtype, small=self.small, lookup=self._resolve_lookup())
        if not self.small:
            # applied ONCE to the final hidden state (see UpMaskHead)
            self.up_mask = UpMaskHead(dtype=self.dtype)

    # ------------------------------------------------------------------
    # public sub-stages: feature encoding is exposed separately so callers
    # can CACHE per-image features across the streaming loop (frame t's
    # reference image IS frame t-1's current image — PoseNet reuses its
    # encodings instead of recomputing, ~1/3 of the encoder work)
    # ------------------------------------------------------------------

    def encode_fnet(self, images: Array, train: bool = False) -> Array:
        """Feature encoder on raw [0, 255] images -> (B, H/8, W/8, 256)."""
        return self.fnet(2.0 * (images / 255.0) - 1.0, train)

    def encode_cnet(self, images: Array, train: bool = False):
        """Context encoder -> (net (tanh), inp (relu)) GRU init/context."""
        hdim = 96 if self.small else HDIM
        c = self.cnet(2.0 * (images / 255.0) - 1.0, train)
        return nn.tanh(c[..., :hdim]), nn.relu(c[..., hdim:])

    def flow_from_features(self, fmap1: Array, fmap2: Array, net: Array,
                           inp: Array):
        """Correlation pyramid + recurrent refinement from precomputed
        features; returns (flow_up, final_hidden, context) per pair."""
        b, h8, w8, _ = fmap1.shape
        h, w = 8 * h8, 8 * w8
        lookup = self._resolve_lookup()
        if lookup == "onthefly":
            from robust_pose_tpu.ops.pallas_corr_onthefly import (
                pool_fmap_pyramid,
            )
            # the volume is never materialized: the kernel recomputes each
            # 128-query block on the MXU from these features (f2 mean-pooled
            # per level in f32 — exactly equivalent to pooling the volume)
            f2_levels = [l.astype(self.corr_dtype)
                         for l in pool_fmap_pyramid(fmap2.astype(jnp.float32))]
            pyramid = (fmap1.astype(self.corr_dtype), f2_levels)
        elif lookup == "lanewise":
            from robust_pose_tpu.ops.pallas_lookup_lanewise import (
                build_corr_pyramid_t,
            )
            pyramid = build_corr_pyramid_t(fmap1.astype(jnp.float32),
                                           fmap2.astype(jnp.float32),
                                           dtype=self.corr_dtype)
        else:
            pyramid = build_corr_pyramid(fmap1.astype(jnp.float32),
                                         fmap2.astype(jnp.float32),
                                         dtype=self.corr_dtype)

        xs = jnp.arange(w8, dtype=jnp.float32)
        ys = jnp.arange(h8, dtype=jnp.float32)
        xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
        coords0 = jnp.broadcast_to(
            jnp.stack([xg, yg], axis=-1)[None], (b, h8, w8, 2))

        carry0 = {
            "net": net.astype(self.dtype),
            "coords1": coords0,
        }

        # recurrent update iterations as one compiled scan (hot loop A,
        # SURVEY.md §3.1); params and loop invariants broadcast across
        # iterations (NOT carried)
        carry, _ = self.update(carry0, pyramid, inp, coords0)

        flow8 = carry["coords1"] - coords0
        if self.small:
            # no convex mask in the small variant: bilinear 8x upsample
            flow_up = 8.0 * jax.image.resize(
                flow8, (b, h, w, 2), method="linear", antialias=False)
        else:
            flow_up = upsample_flow_convex(flow8, self.up_mask(carry["net"]))
        return (flow_up, carry["net"].astype(jnp.float32),
                inp.astype(jnp.float32))

    def __call__(self, image1: Array, image2: Array, train: bool = False):
        b = image1.shape[0]
        # batching the two frames through the shared feature encoder mirrors
        # the reference (RAFT fnet([image1, image2]))
        fmaps = self.encode_fnet(jnp.concatenate([image1, image2], axis=0),
                                 train)
        net, inp = self.encode_cnet(image1, train)
        return self.flow_from_features(fmaps[:b], fmaps[b:], net, inp)
