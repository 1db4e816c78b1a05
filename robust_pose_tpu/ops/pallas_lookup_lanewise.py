"""Pallas TPU kernel: lane-parallel RAFT correlation-window lookup.

The hot op of the tracking step (SURVEY.md §2 native-code inventory: the
reference's optional ``alt_cuda_corr`` CUDA extension). Round-1 kernels in
``pallas_lookup.py`` processed pixels one (or eight) at a time with tiny
per-pixel matmuls — issue-bound at ~4 ms/lookup. This kernel removes the
per-pixel irregularity entirely by a layout change:

* the correlation volume is built **transposed** — ``(B, Hl, Wl, N)`` with the
  N = H/8*W/8 query pixels on the minor (lane) dimension — so 128 pixels are
  processed per vector op with zero data reshuffling;
* the radius-r bilinear window lookup is a dense separable contraction with
  iota-built 2-tap row/column weights:
  ``out[dy, dx, n] = sum_y sum_x ky[dy, y, n] * kx[dx, x, n] * corr[y, x, n]``
  where ``ky[dy, y, n] = (y == y0_n + dy) (1 - wy_n) + (y == y0_n + dy + 1) wy_n``
  — every op is a full-width VPU multiply/reduce over the 128-pixel lane dim;
* out-of-bounds taps never match the iota compare, reproducing torch
  grid_sample zeros-padding semantics exactly (partial corners included) —
  no padding, masking, clamping or dynamic slicing anywhere.

Per 128-pixel block at level 0 (512x640 input: Hl, Wl = 64, 80) the kernel
does 9*64*80*128 + 9*9*80*128 ~ 6.7M MACs while streaming 1.3 MB (bf16) from
HBM — VPU/DMA balanced, vs ~1000 serialized MXU issues in the round-1 kernels.

Verified bit-exact (f32) against lookup_corr_gather in tests (interpret mode
on CPU and compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128  # pixels per kernel program (one full lane group)


def build_corr_pyramid_t(fmap1: Array, fmap2: Array, num_levels: int = 4,
                         dtype=None):
    """All-pairs correlation + pyramid, transposed for the lanewise kernel.

    :param fmap1, fmap2: (B, H, W, C) 1/8-res feature maps
    :param dtype: storage dtype of the volume (bf16 halves HBM traffic)
    :return: list of (B, Hl, Wl, N) volumes — target coords (Hl, Wl) leading,
        query pixel N = H*W on the minor (lane) dimension
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    # corr_t[b, m, n] = <f2[m], f1[n]> / sqrt(c): query pixels n minor-most
    corr = jnp.einsum("bmc,bnc->bmn", f2, f1) / jnp.sqrt(
        jnp.asarray(c, f1.dtype))
    if dtype is not None:
        corr = corr.astype(dtype)
    corr = corr.reshape(b, h, w, h * w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        prev = pyramid[-1]
        bq, hl, wl, n = prev.shape
        # 2x2 mean pool over the target coords (reshape-mean: reduce_window
        # is ~50x slower on TPU here); floor semantics via truncating slice
        he, we = (hl // 2) * 2, (wl // 2) * 2
        p = prev[:, :he, :we].reshape(bq, hl // 2, 2, wl // 2, 2, n)
        pyramid.append(p.mean(axis=(2, 4)))
    return pyramid


def _lanewise_kernel(cy_ref, cx_ref, corr_ref, out_ref, *, radius: int):
    """One (batch, 128-pixel) block.

    cy_ref/cx_ref: (1, LANES) f32 sample centers in this level's pixels.
    corr_ref: (1, Hl, Wl, LANES) correlation volume block.
    out_ref: (1, D, D, LANES) f32 window values, D = 2*radius + 1.
    """
    d = 2 * radius + 1
    _, hl, wl, _ = corr_ref.shape
    corr = corr_ref[0].astype(jnp.float32)          # (Hl, Wl, LANES)
    cy = cy_ref[0]                                   # (1, LANES)
    cx = cx_ref[0]
    y0f = jnp.floor(cy)
    x0f = jnp.floor(cx)
    wy = cy - y0f                                    # (1, LANES)
    wx = cx - x0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    yi = jax.lax.broadcasted_iota(jnp.int32, (hl, LANES), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (wl, LANES), 0)

    # stage 1 — row interpolation: tmp[dy, x, n] = sum_y ky[y, n] corr[y, x, n]
    rows = []
    for dy in range(d):
        t = y0 - radius + dy                         # (1, LANES) -> bcast
        ky = (jnp.where(yi == t, 1.0 - wy, 0.0)
              + jnp.where(yi == t + 1, wy, 0.0))     # (Hl, LANES)
        rows.append(jnp.sum(ky[:, None, :] * corr, axis=0))  # (Wl, LANES)
    tmp = jnp.stack(rows, axis=0)                    # (D, Wl, LANES)

    # stage 2 — column interpolation: out[dy, dx, n] = sum_x kx[x, n] tmp[dy, x, n]
    cols = []
    for dx in range(d):
        t = x0 - radius + dx
        kx = (jnp.where(xi == t, 1.0 - wx, 0.0)
              + jnp.where(xi == t + 1, wx, 0.0))     # (Wl, LANES)
        cols.append(jnp.sum(tmp * kx[None], axis=1))  # (D, LANES)
    out_ref[0] = jnp.stack(cols, axis=1)             # (D, D, LANES)


def _pad_lanes(corr_t, cx, cy):
    b, hl, wl, n = corr_t.shape
    npad = ((n + LANES - 1) // LANES) * LANES - n
    if npad:
        corr_t = jnp.pad(corr_t, ((0, 0), (0, 0), (0, 0), (0, npad)))
        cx = jnp.pad(cx, ((0, 0), (0, npad)))
        cy = jnp.pad(cy, ((0, 0), (0, npad)))
    np_ = n + npad
    # (B, 1, N): keeps the trailing block dims TPU-legal ((1, 128) with the
    # sublane dim equal to the array dim) for any batch size
    return corr_t, cx.reshape(b, 1, np_), cy.reshape(b, 1, np_), np_


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _lookup_level(corr_t: Array, coords: Array, radius: int,
                  level_scale: float, interpret: bool) -> Array:
    b, hl, wl, n = corr_t.shape
    d = 2 * radius + 1
    c = coords.astype(jnp.float32) / float(level_scale)
    corr_p, cx, cy, np_ = _pad_lanes(corr_t, c[..., 0], c[..., 1])

    out = pl.pallas_call(
        functools.partial(_lanewise_kernel, radius=radius),
        grid=(b, np_ // LANES),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hl, wl, LANES), lambda bi, i: (bi, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, d, LANES), lambda bi, i: (bi, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, d, np_), jnp.float32),
        interpret=interpret,
    )(cy, cx, corr_p)
    return out.reshape(b, d * d, np_)[..., :n]


def _lanewise_bwd_kernel(cy_ref, cx_ref, corr_ref, g_ref, dcorr_ref, dc_ref,
                         *, radius: int):
    """Backward: cotangents wrt the correlation volume block and the sample
    centers. Same dense separable structure as the forward (all VPU)."""
    d = 2 * radius + 1
    _, hl, wl, _ = corr_ref.shape
    corr = corr_ref[0].astype(jnp.float32)              # (Hl, Wl, LANES)
    g = g_ref[0].astype(jnp.float32)                    # (D, D, LANES)
    cy = cy_ref[0]
    cx = cx_ref[0]
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    wy = cy - jnp.floor(cy)
    wx = cx - jnp.floor(cx)

    yi = jax.lax.broadcasted_iota(jnp.int32, (hl, LANES), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (wl, LANES), 0)

    # gx[dy, x, n]  = sum_dx kx_dx[x, n]  g[dy, dx, n]
    # gxp[dy, x, n] = sum_dx kx'_dx[x, n] g[dy, dx, n]   (d/dwx weights)
    gx = jnp.zeros((d, wl, LANES), jnp.float32)
    gxp = jnp.zeros((d, wl, LANES), jnp.float32)
    for dx in range(d):
        t = x0 - radius + dx
        kx = (jnp.where(xi == t, 1.0 - wx, 0.0)
              + jnp.where(xi == t + 1, wx, 0.0))        # (Wl, LANES)
        kxp = (jnp.where(xi == t + 1, 1.0, 0.0)
               - jnp.where(xi == t, 1.0, 0.0))
        gslice = g[:, dx, None, :]                      # (D, 1, LANES)
        gx = gx + kx[None] * gslice
        gxp = gxp + kxp[None] * gslice

    dcorr = jnp.zeros((hl, wl, LANES), jnp.float32)
    dcy = jnp.zeros((1, LANES), jnp.float32)
    dcx = jnp.zeros((1, LANES), jnp.float32)
    for dy in range(d):
        t = y0 - radius + dy
        ky = (jnp.where(yi == t, 1.0 - wy, 0.0)
              + jnp.where(yi == t + 1, wy, 0.0))        # (Hl, LANES)
        kyp = (jnp.where(yi == t + 1, 1.0, 0.0)
               - jnp.where(yi == t, 1.0, 0.0))
        dcorr = dcorr + ky[:, None, :] * gx[dy][None]
        row = jnp.sum(ky[:, None, :] * corr, axis=0)    # fwd tmp (Wl, LANES)
        rowp = jnp.sum(kyp[:, None, :] * corr, axis=0)
        dcy = dcy + jnp.sum(rowp * gx[dy], axis=0, keepdims=True)
        dcx = dcx + jnp.sum(row * gxp[dy], axis=0, keepdims=True)

    dcorr_ref[0] = dcorr.astype(dcorr_ref.dtype)
    dc_ref[0, 0] = dcy[0]
    dc_ref[0, 1] = dcx[0]


def _lookup_level_fwd(corr_t, coords, radius, level_scale, interpret):
    return (_lookup_level(corr_t, coords, radius, level_scale, interpret),
            (corr_t, coords))


def _lookup_level_bwd(radius, level_scale, interpret, res, g):
    corr_t, coords = res
    b, hl, wl, n = corr_t.shape
    d = 2 * radius + 1
    c = coords.astype(jnp.float32) / float(level_scale)
    corr_p, cx, cy, np_ = _pad_lanes(corr_t, c[..., 0], c[..., 1])
    gp = g.reshape(b, d, d, n)
    if np_ != n:
        gp = jnp.pad(gp, ((0, 0), (0, 0), (0, 0), (0, np_ - n)))

    dcorr, dc = pl.pallas_call(
        functools.partial(_lanewise_bwd_kernel, radius=radius),
        grid=(b, np_ // LANES),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hl, wl, LANES), lambda bi, i: (bi, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d, LANES), lambda bi, i: (bi, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hl, wl, LANES), lambda bi, i: (bi, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, LANES), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hl, wl, np_), corr_t.dtype),
            jax.ShapeDtypeStruct((b, 2, np_), jnp.float32),
        ],
        interpret=interpret,
    )(cy, cx, corr_p, gp)
    dcorr = dcorr[..., :n]
    # dc rows are [dcy, dcx] wrt the level-scaled centers; coords are (x, y)
    dcoords = (jnp.stack([dc[:, 1, :n], dc[:, 0, :n]], axis=-1)
               / float(level_scale)).astype(coords.dtype)
    return dcorr, dcoords


_lookup_level.defvjp(_lookup_level_fwd, _lookup_level_bwd)


@functools.partial(jax.jit,
                   static_argnames=("radius", "level_scale", "interpret"))
def lanewise_lookup_level(corr_t: Array, coords: Array, radius: int = 4,
                          level_scale: int = 1, interpret: bool = False
                          ) -> Array:
    """Bilinear window lookup for one pyramid level (differentiable — custom
    VJP kernels supply exact cotangents wrt the volume and the coords).

    :param corr_t: (B, Hl, Wl, N) transposed correlation volume
    :param coords: (B, N, 2) sample centers (x, y) in LEVEL-0 pixels
    :param level_scale: divide coords by this (2**level)
    :return: (B, D*D, N) f32 window values, dy-major channel order
    """
    return _lookup_level(corr_t, coords, radius, float(level_scale),
                         interpret)


def lanewise_lookup(pyramid_t, coords: Array, radius: int = 4,
                    interpret: bool = False):
    """Full pyramid lookup.

    :param pyramid_t: list of (B, Hl, Wl, N) from build_corr_pyramid_t
    :param coords: (B, H, W, 2) correspondence estimates (x, y), 1/8-res px
    :return: list of per-level (B, D*D, N) f32 correlation features
        (channel-first; N = H*W row-major)
    """
    b, h, w, _ = coords.shape
    c = coords.reshape(b, h * w, 2)
    return [
        lanewise_lookup_level(corr_t, c, radius=radius, level_scale=2 ** lvl,
                              interpret=interpret)
        for lvl, corr_t in enumerate(pyramid_t)
    ]
