"""Pallas TPU kernel: on-the-fly RAFT correlation window lookup.

TPU analogue of upstream RAFT's optional ``alt_cuda_corr`` CUDA extension
(SURVEY.md §2 native-code inventory item 2): the all-pairs correlation volume
is never materialized in HBM. Each kernel program recomputes the full
correlation column block for 128 query pixels on the MXU directly from the
1/8-res feature maps and immediately reduces it to the radius-r bilinear
window in VMEM:

    corr_block = f2_level @ f1_block^T / sqrt(C)      (MXU, f32 accumulate)
    out[dy, dx, n] = sum_y sum_x ky[y, n] kx[x, n] corr_block[y, x, n]  (VPU)

where ky/kx are the iota-built 2-tap bilinear row/column weights of
``pallas_lookup_lanewise`` (exact torch grid_sample zeros semantics).

Why this wins on TPU: the materialized volume is ~140 MB (bf16, batch 2 at
512x640) and every one of the 12 GRU iterations re-reads it — ~1.7 GB of HBM
traffic per tracking step, which is ~2x the step's entire remaining footprint.
Recomputing costs 12 x 27 GFLOP(bf16) ~ 2 ms of MXU time while the per-
iteration HBM traffic drops to the feature maps (~6 MB): correlation becomes
compute-cheap and bandwidth-free. The f2 level block index is constant across
the query-block grid dimension, so Pallas keeps it VMEM-resident and only
re-DMAs per batch element.

Correlation pyramid levels are handled by 2x2 mean-pooling the *features* of
frame 2: pooling the volume over target coordinates is linear in f2, so
``pool(corr)(Y, X, n) == <pool(f2)[Y, X], f1[n]> / sqrt(C)`` exactly (same
floor/truncation semantics as build_corr_pyramid_t).

Backward (training) runs through an XLA reference formulation of the same
math via ``jax.vjp`` — exact f32 cotangents for fmap1, fmap2 and coords; the
kernel is used for the (gradient-free) forward value in both modes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128  # query pixels per kernel program


def pool_fmap_pyramid(fmap2: Array, num_levels: int = 4):
    """2x2 mean-pool pyramid of frame-2 features, flattened per level.

    :param fmap2: (B, H, W, C) 1/8-res features
    :return: list of (B, Hl, Wl, C) feature maps (level 0 = input)
    """
    levels = [fmap2]
    for _ in range(num_levels - 1):
        prev = levels[-1]
        b, h, w, c = prev.shape
        he, we = (h // 2) * 2, (w // 2) * 2
        p = prev[:, :he, :we].reshape(b, h // 2, 2, w // 2, 2, c)
        levels.append(p.mean(axis=(2, 4)))
    return levels


def _onthefly_kernel(cy_ref, cx_ref, f1_ref, f2_ref, out_ref, corr_ref, *,
                     radius: int, hl: int, wl: int, inv_sqrt_c: float,
                     row_chunk: int):
    """One (batch, 128-query-pixel) block of one pyramid level.

    cy_ref/cx_ref: (1, 1, LANES) f32 sample centers in this level's pixels.
    f1_ref: (1, LANES, C) query features.
    f2_ref: (1, M, C) level features, M = Hl*Wl (VMEM-resident across blocks).
    out_ref: (1, D, D, LANES) f32 window values, D = 2*radius + 1.
    corr_ref: (row_chunk * Wl, LANES) f32 VMEM scratch.

    The MXU matmul is chunked over ``row_chunk`` image rows of f2 with the
    stage-1 row interpolation folded into each chunk, so only a
    (row_chunk*Wl, 128) correlation slab is ever materialized (full-level
    slabs at batch 3 blow the 16 MB VMEM budget).
    """
    d = 2 * radius + 1
    f1 = f1_ref[0]                                         # (LANES, C)
    cy = cy_ref[0, 0]
    cx = cx_ref[0, 0]
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    wy = cy - jnp.floor(cy)
    wx = cx - jnp.floor(cx)

    xi = jax.lax.broadcasted_iota(jnp.int32, (wl, LANES), 0)

    # stage 1 — chunked matmul + row interpolation:
    #   tmp[dy, x, n] = sum_y ky[y, n] * (<f2[y, x], f1[n]> / sqrt(C))
    tmp = [jnp.zeros((wl, LANES), jnp.float32) for _ in range(d)]
    for y_start in range(0, hl, row_chunk):
        rc = min(row_chunk, hl - y_start)
        # MXU: correlation slab for rc image rows, f32 accumulation
        corr_ref[:rc * wl] = jax.lax.dot_general(
            f2_ref[0, y_start * wl:(y_start + rc) * wl], f1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_c
        corr = corr_ref[:rc * wl].reshape(rc, wl, LANES)
        yi = y_start + jax.lax.broadcasted_iota(jnp.int32, (rc, LANES), 0)
        for dy in range(d):
            t = y0 - radius + dy
            ky = (jnp.where(yi == t, 1.0 - wy, 0.0)
                  + jnp.where(yi == t + 1, wy, 0.0))       # (rc, LANES)
            tmp[dy] = tmp[dy] + jnp.sum(ky[:, None, :] * corr, axis=0)
    tmp = jnp.stack(tmp, axis=0)                           # (D, Wl, LANES)

    # stage 2 — column interpolation: out[dy, dx, n] = sum_x kx[x, n] tmp[dy, x, n]
    cols = []
    for dx in range(d):
        t = x0 - radius + dx
        kx = (jnp.where(xi == t, 1.0 - wx, 0.0)
              + jnp.where(xi == t + 1, wx, 0.0))          # (Wl, LANES)
        cols.append(jnp.sum(tmp * kx[None], axis=1))       # (D, LANES)
    out_ref[0] = jnp.stack(cols, axis=1)                   # (D, D, LANES)


def _xla_reference_level(f1: Array, f2l: Array, coords: Array, radius: int,
                         level_scale: float) -> Array:
    """Differentiable XLA formulation of the same level lookup (one-hot
    bilinear weight matmuls — exact zeros-padding semantics). Supplies the
    backward pass; numerically f32-exact vs the kernel."""
    b, n, c = f1.shape
    _, hl, wl, _ = f2l.shape
    d = 2 * radius + 1
    corr = jnp.einsum("bhwc,bnc->bhwn", f2l.astype(jnp.float32),
                      f1.astype(jnp.float32)) / jnp.sqrt(float(c))
    cs = coords.astype(jnp.float32) / level_scale
    cx, cy = cs[..., 0], cs[..., 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx = cx - x0
    wy = cy - y0
    dd = jnp.arange(d, dtype=jnp.int32) - radius
    ys = y0.astype(jnp.int32)[:, :, None] + dd[None, None]   # (B, N, D)
    xs = x0.astype(jnp.int32)[:, :, None] + dd[None, None]
    ygrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, hl), 3)
    xgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, wl), 3)
    Wy = ((ygrid == ys[..., None]) * (1.0 - wy)[:, :, None, None]
          + (ygrid == ys[..., None] + 1) * wy[:, :, None, None])  # (B,N,D,Hl)
    Wx = ((xgrid == xs[..., None]) * (1.0 - wx)[:, :, None, None]
          + (xgrid == xs[..., None] + 1) * wx[:, :, None, None])  # (B,N,D,Wl)
    A = jnp.einsum("bnih,bhwn->bniw", Wy, corr)
    val = jnp.einsum("bniw,bnjw->bnij", A, Wx)                 # (B, N, D, D)
    return val.reshape(b, n, d * d).transpose(0, 2, 1)          # (B, D*D, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _lookup_level(f1: Array, f2l: Array, coords: Array, radius: int,
                  level_scale: float, interpret: bool) -> Array:
    b, n, c = f1.shape
    _, hl, wl, _ = f2l.shape
    m = hl * wl
    d = 2 * radius + 1
    cs = coords.astype(jnp.float32) / float(level_scale)
    cx, cy = cs[..., 0], cs[..., 1]

    npad = ((n + LANES - 1) // LANES) * LANES - n
    if npad:
        f1 = jnp.pad(f1, ((0, 0), (0, npad), (0, 0)))
        cx = jnp.pad(cx, ((0, 0), (0, npad)))
        cy = jnp.pad(cy, ((0, 0), (0, npad)))
    np_ = n + npad
    cx = cx.reshape(b, 1, np_)
    cy = cy.reshape(b, 1, np_)
    f2f = f2l.reshape(b, m, c)

    row_chunk = min(hl, max(1, 2048 // wl))  # ~2k-row slabs (<=1.1 MB f32)
    out = pl.pallas_call(
        functools.partial(_onthefly_kernel, radius=radius, hl=hl, wl=wl,
                          inv_sqrt_c=1.0 / float(c) ** 0.5,
                          row_chunk=row_chunk),
        grid=(b, np_ // LANES),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            # constant block index across i: stays VMEM-resident per batch
            pl.BlockSpec((1, m, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, d, LANES), lambda bi, i: (bi, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, d, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((row_chunk * wl, LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_ * m * c + 4 * b * np_ * m,
            bytes_accessed=b * (m * c + np_ * c) * f1.dtype.itemsize
            + b * d * d * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cy, cx, f1, f2f)
    return out.reshape(b, d * d, np_)[..., :n]


def _lookup_level_fwd(f1, f2l, coords, radius, level_scale, interpret):
    return (_lookup_level(f1, f2l, coords, radius, level_scale, interpret),
            (f1, f2l, coords))


def _lookup_level_bwd(radius, level_scale, interpret, res, g):
    f1, f2l, coords = res
    _, vjp_fn = jax.vjp(
        lambda a, b_, c_: _xla_reference_level(a, b_, c_, radius,
                                               float(level_scale)),
        f1, f2l, coords)
    df1, df2l, dcoords = vjp_fn(g.astype(jnp.float32))
    return (df1.astype(f1.dtype), df2l.astype(f2l.dtype),
            dcoords.astype(coords.dtype))


_lookup_level.defvjp(_lookup_level_fwd, _lookup_level_bwd)


def onthefly_lookup(f1: Array, f2_levels, coords: Array, radius: int = 4,
                    interpret: bool = False):
    """Full-pyramid on-the-fly correlation window lookup.

    :param f1: (B, H, W, C) frame-1 features (1/8 res)
    :param f2_levels: list of (B, Hl, Wl, C) from pool_fmap_pyramid
    :param coords: (B, H, W, 2) correspondence estimates (x, y), 1/8-res px
    :return: list of per-level (B, D*D, N) f32 correlation features
        (channel-first, dy-major window order; N = H*W row-major) — the same
        contract as pallas_lookup_lanewise.lanewise_lookup
    """
    b, h, w, c = f1.shape
    f1f = f1.reshape(b, h * w, c)
    cs = coords.reshape(b, h * w, 2)
    return [
        _lookup_level(f1f, f2l, cs, radius, float(2 ** lvl), interpret)
        for lvl, f2l in enumerate(f2_levels)
    ]
