"""Pallas TPU kernel: RAFT correlation-window lookup.

The hot op of the tracking step (SURVEY.md §2 native-code inventory:
the reference's optional ``alt_cuda_corr`` CUDA extension). XLA lowers every
pure-XLA formulation of the per-pixel bilinear window lookup — element
gathers, batched dynamic slices, one-hot matmuls (de-sugared by the
algebraic simplifier) — into gather loops costing tens of ms per step at
512x640. This kernel instead:

* streams the correlation volume through VMEM in contiguous pixel blocks
  (one large DMA per block, double-buffered by the Pallas pipeline),
* per pixel, contracts the (Hl, Wl) VMEM-resident correlation image against
  iota-built bilinear ROW weights (D, Hl) and COLUMN weights (D, Wl) on the
  MXU/VPU: ``out = W_row @ corr_img @ W_col^T``,
* out-of-bounds corners never match the iota compare, reproducing torch
  grid_sample zeros-padding semantics exactly (partial corners included) —
  no padding, masking, or dynamic slicing anywhere.

Verified against lookup_corr_gather in tests (interpret mode bit-exact; on
TPU within bf16 MXU rounding).

Measured on one v5e chip (12 chained lookups at 512x640, bf16 volume):
per-pixel kernel 49 ms, grouped kernel 35 ms, XLA one-hot matmul path 33 ms
standalone — and the XLA path overlaps better inside the full pipelined
tracking step (89 ms vs 106 ms), so it remains the default
(``config["pallas_lookup"] = True`` switches to the grouped kernel).
Next iteration idea: bounded-flow halo tiles computing correlation on the
fly (f1-tile @ f2-halo per 8x128 tile, alt_cuda_corr style), which removes
the per-pixel irregularity entirely.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

RADIUS = 4
D = 2 * RADIUS + 1   # window size (9)
BLOCK = 128          # pixels per program


def _lookup_kernel(y0_ref, x0_ref, wy_ref, wx_ref, corr_ref, out_ref):
    """One block of BLOCK pixels; corr_ref: (BLOCK, Hl, Wl) VMEM,
    out_ref: (BLOCK, D, D). Scalar refs are full arrays (scalar prefetch)."""
    _, hl, wl = corr_ref.shape
    base = pl.program_id(0) * BLOCK

    def body(j, _):
        y0 = y0_ref[base + j]
        x0 = x0_ref[base + j]
        wy = wy_ref[base + j]
        wx = wx_ref[base + j]

        img = corr_ref[j].astype(jnp.float32)                     # (Hl, Wl)

        # bilinear row weights at one-hot positions (D, Hl); rows outside
        # [0, Hl) never match -> zero contribution (grid_sample zeros)
        dyi = jax.lax.broadcasted_iota(jnp.int32, (D, hl), 0)
        ygi = jax.lax.broadcasted_iota(jnp.int32, (D, hl), 1)
        ty = y0 + dyi
        wrow = (jnp.where(ygi == ty, 1.0 - wy, 0.0)
                + jnp.where(ygi == ty + 1, wy, 0.0))

        ry = jax.lax.dot_general(
            wrow, img, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                          # (D, Wl)

        dxi = jax.lax.broadcasted_iota(jnp.int32, (D, wl), 0)
        xgi = jax.lax.broadcasted_iota(jnp.int32, (D, wl), 1)
        tx = x0 + dxi
        wcol = (jnp.where(xgi == tx, 1.0 - wx, 0.0)
                + jnp.where(xgi == tx + 1, wx, 0.0))               # (D, Wl)

        # out[i, k] = sum_x ry[i, x] * wcol[k, x]
        vals = jax.lax.dot_general(
            ry, wcol, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                          # (D, D)
        out_ref[j, :, :] = vals
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_lookup_level(corr: Array, coords: Array, interpret: bool = False
                        ) -> Array:
    """Bilinear window lookup for one pyramid level.

    :param corr: (M, Hl, Wl) per-pixel correlation images (M = B*N)
    :param coords: (M, 2) sample centers (x, y) in this level's pixels
    :return: (M, D*D) f32 window values
    """
    m, hl, wl = corr.shape
    cx, cy = coords[:, 0], coords[:, 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx = (cx - x0).astype(jnp.float32)
    wy = (cy - y0).astype(jnp.float32)
    y0i = y0.astype(jnp.int32) - RADIUS
    x0i = x0.astype(jnp.int32) - RADIUS

    # pad pixel count to a BLOCK multiple
    mp = ((m + BLOCK - 1) // BLOCK) * BLOCK
    pad_m = mp - m
    corr_p = jnp.pad(corr, ((0, pad_m), (0, 0), (0, 0)))
    y0i = jnp.pad(y0i, (0, pad_m))
    x0i = jnp.pad(x0i, (0, pad_m))
    wy = jnp.pad(wy, (0, pad_m))
    wx = jnp.pad(wx, (0, pad_m))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(mp // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, hl, wl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, D, D), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _lookup_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, D, D), jnp.float32),
        interpret=interpret,
    )(y0i, x0i, wy, wx, corr_p)
    return out[:m].reshape(m, D * D)


def pallas_lookup_pyramid(pyramid, coords: Array, interpret: bool = False):
    """Full 4-level lookup. :param coords: (B, H, W, 2); returns per-level
    list of (B, H, W, D*D) f32 (matches lookup_corr(as_list=True))."""
    b, h, w, _ = coords.shape
    n = h * w
    outs = []
    for lvl, corr in enumerate(pyramid):
        bq, nq, hl, wl = corr.shape
        c = (coords.reshape(b * n, 2) / (2 ** lvl))
        v = pallas_lookup_level(corr.reshape(b * n, hl, wl), c,
                                interpret=interpret)
        outs.append(v.reshape(b, h, w, D * D))
    return outs


# ---------------------------------------------------------------------------
# grouped variant: 8 pixels per MXU matmul via block-diagonal weights
# ---------------------------------------------------------------------------

GROUP = 8


def _lookup_kernel_grouped(y0_ref, x0_ref, wy_ref, wx_ref, corr_ref, out_ref,
                           wrow_scr, rybd_scr, wcol_scr):
    """Like _lookup_kernel but contracts GROUP pixels per matmul:
    a (GROUP*D, GROUP*Hl) block-diagonal row-weight matrix against the
    group's stacked images (GROUP*Hl, Wl), then a second block-diagonal
    contraction for columns. 8x fewer MXU issues than the per-pixel loop."""
    _, hl, wl = corr_ref.shape
    base = pl.program_id(0) * BLOCK

    def group_body(g, _):
        j0 = g * GROUP
        imgs = corr_ref[pl.ds(j0, GROUP)].astype(jnp.float32)  # (G, Hl, Wl)
        imgs2 = imgs.reshape(GROUP * hl, wl)

        wrow_scr[...] = jnp.zeros_like(wrow_scr)
        wcol_scr[...] = jnp.zeros_like(wcol_scr)
        for jj in range(GROUP):  # unrolled: static slice writes
            y0 = y0_ref[base + j0 + jj]
            x0 = x0_ref[base + j0 + jj]
            wy = wy_ref[base + j0 + jj]
            wx = wx_ref[base + j0 + jj]
            dyi = jax.lax.broadcasted_iota(jnp.int32, (D, hl), 0)
            ygi = jax.lax.broadcasted_iota(jnp.int32, (D, hl), 1)
            ty = y0 + dyi
            wrow_scr[jj * D:(jj + 1) * D, jj * hl:(jj + 1) * hl] = (
                jnp.where(ygi == ty, 1.0 - wy, 0.0)
                + jnp.where(ygi == ty + 1, wy, 0.0))
            dxi = jax.lax.broadcasted_iota(jnp.int32, (wl, D), 1)
            xgi = jax.lax.broadcasted_iota(jnp.int32, (wl, D), 0)
            tx = x0 + dxi
            wcol_scr[jj * wl:(jj + 1) * wl, :] = (
                jnp.where(xgi == tx, 1.0 - wx, 0.0)
                + jnp.where(xgi == tx + 1, wx, 0.0))

        ry = jax.lax.dot_general(
            wrow_scr[...], imgs2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (G*D, Wl)

        # second stage: block-diagonalize ry rows then one matmul
        rybd_scr[...] = jnp.zeros_like(rybd_scr)
        for jj in range(GROUP):
            rybd_scr[jj * D:(jj + 1) * D, jj * wl:(jj + 1) * wl] = (
                ry[jj * D:(jj + 1) * D, :])
        vals = jax.lax.dot_general(
            rybd_scr[...], wcol_scr[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (G*D, D)
        out_ref[pl.ds(j0, GROUP), :, :] = vals.reshape(GROUP, D, D)
        return 0

    jax.lax.fori_loop(0, BLOCK // GROUP, group_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_lookup_level_grouped(corr: Array, coords: Array,
                                interpret: bool = False) -> Array:
    """Grouped-matmul variant of pallas_lookup_level (same contract)."""
    m, hl, wl = corr.shape
    cx, cy = coords[:, 0], coords[:, 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx = (cx - x0).astype(jnp.float32)
    wy = (cy - y0).astype(jnp.float32)
    y0i = y0.astype(jnp.int32) - RADIUS
    x0i = x0.astype(jnp.int32) - RADIUS

    mp = ((m + BLOCK - 1) // BLOCK) * BLOCK
    pad_m = mp - m
    corr_p = jnp.pad(corr, ((0, pad_m), (0, 0), (0, 0)))
    y0i = jnp.pad(y0i, (0, pad_m))
    x0i = jnp.pad(x0i, (0, pad_m))
    wy = jnp.pad(wy, (0, pad_m))
    wx = jnp.pad(wx, (0, pad_m))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(mp // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, hl, wl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, D, D), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((GROUP * D, GROUP * hl), jnp.float32),
            pltpu.VMEM((GROUP * D, GROUP * wl), jnp.float32),
            pltpu.VMEM((GROUP * wl, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _lookup_kernel_grouped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, D, D), jnp.float32),
        interpret=interpret,
    )(y0i, x0i, wy, wx, corr_p)
    return out[:m].reshape(m, D * D)


def pallas_lookup_pyramid_grouped(pyramid, coords: Array,
                                  interpret: bool = False):
    b, h, w, _ = coords.shape
    n = h * w
    outs = []
    for lvl, corr in enumerate(pyramid):
        bq, nq, hl, wl = corr.shape
        c = (coords.reshape(b * n, 2) / (2 ** lvl))
        v = pallas_lookup_level_grouped(corr.reshape(b * n, hl, wl), c,
                                        interpret=interpret)
        outs.append(v.reshape(b, h, w, D * D))
    return outs
