"""Pallas TPU kernel: fused normal-equation build for the GN/LM pose solver.

The LM forward solve (solver/gauss_newton.py, reference hot loop B —
core/pose/pose_head.py:60-79) evaluates, at every one of its ~20 iterations,
the weighted residuals of BOTH objective terms plus their analytic Jacobians,
and reduces them to H = J^T W J (6x6), g = J^T W r (6,) and the scalar cost.
The XLA formulation materializes J2 (B,N,2,6) and J3 (B,N,3,6) in HBM and
reduces them with batched einsums — ~200 MB of traffic per iteration,
~14 ms/solve at 512x640.

This kernel fuses the whole iteration: it streams the (loop-invariant,
pre-transposed) per-pixel planes once, computes residuals + Jacobian rows in
registers, and accumulates the 43 reduction scalars (21 unique H entries, 6 g
entries, cost, for both terms' structure folded together) across pixel blocks
directly in VMEM. Per-iteration HBM traffic drops to the ~15 MB of input
planes; everything else is VPU arithmetic.

Layout contract: planes are channel-major ``(B, C, N)`` with N (pixels,
row-major) on the lane dimension, padded to a multiple of 128 with
weight/mask = 0 so padding contributes nothing. The transpose is paid ONCE
per solve (outside the iteration loop), not per iteration.

Math (identical to solver/gauss_newton._residuals_and_jacobians):
  pp   = R(q) p1 + t                     (left tangent at ``pose``)
  2D:  pi = proj(K pp), r2 = pi - (img_coords + flow)
       J2 = [M | (pp x M_row)],  M = (K[:2] - pi K[2]) / z
       c2 = lw[1] * w1 * valid2 / (N * H * W)
  3D:  r3 = pp - p2, J3 = [I | (pp x e_i)], c3 = lw[0] * w2 * valid3 / N
  H = sum c2 J2^T J2 + c3 J3^T J3, g = sum c2 J2^T r2 + c3 J3^T r3,
  cost = sum c2 |r2|^2 + c3 |r3|^2
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
BLOCK_N = 2048  # pixels per kernel program (16 sublanes x 128 lanes)


def _quat_rotate_rows(q, px, py, pz):
    """Rotate row-vectors (3 separate (S, L) planes) by quaternion q (4,)."""
    qx, qy, qz, qw = q[0], q[1], q[2], q[3]
    # t = 2 * (qv x p)
    tx = 2.0 * (qy * pz - qz * py)
    ty = 2.0 * (qz * px - qx * pz)
    tz = 2.0 * (qx * py - qy * px)
    # p' = p + qw * t + qv x t
    ox = px + qw * tx + (qy * tz - qz * ty)
    oy = py + qw * ty + (qz * tx - qx * tz)
    oz = pz + qw * tz + (qx * ty - qy * tx)
    return ox, oy, oz


def _normal_eq_kernel(pose_ref, kmat_ref, lw_ref, planes_ref, out_ref, *,
                      h: int, w: int, n_pix: int):
    """One (batch, pixel-block) program.

    pose_ref: (B, 8) f32 SMEM — [tx ty tz qx qy qz qw, pad] (full array;
        TPU SMEM blocks can't tile the batch dim, rows indexed by program id)
    kmat_ref: (B, 4) f32 SMEM — [fx fy cx cy]
    lw_ref:   (B, 2) f32 SMEM — loss_weight [w3d, w2d]
    planes_ref: (1, 12, S, LANES) f32 — channel-major pixel planes:
        0-2 pcl1 xyz, 3-5 pcl2 xyz, 6-7 flow xy, 8 w1*mask1, 9 w2*mask13
        (w2 pre-multiplied with mask1&mask2), 10 mask1 (1.0/0.0), 11 unused
    out_ref: (1, 1, 64) f32 — accumulated [H(21 upper-tri), g(6), cost, pad]
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((64,), jnp.float32)

    s = planes_ref.shape[2]
    tx_, ty_, tz_ = pose_ref[bi, 0], pose_ref[bi, 1], pose_ref[bi, 2]
    q = (pose_ref[bi, 3], pose_ref[bi, 4], pose_ref[bi, 5], pose_ref[bi, 6])
    fx, fy = kmat_ref[bi, 0], kmat_ref[bi, 1]
    cx, cy = kmat_ref[bi, 2], kmat_ref[bi, 3]
    lw3, lw2 = lw_ref[bi, 0], lw_ref[bi, 1]

    p1x = planes_ref[0, 0]
    p1y = planes_ref[0, 1]
    p1z = planes_ref[0, 2]
    ppx, ppy, ppz = _quat_rotate_rows(q, p1x, p1y, p1z)
    ppx = ppx + tx_
    ppy = ppy + ty_
    ppz = ppz + tz_

    # ---- 2D reprojection term -------------------------------------------
    az = jnp.maximum(fx * 0.0 + ppz, 1e-12)          # clip z
    inv_z = 1.0 / az
    pix = (fx * ppx + cx * ppz) * inv_z
    piy = (fy * ppy + cy * ppz) * inv_z

    # pixel index -> (col, row) of the row-major flattened image, with the
    # +0.5 pixel-center offset (ops/geometry.create_img_coords — reference
    # core/geometry/pinhole_transforms.py:7-19)
    flat = (i * BLOCK_N
            + LANES * jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 1))
    col = (flat % w).astype(jnp.float32) + 0.5
    row = ((flat // w) % h).astype(jnp.float32) + 0.5
    fox = col + planes_ref[0, 6]
    foy = row + planes_ref[0, 7]
    r2x = pix - fox
    r2y = piy - foy

    in_pix = (flat < n_pix).astype(jnp.float32)
    valid2 = ((fox > 0) & (foy > 0) & (fox < w) & (foy < h)).astype(jnp.float32)
    c2 = (lw2 / (float(n_pix) * h * w)) * planes_ref[0, 8] * valid2 * in_pix

    # M = (K[:2] - pi (x) K[2]) / z with K = [[fx,0,cx],[0,fy,cy],[0,0,1]]:
    #   m0 = (fx, 0, cx - pix) / z ;  m1 = (0, fy, cy - piy) / z
    m00 = fx * inv_z
    m02 = (cx - pix) * inv_z
    m11 = fy * inv_z
    m12 = (cy - piy) * inv_z
    # J2 row 0 = [m00, 0, m02 | pp x m0] ; row 1 = [0, m11, m12 | pp x m1]
    # pp x m0 = (ppy*m02 - ppz*0, ppz*m00 - ppx*m02, ppx*0 - ppy*m00)
    a3 = ppy * m02
    a4 = ppz * m00 - ppx * m02
    a5 = -ppy * m00
    # pp x m1 = (ppy*m12 - ppz*m11, -ppx*m12, ppx*m11)
    b3 = ppy * m12 - ppz * m11
    b4 = -ppx * m12
    b5 = ppx * m11

    # ---- 3D point-to-point term -----------------------------------------
    r3x = ppx - planes_ref[0, 3]
    r3y = ppy - planes_ref[0, 4]
    r3z = ppz - planes_ref[0, 5]
    c3 = (lw3 / float(n_pix)) * planes_ref[0, 9] * in_pix

    # J3 rows: [1 0 0 | 0  ppz -ppy], [0 1 0 | -ppz 0 ppx], [0 0 1 | ppy -ppx 0]
    # (row_i = [e_i | pp x e_i])

    # ---- accumulate H (21 upper-tri), g (6), cost ------------------------
    j2 = (
        (m00, 0.0, m02, a3, a4, a5),
        (0.0, m11, m12, b3, b4, b5),
    )
    j3 = (
        (1.0, 0.0, 0.0, 0.0, ppz, -ppy),
        (0.0, 1.0, 0.0, -ppz, 0.0, ppx),
        (0.0, 0.0, 1.0, ppy, -ppx, 0.0),
    )
    r2 = (r2x, r2y)
    r3 = (r3x, r3y, r3z)

    acc = []

    def _scalar(x):
        return jnp.sum(x)

    ones = jnp.ones_like(ppx)

    def _term(jrows, rres, c):
        # returns lists of 21 H terms, 6 g terms, 1 cost term
        hs, gs = [], []
        for a in range(6):
            for b_ in range(a, 6):
                t = 0.0
                for row in jrows:
                    ja = row[a]
                    jb = row[b_]
                    if isinstance(ja, float) or isinstance(jb, float):
                        if isinstance(ja, float) and isinstance(jb, float):
                            t = t + (ja * jb) * c if ja * jb != 0.0 else t
                            continue
                        if isinstance(ja, float):
                            t = t + ja * jb * c if ja != 0.0 else t
                            continue
                        t = t + jb * ja * c if jb != 0.0 else t
                        continue
                    t = t + ja * jb * c
                hs.append(_scalar(t * ones) if isinstance(t, float) else
                          _scalar(t))
        for a in range(6):
            t = 0.0
            for row, r in zip(jrows, rres):
                ja = row[a]
                if isinstance(ja, float):
                    if ja != 0.0:
                        t = t + ja * r * c
                    continue
                t = t + ja * r * c
            gs.append(_scalar(t * ones) if isinstance(t, float) else
                      _scalar(t))
        cost = _scalar((sum(r * r for r in rres)) * c)
        return hs, gs, cost

    h2, g2, cost2 = _term(j2, r2, c2)
    h3, g3, cost3 = _term(j3, r3, c3)

    vals = ([a + b_ for a, b_ in zip(h2, h3)]
            + [a + b_ for a, b_ in zip(g2, g3)]
            + [cost2 + cost3])
    upd = jnp.stack(vals)  # (28,)
    pad = jnp.zeros((64 - 28,), jnp.float32)
    out_ref[0, 0] = out_ref[0, 0] + jnp.concatenate([upd, pad])


_TRI = [(a, b) for a in range(6) for b in range(a, 6)]


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def normal_equations_pallas(pose: Array, planes: Array, kvec: Array,
                            loss_weight: Array, h: int, w: int,
                            interpret: bool = False):
    """Fused H/g/cost build.

    :param pose: (B, 7) SE(3) vec
    :param planes: (B, 12, S, 128) f32 pre-transposed pixel planes (see
        ``pack_planes``)
    :param kvec: (B, 4) [fx, fy, cx, cy]
    :param loss_weight: (B, 2)
    :return: H (B, 6, 6), g (B, 6), cost (B,)
    """
    b = pose.shape[0]
    s = planes.shape[2]
    n_pix = h * w
    pose_p = jnp.pad(pose.astype(jnp.float32), ((0, 0), (0, 1)))
    grid_n = (s * LANES) // BLOCK_N
    sub = BLOCK_N // LANES

    out = pl.pallas_call(
        functools.partial(_normal_eq_kernel, h=h, w=w, n_pix=n_pix),
        grid=(b, grid_n),
        in_specs=[
            # scalar params ride as FULL arrays (SMEM blocks can't tile the
            # batch dim on TPU: block (1, k) vs array (B, k) is rejected for
            # B > 1); the kernel indexes rows by program id
            pl.BlockSpec((b, 8), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 4), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 2), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 12, sub, LANES), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 64), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 64), jnp.float32),
        interpret=interpret,
    )(pose_p, kvec.astype(jnp.float32), loss_weight.astype(jnp.float32),
      planes)

    flat = out[:, 0]
    H = jnp.zeros((b, 6, 6), jnp.float32)
    for idx, (a, b_) in enumerate(_TRI):
        H = H.at[:, a, b_].set(flat[:, idx])
        if a != b_:
            H = H.at[:, b_, a].set(flat[:, idx])
    g = flat[:, 21:27]
    cost = flat[:, 27]
    return H, g, cost


def pack_planes(xs, h: int, w: int) -> tuple[Array, Array]:
    """Transpose the solver inputs once into the kernel's channel-major
    layout (B, 12, S, 128); returns (planes, kvec).

    ``xs`` is a solver.objectives.PoseProblemInputs (NHWC)."""
    b = xs.flow.shape[0]
    n = h * w
    npad = ((n + BLOCK_N - 1) // BLOCK_N) * BLOCK_N - n
    m13 = (xs.mask1 & xs.mask2).astype(jnp.float32)
    chans = jnp.concatenate([
        xs.pcl1.astype(jnp.float32),
        xs.pcl2.astype(jnp.float32),
        xs.flow.astype(jnp.float32),
        xs.weights1.astype(jnp.float32) * xs.mask1.astype(jnp.float32),
        xs.weights2.astype(jnp.float32) * m13,
        xs.mask1.astype(jnp.float32),
        jnp.zeros_like(m13),
    ], axis=-1)                                   # (B, H, W, 12)
    planes = chans.reshape(b, n, 12).transpose(0, 2, 1)
    if npad:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, npad)))
    planes = planes.reshape(b, 12, (n + npad) // LANES, LANES)
    kvec = jnp.stack([xs.intrinsics[:, 0, 0], xs.intrinsics[:, 1, 1],
                      xs.intrinsics[:, 0, 2], xs.intrinsics[:, 1, 2]], axis=-1)
    return planes, kvec
