"""Flow-based image warping (grid-sample) ops.

TPU-native rebuild of reference core/interpol/flow_utils.py:4-26 and the
bilinear sampler semantics of ``torch.nn.functional.grid_sample`` with
``align_corners=True`` and zero padding. NHWC layout: gathers fetch
contiguous C-channel pixel rows (minor-dim contiguous — the fast gather
orientation on TPU) and fuse into surrounding elementwise work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


import os as _os

if _os.environ.get("ROBUST_POSE_WARP_CHUNKED", "0") == "1":
    # chunk-serialized gathers (ops/gather.py): faster for the ISOLATED op,
    # but the serialization chain can block XLA from overlapping the warp
    # with surrounding compute inside the big fused tracking program —
    # measured net-negative for f2f streaming (34.3 -> 31.5 FPS), so the
    # warp path defaults to the single batched gather; the surfel pool
    # passes (standalone dependency chains) keep the chunked primitive
    from robust_pose_tpu.ops.gather import gather_rows_batched as _gather_rows
else:
    def _gather_rows(flat, idx):
        return jnp.take_along_axis(flat, idx[..., None], axis=1)


def _gather_pix(img: Array, ix: Array, iy: Array) -> Array:
    """Gather pixels at integer coords with zero padding.

    :param img: (B, H, W, C)
    :param ix, iy: (B, N) integer pixel coordinates
    :return: (B, N, C)
    """
    b, h, w, c = img.shape
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    flat = img.reshape(b, h * w, c)
    idx = iyc * w + ixc  # (B, N)
    out = _gather_rows(flat, idx)
    return out * inb[..., None]


def grid_sample(img: Array, coords_x: Array, coords_y: Array,
                mode: str = "bilinear") -> Array:
    """Sample ``img`` at fractional pixel coordinates with zero padding.

    :param img: (B, H, W, C)
    :param coords_x, coords_y: (B, N) pixel-space coordinates (not normalized)
    :param mode: 'bilinear' or 'nearest'
    :return: (B, N, C)
    """
    if mode == "nearest":
        # torch grid_sample nearest rounds half away from floor consistently;
        # jnp.floor(x + 0.5) matches its behaviour for positive coords
        ix = jnp.floor(coords_x + 0.5).astype(jnp.int32)
        iy = jnp.floor(coords_y + 0.5).astype(jnp.int32)
        return _gather_pix(img, ix, iy)

    b, h, w, c = img.shape
    x0f = jnp.floor(coords_x)
    y0f = jnp.floor(coords_y)
    wx = (coords_x - x0f)[..., None]
    wy = (coords_y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    if coords_x.shape[1] * 4 >= h * w:
        # query-dense: quad-packed single gather (all four corners arrive in
        # one contiguous row fetch; see warp_bilinear_nearest — gather fetch
        # count, not bytes, is what TPU warp cost scales with)
        rows = _quad_rows(img, x0, y0)                    # (B, N, 4c)
        v00 = rows[..., 0 * c:1 * c]
        v01 = rows[..., 1 * c:2 * c]
        v10 = rows[..., 2 * c:3 * c]
        v11 = rows[..., 3 * c:4 * c]
    else:
        # query-sparse (e.g. warp_then_eighth's 1/16 tap set): materializing
        # the (H+1)x(W+1)x4C quad image costs more HBM traffic than four
        # small gathers — fetch the corners directly
        v00 = _gather_pix(img, x0, y0)
        v01 = _gather_pix(img, x0 + 1, y0)
        v10 = _gather_pix(img, x0, y0 + 1)
        v11 = _gather_pix(img, x0 + 1, y0 + 1)
    v00 = v00 * _inb(x0, y0, w, h)[..., None]
    v01 = v01 * _inb(x0 + 1, y0, w, h)[..., None]
    v10 = v10 * _inb(x0, y0 + 1, w, h)[..., None]
    v11 = v11 * _inb(x0 + 1, y0 + 1, w, h)[..., None]
    return (
        v00 * (1.0 - wx) * (1.0 - wy)
        + v01 * wx * (1.0 - wy)
        + v10 * (1.0 - wx) * wy
        + v11 * wx * wy
    )


def _inb(ix, iy, w, h):
    return ((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h))


def _quad_rows(img: Array, x0: Array, y0: Array) -> Array:
    """Fetch the 2x2 patch with top-left (y0, x0) for every query as ONE
    row gather: quad[y, x] stacks the patch at (y-1, x-1) of the
    zero-bordered image, so all four corners arrive in a single contiguous
    row — gather fetches (not bytes) are what TPU warp cost scales with.

    :param img: (B, H, W, C)
    :param x0, y0: (B, N) int32 top-left corner coords (may be off-image;
        out-of-bounds corners return zeros via the border padding, callers
        still mask with ``_inb`` per corner)
    :return: (B, N, 4C) rows ordered [v00 | v01 | v10 | v11]
    """
    b, h, w, c = img.shape
    P = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [P[:, :-1, :-1], P[:, :-1, 1:], P[:, 1:, :-1], P[:, 1:, 1:]], axis=-1)
    xf = jnp.clip(x0 + 1, 0, w)
    yf = jnp.clip(y0 + 1, 0, h)
    return _gather_rows(quad.reshape(b, (h + 1) * (w + 1), 4 * c),
                        yf * (w + 1) + xf)


def warp_bilinear_nearest(x: Array, nearest_x: Array, flow: Array):
    """Fused warp: bilinear-sample ``x`` AND nearest-sample ``nearest_x`` at
    the flow-displaced coordinates, sharing the four corner row-gathers (the
    nearest pixel is always one of the four bilinear corners, so the nearest
    payload rides the same fetches as a packed extra channel).

    NOTE a 2x2-patch formulation via ``lax.gather(slice_sizes=(2, 2C))``
    lowers to a serialized loop on TPU (measured 564 ms vs 8 ms here) —
    take_along_axis row gathers are the only fast gather shape.

    :param x: (B, H, W, C) bilinear payload
    :param nearest_x: (B, H, W, Cn) nearest payload (or None)
    :return: (warped (B,H,W,C), valid (B,H,W,1),
              nearest_warped (B,H,W,Cn) | None, nearest_valid | None)
    — identical semantics to remap_from_flow / remap_from_flow_nearest.
    """
    b, h, w, c = x.shape
    cx, cy = _flow_target_coords(flow)
    packed = x if nearest_x is None else jnp.concatenate(
        [x, nearest_x.astype(x.dtype)], axis=-1)
    cp = packed.shape[-1]

    x0f = jnp.floor(cx)
    y0f = jnp.floor(cy)
    wx = (cx - x0f)[..., None]
    wy = (cy - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    rows = _quad_rows(packed, x0, y0)                    # (B, N, 4cp)

    v00 = rows[..., 0 * cp:1 * cp] * _inb(x0, y0, w, h)[..., None]
    v01 = rows[..., 1 * cp:2 * cp] * _inb(x0 + 1, y0, w, h)[..., None]
    v10 = rows[..., 2 * cp:3 * cp] * _inb(x0, y0 + 1, w, h)[..., None]
    v11 = rows[..., 3 * cp:4 * cp] * _inb(x0 + 1, y0 + 1, w, h)[..., None]

    bil = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    out = bil[..., :c].reshape(b, h, w, c)
    valid = jnp.any(out > 0, axis=-1, keepdims=True)
    if nearest_x is None:
        return out, valid, None, None

    # nearest: torch grid_sample 'nearest' = floor(coord + 0.5), which is
    # always one of the four fetched corners — select, don't re-gather
    right = (cx - x0f) >= 0.5   # floor(cx+0.5) == x0+1
    down = (cy - y0f) >= 0.5
    vtop = jnp.where(right[..., None], v01, v00)
    vbot = jnp.where(right[..., None], v11, v10)
    vn = jnp.where(down[..., None], vbot, vtop)
    cn = nearest_x.shape[-1]
    near = vn[..., c:].reshape(b, h, w, cn)
    near_valid = jnp.any(near > 0, axis=-1, keepdims=True)
    return out, valid, near, near_valid


@jax.custom_jvp
def _pack_mask_lsb(depth: Array, mask: Array) -> Array:
    """Hide a boolean in bit 0 of the f32 depth mantissa (payload packing for
    the single-channel warp gather). Perturbs depth by at most one ulp
    (<= 2^-24 relative for normalized depth in (0, 1]); differentiation
    treats the packing as identity in ``depth`` (exact to the same ulp)."""
    u = jax.lax.bitcast_convert_type(depth, jnp.uint32)
    u = (u & jnp.uint32(0xFFFFFFFE)) | mask.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


@_pack_mask_lsb.defjvp
def _pack_mask_lsb_jvp(primals, tangents):
    depth, mask = primals
    ddepth, _ = tangents
    return _pack_mask_lsb(depth, mask), ddepth


def _unpack_mask_lsb(packed: Array) -> Array:
    u = jax.lax.bitcast_convert_type(jax.lax.stop_gradient(packed),
                                     jnp.uint32)
    return (u & jnp.uint32(1)).astype(bool)


def warp_pcl_mask(depth: Array, mask: Array, flow: Array, intrinsics: Array):
    """Bilinear-warp the point cloud ``depth_to_pcl(depth, K)`` AND
    nearest-sample ``mask`` at the flow target coords — fetching ONE channel.

    Equivalent to ``warp_bilinear_nearest(depth_to_pcl(depth, K, coords),
    mask, flow)`` (up to one depth ulp and f32 summation order), but the
    gather payload is a single packed f32 instead of pcl(3) + mask(1):
    rays are AFFINE in pixel coords, so the interpolated point is

        sum_i w_i d_i K^-1 h_i  =  K^-1 ((x0+.5) D + Dx, (y0+.5) D + Dy, D)

    with D = sum w_i d_i, Dx/Dy the right/bottom-corner partial sums, and
    h_i the +0.5-centered homogeneous corner coords. TPU row-gather cost is
    flat up to 4 f32 per row and byte-bound beyond (measured ~19 ms vs
    ~63 ms per 8x(512x640) window for the 16-f32 quad rows this replaces),
    so shrinking the quad row 16 -> 4 f32 recovers the whole byte-bound
    overhang. The mask rides in the depth mantissa LSB (invalid depths are
    placeholder 1.0, never 0/NaN — see PoseNet.disparity_to_depth).

    :param depth: (B, H, W, 1) f32, positive (invalid pixels hold 1.0)
    :param mask: (B, H, W, 1) bool
    :param flow: (B, H, W, 2) pixel flow
    :param intrinsics: (B, 3, 3)
    :return: (pcl_w (B, H, W, 3) f32, mask_w (B, H, W, 1) bool) — the warped
        cloud (zero-padding semantics) and the nearest-sampled mask
        (False out of bounds)
    """
    b, h, w, _ = depth.shape
    packed = _pack_mask_lsb(depth.astype(jnp.float32),
                            mask).reshape(b, h, w, 1)

    cx, cy = _flow_target_coords(flow)
    x0f = jnp.floor(cx)
    y0f = jnp.floor(cy)
    wx = cx - x0f
    wy = cy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    rows = _quad_rows(packed, x0, y0)                     # (B, N, 4)
    d00 = rows[..., 0] * _inb(x0, y0, w, h)
    d01 = rows[..., 1] * _inb(x0 + 1, y0, w, h)
    d10 = rows[..., 2] * _inb(x0, y0 + 1, w, h)
    d11 = rows[..., 3] * _inb(x0 + 1, y0 + 1, w, h)

    w00 = (1.0 - wx) * (1.0 - wy)
    w01 = wx * (1.0 - wy)
    w10 = (1.0 - wx) * wy
    w11 = wx * wy
    D = w00 * d00 + w01 * d01 + w10 * d10 + w11 * d11     # sum w_i d_i
    Dx = w01 * d01 + w11 * d11                            # corners with dx=1
    Dy = w10 * d10 + w11 * d11                            # corners with dy=1

    sx = (x0f + 0.5) * D + Dx
    sy = (y0f + 0.5) * D + Dy
    s = jnp.stack([sx, sy, D], axis=-1)                   # (B, N, 3)
    kinv = jnp.linalg.inv(intrinsics)                     # (B, 3, 3)
    # explicit 3x3 application (elementwise f32; einsum would drop to the
    # MXU's bf16 default precision)
    pcl = (kinv[:, None, :, 0] * s[..., 0:1]
           + kinv[:, None, :, 1] * s[..., 1:2]
           + kinv[:, None, :, 2] * s[..., 2:3])
    pcl_w = pcl.reshape(b, h, w, 3)

    # nearest = floor(coord + 0.5): always one of the four fetched corners
    right = wx >= 0.5
    down = wy >= 0.5
    vtop = jnp.where(right, d01, d00)
    vbot = jnp.where(right, d11, d10)
    vn = jnp.where(down, vbot, vtop)
    mask_w = _unpack_mask_lsb(vn).reshape(b, h, w, 1)
    return pcl_w, mask_w


def _flow_target_coords(flow: Array):
    """Pixel coordinates displaced by flow: (B, N) x and y.

    Matches reference core/interpol/flow_utils.py:7-10 — integer base grid
    (no +0.5 offset) plus flow, which under align_corners=True normalization
    corresponds exactly to sampling at (col + flow_x, row + flow_y).
    """
    b, h, w, _ = flow.shape
    cols = jnp.arange(w, dtype=flow.dtype)
    rows = jnp.arange(h, dtype=flow.dtype)
    xg, yg = jnp.meshgrid(cols, rows, indexing="xy")
    cx = (xg[None] + flow[..., 0]).reshape(b, -1)
    cy = (yg[None] + flow[..., 1]).reshape(b, -1)
    return cx, cy


def warp_then_eighth(x: Array, flow: Array) -> Array:
    """Exact fusion of ``remap_from_flow`` + bilinear 1/8 downsampling.

    The half-pixel-centers 8x bilinear downsample (torch F.interpolate
    scale 0.125, align_corners=False — reference pose_net.py:110-113) reads
    the warped image ONLY at rows/cols {8i+3, 8i+4} with 0.5/0.5 weights, so
    the warp is evaluated at those tap positions — 1/16 of the full-res
    samples for channels that are consumed exclusively at 1/8 scale.

    :param x: (B, H, W, C); H, W divisible by 8
    :param flow: (B, H, W, 2) full-res flow
    :return: (B, H/8, W/8, C) == resize_eighth(remap_from_flow(x, flow)[0])
    """
    b, h, w, c = x.shape
    h8, w8 = h // 8, w // 8
    ft = flow.reshape(b, h8, 8, w8, 8, 2)[:, :, 3:5, :, 3:5]  # (B,h8,2,w8,2,2)
    rows = (8.0 * jnp.arange(h8, dtype=flow.dtype))[:, None] + jnp.asarray(
        [3.0, 4.0], flow.dtype)                                # (h8, 2)
    cols = (8.0 * jnp.arange(w8, dtype=flow.dtype))[:, None] + jnp.asarray(
        [3.0, 4.0], flow.dtype)
    cy = rows[None, :, :, None, None] + ft[..., 1]
    cx = cols[None, None, None, :, :] + ft[..., 0]
    out = grid_sample(x, cx.reshape(b, -1), cy.reshape(b, -1))
    return out.reshape(b, h8, 2, w8, 2, c).mean(axis=(2, 4))


def eighth_from_fullres_warp(x_w: Array) -> Array:
    """Bilinear 1/8 downsample of an ALREADY-warped full-res image by its
    exact tap decomposition (mean of rows/cols {8i+3, 8i+4})."""
    b, h, w, c = x_w.shape
    h8, w8 = h // 8, w // 8
    cells = x_w.reshape(b, h8, 8, w8, 8, c)[:, :, 3:5, :, 3:5]
    return cells.mean(axis=(2, 4))


def remap_from_flow(x: Array, flow: Array):
    """Warp ``x`` by sampling at flow-displaced coordinates (bilinear).

    :param x: (B, H, W, C)
    :param flow: (B, H, W, 2) in pixels, channel 0 = x displacement
    :return: (warped (B, H, W, C), valid (B, H, W, 1))
    (reference core/interpol/flow_utils.py:4-14; validity = any channel > 0)
    """
    out, valid, _, _ = warp_bilinear_nearest(x, None, flow)
    return out, valid


def remap_from_flow_nearest(x: Array, flow: Array):
    """Nearest-neighbour variant (reference core/interpol/flow_utils.py:17-26)."""
    b, h, w, c = x.shape
    cx, cy = _flow_target_coords(flow)
    out = grid_sample(x.astype(jnp.float32), cx, cy,
                      mode="nearest").reshape(b, h, w, c)
    valid = jnp.any(out > 0, axis=-1, keepdims=True)
    return out, valid
