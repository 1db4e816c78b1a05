"""Patch-gather warp (one lax.gather of the 2x2 bilinear patch per sample)
vs the 4-corner grid_sample oracle — exact equivalence including borders,
far out-of-bounds flows, and the fused nearest-mask path."""
import jax
import jax.numpy as jnp
import numpy as np

from robust_pose_tpu.ops.warp import (
    _flow_target_coords,
    grid_sample,
    remap_from_flow,
    remap_from_flow_nearest,
    warp_bilinear_nearest,
)

H, W, C = 24, 31, 5


def _oracle_bilinear(x, flow):
    b, h, w, c = x.shape
    cx, cy = _flow_target_coords(flow)
    out = grid_sample(x, cx, cy, mode="bilinear").reshape(b, h, w, c)
    return out, jnp.any(out > 0, axis=-1, keepdims=True)


def _oracle_nearest(x, flow):
    b, h, w, c = x.shape
    cx, cy = _flow_target_coords(flow)
    out = grid_sample(x.astype(jnp.float32), cx, cy,
                      mode="nearest").reshape(b, h, w, c)
    return out, jnp.any(out > 0, axis=-1, keepdims=True)


def _flows():
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    return [
        2.5 * jax.random.normal(k[0], (2, H, W, 2)),            # small
        60.0 * jax.random.normal(k[1], (2, H, W, 2)),           # mostly OOB
        jnp.zeros((2, H, W, 2)),                                # identity
        # exact-integer displacements incl. the +0.5 rounding boundary
        jnp.round(8.0 * jax.random.normal(k[2], (2, H, W, 2))) + 0.5,
    ]


def test_remap_from_flow_matches_oracle():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, H, W, C))
    for flow in _flows():
        ref, ref_valid = _oracle_bilinear(x, flow)
        got, got_valid = remap_from_flow(x, flow)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got_valid, ref_valid)


def test_remap_nearest_matches_oracle():
    x = (jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 1)) > 0.4
         ).astype(jnp.float32)
    for flow in _flows():
        ref, ref_valid = _oracle_nearest(x, flow)
        got, got_valid = remap_from_flow_nearest(x, flow)
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got_valid, ref_valid)


def test_warp_then_eighth_matches_warp_plus_resize():
    """Tap-decomposed warp+downsample vs dense warp followed by the 8x
    bilinear resize (half-pixel centers): exact up to fp association."""
    from robust_pose_tpu.ops.warp import (eighth_from_fullres_warp,
                                          warp_then_eighth)

    h, w, c = 48, 64, 5
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, h, w, c))
    for flow in [3.0 * jax.random.normal(jax.random.PRNGKey(8), (2, h, w, 2)),
                 40.0 * jax.random.normal(jax.random.PRNGKey(9), (2, h, w, 2))]:
        dense, _ = remap_from_flow(x, flow)
        ref = jax.image.resize(dense, (2, h // 8, w // 8, c), method="linear",
                               antialias=False)
        got = warp_then_eighth(x, flow)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        got2 = eighth_from_fullres_warp(dense)
        np.testing.assert_allclose(got2, ref, rtol=1e-5, atol=1e-6)


def test_fused_bilinear_nearest_matches_separate():
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, H, W, C))
    m = (jax.random.uniform(jax.random.PRNGKey(4), (2, H, W, 1)) > 0.3
         ).astype(jnp.float32)
    for flow in _flows():
        ref_b, ref_bv = _oracle_bilinear(x, flow)
        ref_n, ref_nv = _oracle_nearest(m, flow)
        got_b, got_bv, got_n, got_nv = warp_bilinear_nearest(x, m, flow)
        np.testing.assert_allclose(got_b, ref_b, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got_bv, ref_bv)
        np.testing.assert_array_equal(got_n, ref_n)
        np.testing.assert_array_equal(got_nv, ref_nv)


def test_warp_pcl_mask_matches_dense_pcl_warp():
    """Single-channel depth-moment warp vs warping the materialized cloud:
    pcl within fp tolerance (rays are affine in pixel coords, so the two
    differ only in f32 summation order + one packed-mask ulp of depth);
    nearest mask bit-exact. Gradients: d(warp)/d(flow) must match the dense
    path (the LSB pack differentiates as identity)."""
    from robust_pose_tpu.ops.geometry import create_img_coords, depth_to_pcl
    from robust_pose_tpu.ops.warp import warp_pcl_mask

    K = jnp.asarray([[[40.0, 0.0, W / 2], [0.0, 40.0, H / 2],
                      [0.0, 0.0, 1.0]]])
    K = jnp.broadcast_to(K, (2, 3, 3))
    coords = create_img_coords(H, W)
    depth = 0.05 + 0.95 * jax.random.uniform(jax.random.PRNGKey(5),
                                             (2, H, W, 1))
    mask = jax.random.uniform(jax.random.PRNGKey(6), (2, H, W, 1)) > 0.3
    pcl = depth_to_pcl(depth, K, coords)
    for flow in _flows():
        ref_pcl, _, ref_m, ref_mv = warp_bilinear_nearest(
            pcl, mask.astype(jnp.float32), flow)
        got_pcl, got_m = warp_pcl_mask(depth, mask, flow, K)
        np.testing.assert_allclose(got_pcl, ref_pcl, rtol=2e-5, atol=1e-5)
        np.testing.assert_array_equal(got_m, ref_mv & (ref_m > 0))

    flow = _flows()[0]

    def f_dense(fl):
        out, _, _, _ = warp_bilinear_nearest(pcl, mask.astype(jnp.float32), fl)
        return jnp.sum(out * jnp.cos(out))

    def f_packed(fl):
        out, _ = warp_pcl_mask(depth, mask, fl, K)
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(f_dense)(flow)
    g_got = jax.grad(f_packed)(flow)
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-3, atol=1e-4)
