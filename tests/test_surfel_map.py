"""Surfel-map fusion/render tests on synthetic frames."""
import jax
import jax.numpy as jnp
import numpy as np

from robust_pose_tpu import se3
from robust_pose_tpu.slam.frame import make_frame
from robust_pose_tpu.slam.surfel_map import (
    SurfelConfig,
    surfel_create,
    surfel_fuse,
    surfel_render,
    surfel_transform,
    stable_points,
)

H, W = 32, 40
N = H * W


def _kmat():
    return jnp.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]])


def _frame(key, depth_val=100.0):
    img = 255.0 * jax.random.uniform(key, (1, 3, H, W))
    depth = jnp.full((1, 1, H, W), depth_val)
    return make_frame(img, depth=depth)


def test_create_counts_and_confidence():
    cfg = SurfelConfig(capacity=4 * N, img_shape=(H, W))
    f = _frame(jax.random.PRNGKey(0))
    st = surfel_create(f, _kmat(), cfg)
    assert int(jnp.sum(st.active)) == N
    # initial confidence normalized by conf_thr (reference surfel_map.py:64)
    np.testing.assert_allclose(st.conf[: N], 1.0 / 7.0, rtol=1e-6)


def test_fuse_same_view_updates_not_appends():
    """Re-observing the identical frame must match every surfel (no growth)
    and raise confidence (reference surfel_map.py:117-125)."""
    cfg = SurfelConfig(capacity=4 * N, img_shape=(H, W))
    f = _frame(jax.random.PRNGKey(0))
    st = surfel_create(f, _kmat(), cfg)
    ident = se3.identity(())
    st2 = surfel_fuse(st, f, ident, _kmat(), cfg)
    assert int(jnp.sum(st2.active)) == N, "same view must not append points"
    np.testing.assert_allclose(st2.conf[:N], 2.0 / 7.0, rtol=1e-5)
    assert int(st2.n_dropped) == 0


def test_fuse_convergence_to_stable():
    cfg = SurfelConfig(capacity=4 * N, img_shape=(H, W))
    f = _frame(jax.random.PRNGKey(0))
    st = surfel_create(f, _kmat(), cfg)
    ident = se3.identity(())
    fuse = jax.jit(surfel_fuse, static_argnums=4)
    for _ in range(8):
        st = fuse(st, f, ident, _kmat(), cfg)
    # 9 observations > conf_thr=7 -> all stable
    assert int(jnp.sum(stable_points(st))) == N


def test_fuse_prunes_unstable_old_points():
    """Points seen once then never matched again are pruned after t_max
    (reference surfel_map.py:150-158)."""
    cfg = SurfelConfig(capacity=8 * N, img_shape=(H, W), t_max=3)
    f = _frame(jax.random.PRNGKey(0), depth_val=100.0)
    st = surfel_create(f, _kmat(), cfg)
    # subsequent frames at very different depth -> depth filter rejects match,
    # so old surfels never gain confidence and new points append each frame
    f_far = _frame(jax.random.PRNGKey(1), depth_val=500.0)
    ident = se3.identity(())
    fuse = jax.jit(surfel_fuse, static_argnums=4)
    for _ in range(5):
        st = fuse(st, f_far, ident, _kmat(), cfg)
    # original frame's surfels (t_created=0, conf<1) must be gone
    assert int(jnp.sum(st.active & (st.t_created == 0))) == 0


def test_render_roundtrip():
    """Rendering the map created from a frame reproduces its depth/colors."""
    cfg = SurfelConfig(capacity=2 * N, img_shape=(H, W))
    f = _frame(jax.random.PRNGKey(2), depth_val=120.0)
    st = surfel_create(f, _kmat(), cfg)
    rendered = surfel_render(st, _kmat(), cfg)
    # interior pixels project straight back (boundary quantization aside)
    np.testing.assert_allclose(
        np.asarray(rendered.depth[0, 0, 2:-2, 2:-2]), 120.0, rtol=1e-3
    )
    err = np.abs(
        np.asarray(rendered.img[0, :, 2:-2, 2:-2])
        - np.asarray(f.img[0, :, 2:-2, 2:-2])
    )
    assert np.median(err) < 1e-2


def test_transform_moves_points():
    cfg = SurfelConfig(capacity=2 * N, img_shape=(H, W))
    f = _frame(jax.random.PRNGKey(3))
    st = surfel_create(f, _kmat(), cfg)
    tr = se3.exp(jnp.array([10.0, 0, 0, 0, 0, 0]))
    st2 = surfel_transform(st, tr)
    np.testing.assert_allclose(st2.opts[:N, 0], st.opts[:N, 0] + 10.0, rtol=1e-5)


def test_capacity_overflow_counts_drops():
    cfg = SurfelConfig(capacity=N + 16, img_shape=(H, W), t_max=1000)
    f = _frame(jax.random.PRNGKey(0), depth_val=100.0)
    st = surfel_create(f, _kmat(), cfg)
    f_far = _frame(jax.random.PRNGKey(1), depth_val=500.0)
    st = surfel_fuse(st, f_far, se3.identity(()), _kmat(), cfg)
    assert int(st.n_dropped) > 0  # capacity exceeded is reported, not silent
    assert int(jnp.sum(st.active)) <= cfg.capacity
