"""PoseEstimator integration tests: frame-to-frame and frame-to-model
tracking loops on small synthetic stereo sequences (conf_weighing off -> the
reference's infer_f2f_nw mode, which permits small image sizes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_pose_tpu.models.posenet import PoseNet
from robust_pose_tpu.slam.pose_estimator import PoseEstimator

H, W = 64, 96


@pytest.fixture(scope="module")
def checkpoint():
    model_cfg = {"image_shape": (H, W), "iters": 2, "lbgfs_iters": 5,
                 "use_weights": False}
    model = PoseNet(model_cfg)
    img = jnp.zeros((1, H, W, 3))
    K = jnp.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])[None]
    variables = model.init(jax.random.PRNGKey(0), img, img, K,
                           jnp.asarray([30.0]), img, img)
    # bias the flow head so the untrained net produces valid disparity
    # (see tests/test_training.py)
    variables["params"]["flow"]["update"]["update_block"]["flow_head"][
        "conv2"]["bias"] = jnp.array([-2.5, 0.0])
    return {"params": variables, "config": {"model": model_cfg}}


def _frames(n=4):
    rng = np.random.default_rng(0)
    import cv2
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (H, W + 32, 3)).astype(np.float32), (0, 0), 2)
    out = []
    for i in range(n):
        l = base[:, 2 * i:2 * i + W]
        r = base[:, 2 * i + 3:2 * i + 3 + W]
        out.append((l.transpose(2, 0, 1)[None], r.transpose(2, 0, 1)[None]))
    return out


def _slam_cfg(f2f=True):
    return {"frame2frame": f2f, "lbgfs_iters": 5, "conf_weighing": False,
            "depth_clipping": [1, 250], "dist_thr": 50.0, "average_pts": False}


def test_f2f_tracking_loop(checkpoint):
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    est = PoseEstimator(_slam_cfg(True), K, baseline=7500.0,
                        checkpoint=checkpoint, img_shape=(W, H))
    mask = np.ones((1, 1, H, W), bool)
    poses = []
    for limg, rimg in _frames(4):
        pose, scene, flow, weights = est(limg, rimg, mask)
        p = np.asarray(pose[0])
        assert np.all(np.isfinite(p))
        np.testing.assert_allclose(np.linalg.norm(p[3:]), 1.0, rtol=1e-4)
        poses.append(p)
    assert scene is None, "f2f mode must not build a surfel map"
    # first pose is the init pose (identity)
    np.testing.assert_allclose(poses[0], [0, 0, 0, 0, 0, 0, 1.0], atol=1e-6)


def test_f2m_tracking_loop(checkpoint):
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    est = PoseEstimator(_slam_cfg(False), K, baseline=7500.0,
                        checkpoint=checkpoint, img_shape=(W, H))
    mask = np.ones((1, 1, H, W), bool)
    for i, (limg, rimg) in enumerate(_frames(3)):
        pose, scene, flow, weights = est(limg, rimg, mask)
        assert np.all(np.isfinite(np.asarray(pose)))
    assert scene is not None, "f2m mode must maintain a surfel map"
    assert scene.n_active > 0
    # the rendered model frame is exposed as the reference frame
    mf = est.get_last_frame()
    assert mf is not None
    assert np.all(np.isfinite(np.asarray(mf.depth)))


def test_track_window_matches_per_frame(checkpoint):
    """Windowed streaming mode (one compiled dispatch per N frames) must
    produce the same pose chain as per-frame tracking."""
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    mask = np.ones((1, 1, H, W), bool)
    frames = _frames(5)

    est_a = PoseEstimator(_slam_cfg(True), K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    poses_ref = []
    for limg, rimg in frames:
        pose, *_ = est_a(limg, rimg, mask)
        poses_ref.append(np.asarray(pose[0]))

    est_b = PoseEstimator(_slam_cfg(True), K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    est_b(*frames[0], mask)  # first frame seeds the state per-frame
    # TWO consecutive windows: the second consumes the first's carried frame
    # state + reference-feature cache (the cross-window handoff)
    poses_w, succ = [], []
    for lo in (1, 3):
        limgs = np.stack([f[0] for f in frames[lo:lo + 2]])
        rimgs = np.stack([f[1] for f in frames[lo:lo + 2]])
        masks = np.stack([mask] * 2)
        p, s = est_b.track_window(limgs, rimgs, masks)
        poses_w.append(np.asarray(p))
        succ.append(np.asarray(s))
    poses_w = np.concatenate(poses_w)
    succ = np.concatenate(succ)

    for i in range(4):
        np.testing.assert_allclose(poses_w[i, 0], poses_ref[i + 1],
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(est_b.last_pose[0]), poses_ref[-1],
                               rtol=1e-4, atol=1e-5)
    assert succ.shape == (4,)


def test_track_window_matches_per_frame_f2m(checkpoint):
    """f2m windowed streaming (surfel pool as a scan carry) must produce the
    same pose chain AND the same surfel map as per-frame f2m tracking."""
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    mask = np.ones((1, 1, H, W), bool)
    frames = _frames(5)
    cfg = dict(_slam_cfg(False), map_capacity=8 * H * W)

    est_a = PoseEstimator(cfg, K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    poses_ref = []
    for limg, rimg in frames:
        pose, *_ = est_a(limg, rimg, mask)
        poses_ref.append(np.asarray(pose[0]))

    est_b = PoseEstimator(cfg, K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    est_b(*frames[0], mask)
    limgs = np.stack([f[0] for f in frames[1:]])
    rimgs = np.stack([f[1] for f in frames[1:]])
    masks = np.stack([mask] * 4)
    poses_w, succ = est_b.track_window(limgs, rimgs, masks)
    poses_w = np.asarray(poses_w)

    for i in range(4):
        np.testing.assert_allclose(poses_w[i, 0], poses_ref[i + 1],
                                   rtol=1e-4, atol=1e-5)
    # the surfel maps must agree: same live count, same active prefix stats
    na, nb = est_a.scene.n_active, est_b.scene.n_active
    assert na == nb, (na, nb)
    sa, sb = est_a.scene.state, est_b.scene.state
    np.testing.assert_allclose(np.asarray(jnp.sum(sa.conf)),
                               np.asarray(jnp.sum(sb.conf)), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.where(sa.active[:, None], sa.opts, 0.0), 0)),
        np.asarray(jnp.sum(jnp.where(sb.active[:, None], sb.opts, 0.0), 0)),
        rtol=1e-3)


def test_track_window_diagnostics(checkpoint):
    """``diagnostics=True`` must return the per-frame flow/confidence/depth
    maps (viewer/logger data) equal to the per-frame path's, while keeping
    the windowed dispatch (scripts/infer_trajectory.py feeds viewers from
    this single bulk readback instead of falling back to per-frame sync)."""
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    mask = np.ones((1, 1, H, W), bool)
    frames = _frames(3)

    est_a = PoseEstimator(_slam_cfg(True), K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    flows, confs, depths = [], [], []
    for limg, rimg in frames:
        pose, scene, flow, weights = est_a(limg, rimg, mask)
        # first frame initializes only (no tracking -> no flow/weights)
        flows.append(None if flow is None else np.asarray(flow[0]))
        confs.append(None if weights is None else np.asarray(weights[0][0]))
        depths.append(np.asarray(est_a.frame.depth[0]))

    est_b = PoseEstimator(_slam_cfg(True), K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    est_b(*frames[0], mask)
    limgs = np.stack([f[0] for f in frames[1:]])
    rimgs = np.stack([f[1] for f in frames[1:]])
    masks = np.stack([mask] * 2)
    poses_w, succ, diag = est_b.track_window(limgs, rimgs, masks,
                                             diagnostics=True)
    assert diag["flow"].shape == (2, H, W, 2)
    assert diag["conf1"].shape == (2, H, W, 1)
    assert diag["depth"].shape == (2, H, W, 1)
    # diagnostics ride the device->host link as f16 (display payload);
    # equivalence is judged against the per-frame maps at f16 resolution
    assert diag["flow"].dtype == jnp.float16
    for i in range(2):
        fref = flows[i + 1]
        np.testing.assert_allclose(
            np.asarray(diag["flow"][i], np.float32), fref,
            rtol=1e-3, atol=1e-3 + 1e-3 * np.abs(fref).max())
        np.testing.assert_allclose(
            np.asarray(diag["conf1"][i], np.float32), confs[i + 1],
            rtol=1e-3, atol=1e-3)
        dref = depths[i + 1]
        np.testing.assert_allclose(
            np.asarray(diag["depth"][i], np.float32), dref,
            rtol=1e-3, atol=1e-5 + 1e-3 * np.abs(dref).max())

    # f2m: diag rides the scan ys; same per-frame data, same shapes
    cfg = dict(_slam_cfg(False), map_capacity=8 * H * W)
    est_c = PoseEstimator(cfg, K, baseline=7500.0, checkpoint=checkpoint,
                          img_shape=(W, H))
    fm_flows = []
    for limg, rimg in frames:
        _, _, flow, _ = est_c(limg, rimg, mask)
        fm_flows.append(None if flow is None else np.asarray(flow[0]))
    est_d = PoseEstimator(cfg, K, baseline=7500.0, checkpoint=checkpoint,
                          img_shape=(W, H))
    est_d(*frames[0], mask)
    _, _, diag_m = est_d.track_window(limgs, rimgs, masks, diagnostics=True)
    assert diag_m["flow"].shape == (2, H, W, 2)
    for i in range(2):
        fref = fm_flows[i + 1]
        np.testing.assert_allclose(
            np.asarray(diag_m["flow"][i], np.float32), fref,
            rtol=1e-3, atol=1e-3 + 1e-3 * np.abs(fref).max())


def _frames_with_jump(n=5, jump_at=3, jump=90):
    """Like _frames but one frame teleports by ``jump`` px — far beyond the
    |log(rel)| > 0.1 failure threshold (reference pose_estimator.py:81-87),
    so the tracker must flag it and substitute identity."""
    rng = np.random.default_rng(0)
    import cv2
    pad = jump + 2 * n + 8
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (H, W + pad, 3)).astype(np.float32), (0, 0), 2)
    out = []
    for i in range(n):
        dx = 2 * i + (jump if i == jump_at else 0)
        l = base[:, dx:dx + W]
        r = base[:, dx + 3:dx + 3 + W]
        out.append((l.transpose(2, 0, 1)[None], r.transpose(2, 0, 1)[None]))
    return out


@pytest.mark.parametrize("f2f", [True, False])
def test_track_window_failure_branch_parity(checkpoint, f2f):
    """The |log|>0.1 failure branch inside a window must fire AND produce
    the same poses/successes as the per-frame path (f2m additionally: a
    failed frame must not be fused, and the carried rendering is reused)."""
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    mask = np.ones((1, 1, H, W), bool)
    frames = _frames_with_jump(5)
    cfg = _slam_cfg(f2f)
    if not f2f:
        cfg["map_capacity"] = 8 * H * W

    est_a = PoseEstimator(cfg, K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    poses_ref, succ_ref = [], []
    for limg, rimg in frames:
        pose, *_ = est_a(limg, rimg, mask)
        poses_ref.append(np.asarray(pose[0]))
        succ_ref.append(bool(est_a.success))

    est_b = PoseEstimator(cfg, K, baseline=7500.0,
                          checkpoint=checkpoint, img_shape=(W, H))
    est_b(*frames[0], mask)
    limgs = np.stack([f[0] for f in frames[1:]])
    rimgs = np.stack([f[1] for f in frames[1:]])
    masks = np.stack([mask] * 4)
    poses_w, succ = est_b.track_window(limgs, rimgs, masks)
    poses_w, succ = np.asarray(poses_w), np.asarray(succ)

    assert not succ.all(), "the jump frame must trip the failure branch"
    np.testing.assert_array_equal(succ, np.asarray(succ_ref[1:]))
    for i in range(4):
        np.testing.assert_allclose(poses_w[i, 0], poses_ref[i + 1],
                                   rtol=1e-4, atol=1e-5)
    if not f2f:
        assert est_a.scene.n_active == est_b.scene.n_active


def test_init_pose_offset(checkpoint):
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    init = np.array([5.0, -3.0, 2.0, 0, 0, 0, 1.0], np.float32)
    est = PoseEstimator(_slam_cfg(True), K, baseline=7500.0,
                        checkpoint=checkpoint, img_shape=(W, H),
                        init_pose=init)
    mask = np.ones((1, 1, H, W), bool)
    (limg, rimg), *_ = _frames(1)
    pose, *_ = est(limg, rimg, mask)
    np.testing.assert_allclose(np.asarray(pose[0]), init, atol=1e-6)


def test_f2m_world_frame_invariance(checkpoint):
    """f2m tracking must be invariant to the world-frame choice: with a
    non-identity init pose P, every absolute pose must equal P o pose_ident
    (the reference achieves this because transform_cpy resets the copy's
    extrinsics to identity — surfel_map.py:216-219 — so the f2m rendering
    depends only on inv(last_pose), not on pmat)."""
    from robust_pose_tpu import se3

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    P = np.asarray(se3.exp(jnp.asarray([5.0, -3.0, 2.0, 0.04, -0.06, 0.05])))
    runs = {}
    for name, init in (("ident", None), ("world", P)):
        est = PoseEstimator(_slam_cfg(False), K, baseline=7500.0,
                            checkpoint=checkpoint, img_shape=(W, H),
                            init_pose=None if init is None else jnp.asarray(init))
        mask = np.ones((1, 1, H, W), bool)
        runs[name] = [np.asarray(est(l, r, mask)[0][0])
                      for l, r in _frames(3)]
    for p_i, p_w in zip(runs["ident"], runs["world"]):
        expect = np.asarray(se3.mul(jnp.asarray(P)[None],
                                    jnp.asarray(p_i)[None])[0])
        got = p_w if np.dot(expect[3:], p_w[3:]) >= 0 else np.concatenate(
            [p_w[:3], -p_w[3:]])
        np.testing.assert_allclose(got, expect, atol=5e-3)
