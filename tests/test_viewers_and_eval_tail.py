"""Smoke tests for the viewer and evaluation tail (VERDICT r1 items 6+8):

* Viewer3D / ViewRenderer / surfels_to_open3d against a stubbed ``open3d``
  module (open3d is an optional host-side dependency, absent in this image —
  the stub exercises every call the real API receives);
* TrajectoryAnalyzer (xyz panels + 3D) headless;
* evaluation/inspect_results.py local aggregation over a synthetic run tree;
* evaluation/trajectory_plots.py CLI over a synthetic sequence dir.
"""
import os
import subprocess
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


# ---------------------------------------------------------------------------
# open3d stub
# ---------------------------------------------------------------------------

class _Params:
    extrinsic = np.eye(4)


class _Control:
    def convert_to_pinhole_camera_parameters(self):
        return _Params()

    def convert_from_pinhole_camera_parameters(self, params):
        self.last = params

    def set_zoom(self, z):
        pass


class _RenderOption:
    background_color = None


class _Visualizer:
    def __init__(self):
        self.geoms = []

    def register_key_callback(self, key, cb):
        pass

    def create_window(self, width=640, height=480, visible=True):
        self.width, self.height = width, height

    def get_view_control(self):
        return _Control()

    def get_render_option(self):
        return _RenderOption()

    def add_geometry(self, g, **kw):
        self.geoms.append(g)

    def remove_geometry(self, g, **kw):
        if g in self.geoms:
            self.geoms.remove(g)

    def poll_events(self):
        pass

    def update_renderer(self):
        pass

    def capture_screen_float_buffer(self, do_render):
        # reference view_renderer.py:25 sizes the video (W, H-1)
        return np.random.default_rng(0).uniform(
            0, 1, (self.height - 1, self.width, 3))


class _PointCloud:
    points = None
    colors = None


def _make_stub():
    o3d = types.ModuleType("open3d")
    o3d.geometry = types.SimpleNamespace(PointCloud=_PointCloud)
    o3d.utility = types.SimpleNamespace(Vector3dVector=lambda a: np.asarray(a))
    o3d.visualization = types.SimpleNamespace(
        VisualizerWithKeyCallback=_Visualizer)
    return o3d


@pytest.fixture()
def stub_open3d(monkeypatch):
    monkeypatch.setitem(sys.modules, "open3d", _make_stub())


def _surfel_state():
    from robust_pose_tpu.slam.frame import make_frame
    from robust_pose_tpu.slam.surfel_map import SurfelConfig, surfel_create

    h, w = 16, 20
    img = 255.0 * jax.random.uniform(jax.random.PRNGKey(0), (1, h, w, 3))
    frame = make_frame(img, depth=jnp.full((1, h, w, 1), 50.0))
    cfg = SurfelConfig(capacity=2 * h * w, img_shape=(h, w))
    kmat = jnp.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1.0]])
    return surfel_create(frame, kmat, cfg)


def test_surfels_to_open3d(stub_open3d):
    from robust_pose_tpu.viewer.viewer3d import surfels_to_open3d

    st = _surfel_state()
    pcd = surfels_to_open3d(st, depth_scale=2.0, stable=False)
    assert pcd.points.shape[1] == 3
    assert len(pcd.points) == int(np.asarray(st.active).sum())
    np.testing.assert_allclose(
        pcd.points, np.asarray(st.opts)[np.asarray(st.active)] / 2.0)


def test_viewer3d_smoke(stub_open3d):
    from robust_pose_tpu.viewer.viewer3d import Viewer3D, surfels_to_open3d

    v = Viewer3D((32, 40), blocking=False)
    pcd = surfels_to_open3d(_surfel_state(), stable=False)
    pose = np.array([1.0, 2.0, 3.0, 0, 0, 0, 1.0])
    v(pose, pcd=pcd)
    assert pcd in v.viewer.geoms


def test_view_renderer_writes_video(stub_open3d, tmp_path):
    from robust_pose_tpu.viewer.view_renderer import ViewRenderer
    from robust_pose_tpu.viewer.viewer3d import surfels_to_open3d

    r = ViewRenderer((32, 40), str(tmp_path))
    pcd = surfels_to_open3d(_surfel_state(), stable=False)
    pose = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
    for _ in range(3):
        img = r(pose, pcd)
        assert np.asarray(img).shape == (31, 40, 3)
    r.vid_writer.release()
    vid = tmp_path / "vis.mp4"
    assert vid.is_file() and vid.stat().st_size > 0


# ---------------------------------------------------------------------------
# evaluation tail
# ---------------------------------------------------------------------------

def _write_run(dirpath, n=24, seed=0):
    """Synthetic freiburg trajectory + groundtruth pair."""
    from robust_pose_tpu import se3
    from robust_pose_tpu.utils.trajectory import save_trajectory

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)
    pose = np.array([0, 0, 0, 0, 0, 0, 1.0])
    traj = []
    for i in range(n):
        step = se3.exp(jnp.asarray(0.01 * rng.normal(size=6)))
        pose = np.asarray(se3.mul(jnp.asarray(pose), step))
        traj.append({"camera-pose": pose, "timestamp": i})
    save_trajectory(traj, dirpath)
    return os.path.join(dirpath, "trajectory.freiburg")


def test_trajectory_analyzer_panels_and_3d(tmp_path):
    from robust_pose_tpu.utils.trajectory import read_freiburg, vec2mat
    from robust_pose_tpu.utils.trajectory_analyzer import TrajectoryAnalyzer

    traj_file = _write_run(str(tmp_path))
    poses = vec2mat(read_freiburg(traj_file))
    for plot_3d in (False, True):
        ta = TrajectoryAnalyzer(plot_3d=plot_3d, title="t")
        ta.add_pose_trajectory(np.asarray(poses), label="ours")
        ta.legend()
        out = str(tmp_path / f"plot{plot_3d}.png")
        ta.write_file(out)
        assert os.path.getsize(out) > 0


def test_inspect_results_local(tmp_path, capsys):
    sys.path.insert(0, os.path.join(REPO, "evaluation"))
    import inspect_results

    root = tmp_path / "results"
    for method in ("ours", "orbslam2"):
        for ds, seed in (("seq_01", 1), ("seq_02", 2)):
            run = root / method / ds / "run0"
            _write_run(str(run), seed=seed)
            gt = _write_run(str(run.parent), seed=seed + 10)
            os.rename(gt, str(run.parent / "groundtruth.txt"))
    df = inspect_results.collect_local(str(root), ["ours", "orbslam2"])
    assert len(df) == 4
    assert set(df.method) == {"ours", "orbslam2"}
    # test-set protocol: three metric tables, macro average per method
    # (reference inspect_results_test.py:60-97 layout)
    inspect_results.report_test(df, ["ours", "orbslam2"])
    out = capsys.readouterr().out
    assert "ATE-RMSE in mm" in out and "RPE-trans in mm" in out
    assert "RPE-rot in deg" in out
    assert out.count("macro average") == 6  # 3 metrics x 2 methods
    assert "micro average" not in out
    # scenario protocol: ATE macro+micro + per-run blocks
    # (reference inspect_results.py:61-88 layout)
    inspect_results.report_scenario(df, ["ours", "orbslam2"], plot=False)
    out = capsys.readouterr().out
    assert out.count("micro average") == 2
    assert "seq_01" in out and "ATE/RMSE" in out


def test_trajectory_plots_cli(tmp_path):
    base = tmp_path / "dataset_x" / "keyframe_1"
    _write_run(str(base / "data" / "ours"))
    gt = _write_run(str(base), seed=3)
    os.rename(gt, str(base / "groundtruth.txt"))
    out = str(tmp_path / "traj.png")
    env = dict(os.environ, MPLBACKEND="Agg", JAX_PLATFORM_NAME="cpu")
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "evaluation",
                                      "trajectory_plots.py"),
         str(base), "--methods", "ours", "ground-truth", "--out", out],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert res.returncode == 0, res.stderr
    assert os.path.isfile(out) and os.path.getsize(out) > 0
