"""Trajectory inference CLI — rebuild of reference scripts/infer_trajectory.py:23-196.

Runs the stereo SLAM loop over a sequence folder (preprocessed PNGs or raw
mp4), writes the TUM/freiburg trajectory + surfel-map PLYs, and evaluates
ATE/RPE against ground truth when available. The per-frame compute is one
compiled TPU step (see robust_pose_tpu/slam/pose_estimator.py); the host loop
only decodes frames and collects poses.
"""
import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def main(args, config):
    import jax
    import jax.numpy as jnp

    from robust_pose_tpu.data.dataset_utils import (
        SequentialSubSampler,
        StereoVideoDataset,
        get_data,
        iterate_dataset,
        prefetch_iterator,
    )
    from robust_pose_tpu.slam.pose_estimator import PoseEstimator
    from robust_pose_tpu.slam.surfel_map import SurfelMap
    from robust_pose_tpu.slam.frame import make_frame
    from robust_pose_tpu.utils.checkpoints import load_checkpoint_any
    from robust_pose_tpu.utils.evaluate import evaluate
    from robust_pose_tpu.utils.logging import InferenceLogger
    from robust_pose_tpu.utils.trajectory import read_freiburg, save_trajectory

    if args.outpath is None:
        args.outpath = os.path.join(args.input, "data", "infer_trajectory")
    os.makedirs(args.outpath, exist_ok=True)

    dataset, calib = get_data(args.input, config["img_size"],
                              rect_mode=config["rect_mode"])

    # --device-preproc: the host thread only decodes; specularity masking,
    # resize, and the rectification remap run as one jitted device program
    device_pre = None
    if getattr(args, "device_preproc", False):
        if isinstance(dataset, StereoVideoDataset):
            from robust_pose_tpu.data.device_preproc import DevicePreproc
            dataset.raw = True
            device_pre = DevicePreproc(tuple(config["img_size"]),
                                       rectifier=dataset.rectify)
        else:
            warnings.warn("--device-preproc applies to video datasets "
                          "(PNG datasets are already rectified on disk); "
                          "ignored.")

    gt_file = os.path.join(args.input, "groundtruth.txt")
    gt_trajectory = read_freiburg(gt_file) if os.path.isfile(gt_file) else None
    init_pose = (gt_trajectory[args.start]
                 if gt_trajectory is not None else None)

    checkpoint = load_checkpoint_any(args.checkpoint)
    pose_estimator = PoseEstimator(
        config["slam"], np.asarray(calib["intrinsics"]["left"]),
        baseline=calib["bf"], checkpoint=checkpoint,
        img_shape=config["img_size"], init_pose=init_pose,
    )

    if not isinstance(dataset, StereoVideoDataset):
        sampler = SequentialSubSampler(dataset, args.start, args.stop, args.step)
    else:
        warnings.warn("start/stop not supported for video dataset; ignored.",
                      UserWarning)
        sampler = None

    # viewer wiring mirrors reference scripts/infer_trajectory.py:62-68
    viewer = None
    if args.viewer == "2d":
        from robust_pose_tpu.viewer.viewer2d import Viewer2D
        viewer = Viewer2D(outpath=args.outpath, blocking=args.block_viewer)
    elif args.viewer == "3d":
        try:
            from robust_pose_tpu.viewer.viewer3d import Viewer3D
            viewer = Viewer3D(config["img_size"][::-1],
                              blocking=args.block_viewer)
        except ImportError as e:
            warnings.warn(f"--viewer 3d needs open3d ({e}); disabled.")
    elif args.viewer == "video":
        try:
            from robust_pose_tpu.viewer.view_renderer import ViewRenderer
            viewer = ViewRenderer(config["img_size"][::-1], args.outpath)
        except ImportError as e:
            warnings.warn(f"--viewer video needs open3d ({e}); disabled.")

    recorder = InferenceLogger(log=args.log)
    recorder.set_gt(gt_trajectory)

    from robust_pose_tpu.utils.profiling import StageTimer
    timer = StageTimer()

    window = max(1, getattr(args, "window", 1))
    # windowed streaming + viewers/logging: the batched window pass computes
    # the per-frame flow/confidence/depth maps anyway; diagnostics mode
    # materializes them as outputs and reads the whole window back in ONE
    # bulk transfer, so interactive runs keep the windowed dispatch rate
    # instead of falling back to the ~2x slower per-frame sync path
    diag_mode = window > 1 and (args.viewer != "none" or args.log is not None)

    trajectory = [{"camera-pose": np.asarray(pose_estimator.last_pose[0]),
                   "timestamp": args.start}]
    scene = None
    buf = []  # (limg, rimg, mask, img_number, idx) awaiting a window dispatch

    def _nhwc(img):
        return img if img.shape[-1] in (1, 3) else np.transpose(
            np.asarray(img), (0, 2, 3, 1))

    def flush_window():
        # device-preproc outputs are already on device: stack there (np.stack
        # would round-trip them through the host)
        xp = jnp if device_pre is not None else np
        limgs = xp.stack([b[0] for b in buf])
        rimgs = xp.stack([b[1] for b in buf])
        masks = xp.stack([b[2] for b in buf])
        diag = None
        with timer.stage("track"):
            if diag_mode:
                poses, succ, diag = pose_estimator.track_window(
                    limgs, rimgs, masks, diagnostics=True)
            else:
                poses, succ = pose_estimator.track_window(limgs, rimgs, masks)
        with timer.stage("readback"):
            poses_np = np.asarray(poses)
            if diag is not None:
                # one bulk transfer per window; maps ride the link as f16
                # and widen back for the host-side viewer/logger math
                diag = {k: np.asarray(v, np.float32)
                        for k, v in jax.device_get(diag).items()}
        scene_w = pose_estimator.scene
        pcd = None
        for t, (b, p) in enumerate(zip(buf, poses_np)):
            num, idx = b[3], b[4]
            trajectory.append({"camera-pose": p[0], "timestamp": num})
            if viewer is not None:
                if args.viewer == "2d":
                    from types import SimpleNamespace
                    frame_t = SimpleNamespace(img=_nhwc(b[0]),
                                              depth=diag["depth"][t:t + 1])
                    viewer(frame_t,
                           (diag["conf1"][t:t + 1], diag["conf2"][t:t + 1]),
                           diag["flow"][t:t + 1], idx * args.step)
                elif scene_w is not None:
                    # camera follows per frame; the surfel cloud (only its
                    # post-window state is materialized) refreshes per window
                    from robust_pose_tpu.viewer.viewer3d import surfels_to_open3d
                    if pcd is None:
                        pcd = surfels_to_open3d(
                            scene_w.state, depth_scale=scene_w.depth_scale,
                            stable=True)
                    viewer(p[0], pcd)
            if args.log is not None:
                recorder(scene_w, p[0], step=int(num))
        buf.clear()

    # decode/rectify the next frames on a background thread while the
    # device runs the current step (SURVEY §7: host/device pipelining)
    for i, data in enumerate(prefetch_iterator(
            iterate_dataset(dataset, sampler), depth=2 * window)):
        if isinstance(dataset, StereoVideoDataset):
            if device_pre is not None:
                limg_raw, rimg_raw, pose_kinematics, img_number = data
                limg, rimg, mask = device_pre(limg_raw, rimg_raw)
            else:
                limg, rimg, mask, pose_kinematics, img_number = data
        else:
            limg, rimg, mask, img_number = data
        limg = limg[None] if limg.ndim == 3 else limg
        rimg = rimg[None] if rimg.ndim == 3 else rimg
        mask = mask[None] if mask.ndim == 3 else mask
        if window > 1 and i > 0:
            buf.append((limg, rimg, mask, img_number, i))
            if len(buf) == window:
                flush_window()
            continue
        with timer.stage("track"):
            pose, scene, flow, weights = pose_estimator(limg, rimg, mask)
        # when nothing consumes per-frame host data, DEFER the pose readback
        # (device array straight into the trajectory; fetched in bulk before
        # saving) — each per-frame sync would serialize the dispatch
        # pipeline, and on a remote-attached TPU it pays a per-dispatch RPC.
        # --profile needs the per-frame sync for meaningful stage times.
        defer = (viewer is None and args.log is None
                 and not getattr(args, "profile", False))
        with timer.stage("readback"):
            pose_np = pose[0] if defer else np.asarray(pose[0])
        trajectory.append({"camera-pose": pose_np, "timestamp": img_number})
        if viewer is not None and i > 0:
            if args.viewer == "2d":
                viewer(pose_estimator.get_frame(), weights, flow,
                       i * args.step)
            elif scene is not None:
                # 3d/video viewers follow the camera through the surfel map
                # (reference infer_trajectory.py:80-90)
                from robust_pose_tpu.viewer.viewer3d import surfels_to_open3d
                pcd = surfels_to_open3d(scene.state,
                                        depth_scale=scene.depth_scale,
                                        stable=True)
                viewer(np.asarray(pose[0]), pcd)
        if args.log is not None and i > 0:
            recorder(scene, pose_np, step=int(img_number))

    if buf:
        flush_window()  # partial tail window
    if getattr(args, "profile", False):
        print("per-frame stages:", timer.report())
    # bulk-fetch any deferred device poses (one transfer, not one per frame)
    fetched = jax.device_get([t["camera-pose"] for t in trajectory])
    for t, p in zip(trajectory, fetched):
        t["camera-pose"] = np.asarray(p)
    save_trajectory(trajectory, args.outpath)
    if scene is not None:
        # surface pool saturation in the run summary (the per-fuse warning
        # in SurfelMap.post_fuse fires once; this records the final count)
        n_dropped = int(scene.state.n_dropped)
        print(f"surfels: {scene.n_active} active / bucket {scene.cfg.capacity}"
              f" / cap {scene.max_capacity}; dropped appends: {n_dropped}")
        scene.save_ply(os.path.join(args.outpath, "stable_map.ply"), stable=True)
        scene.save_ply(os.path.join(args.outpath, "all_map.ply"), stable=False)

    if os.path.isfile(gt_file):
        ate_rmse, rpe_trans, rpe_rot, *_ = evaluate(
            gt_file, os.path.join(args.outpath, "trajectory.freiburg"),
            offset=-4,
        )
        recorder.summary({"ATE/RMSE": ate_rmse, "RPE/trans": rpe_trans,
                          "RPE/rot": rpe_rot})
        print(f"ATE/RMSE: {ate_rmse:.3f} mm  RPE/trans: {rpe_trans:.3f} mm  "
              f"RPE/rot: {np.rad2deg(rpe_rot):.4f} deg")
    print("finished")
    return args.outpath


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="script to run pose estimation")
    parser.add_argument("input", type=str, help="Path to input folder.")
    parser.add_argument("--checkpoint", type=str,
                        default="../trained/poseNet_2xf8up4b.pth",
                        help="Path to trained Pose Estimator Checkpoint.")
    parser.add_argument("--outpath", type=str,
                        help="Path to output folder. Defaults to input path.")
    parser.add_argument("--config", type=str,
                        default=os.path.join(os.path.dirname(__file__),
                                             "../configuration/infer_f2f.yaml"),
                        help="Configuration file.")
    parser.add_argument("--device", choices=["cpu", "tpu"], default="tpu",
                        help="device selection (tpu is the default backend).")
    parser.add_argument("--stop", type=int, default=10000000000)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--step", type=int, default=1)
    parser.add_argument("--log", default=None,
                        help="wandb group logging name. No logging if unset")
    parser.add_argument("--viewer", default="none",
                        choices=["none", "2d", "3d", "video"])
    parser.add_argument("--block_viewer", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="print per-frame stage timing")
    parser.add_argument("--window", type=int, default=1,
                        help="track N frames per compiled dispatch "
                        "(streaming mode, f2f and f2m; amortizes dispatch "
                        "overhead — use 8 for real-time throughput on TPU; "
                        "with viewers/logging the per-frame flow/confidence "
                        "maps are materialized by the window pass and read "
                        "back in one bulk transfer)")
    parser.add_argument("--device-preproc", action="store_true",
                        dest="device_preproc",
                        help="run specularity masking, resize, and the "
                        "rectification remap on-device (video datasets): "
                        "the host only decodes frames and uploads raw uint8")
    args = parser.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)
    main(args, config)
