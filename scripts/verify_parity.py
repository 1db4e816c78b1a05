"""Golden-parity harness: prove numerical parity against the reference's
pretrained weights the moment the artifacts are available.

The reference ships ``trained/poseNet_2xf8up4b.pth`` (default checkpoint of
reference scripts/infer_trajectory.py:132) and warm-starts RAFT from
``raft-things.pth`` (reference core/pose/pose_net.py:137-147). Those blobs
are stripped from this snapshot, so run this ONE command when they appear:

    python scripts/verify_parity.py --posenet poseNet_2xf8up4b.pth

Modes (composable):
  default      convert the .pth via utils/torch_convert, load the SAME
               weights into the in-tree torch oracle (tests/torch_ref — the
               reference network reassembled module for module), run both
               systems over a frame sequence and compare flows / depths /
               confidences / per-frame poses / chained-trajectory ATE.
  --record F   additionally save the torch oracle's outputs to F (.npz)
  --golden F   compare the JAX system against a previously recorded .npz
               (no torch needed — e.g. on a TPU-only box)
  --raft F     verify raft-things.pth through convert_raft_pth as well
               (flow-only parity at the RAFT level)
  --selftest   synthesize a random-weights .pth in the reference's on-disk
               format ({'state_dict': ..., 'config': ...}, DataParallel
               'module.' prefixes included) and run the full harness on it —
               proves the harness end-to-end without the real artifacts.
  --data DIR   use left/right PNG pairs from DIR (sorted; *_left/*_right or
               l_*/r_* naming) instead of the synthetic sequence.

Exit code 0 = all checks within tolerance.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TOL = {
    "flow_px": 5e-2,        # max |flow_jax - flow_torch| in pixels
    "depth_rel": 1e-2,      # median relative depth error
    "conf_abs": 5e-2,       # max confidence delta
    "pose_tan": 5e-3,       # per-frame tangent-space pose distance
    "obj_excess": 5e-3,     # GN objective may exceed LBFGS's by at most this
    "ate_rel": 1e-2,        # chained-ATE relative mismatch (the BASELINE
                            # 'ATE within 1%' criterion)
}


def make_synthetic_sequence(h, w, n=5, disparity=6, step=4, seed=42):
    import cv2

    rng = np.random.default_rng(seed)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (h, w + disparity + step * n + 8, 3))
        .astype(np.float32), (0, 0), 3)
    return [(base[:, step * i:step * i + w],
             base[:, step * i + disparity:step * i + disparity + w])
            for i in range(n)]


def load_data_dir(path, h, w):
    import cv2

    lefts = sorted(f for f in os.listdir(path)
                   if "left" in f or f.startswith("l_"))
    rights = sorted(f for f in os.listdir(path)
                    if "right" in f or f.startswith("r_"))
    assert len(lefts) == len(rights) and lefts, f"no stereo pairs in {path}"
    frames = []
    for lf, rf in zip(lefts, rights):
        l = cv2.cvtColor(cv2.imread(os.path.join(path, lf)),
                         cv2.COLOR_BGR2RGB).astype(np.float32)
        r = cv2.cvtColor(cv2.imread(os.path.join(path, rf)),
                         cv2.COLOR_BGR2RGB).astype(np.float32)
        frames.append((cv2.resize(l, (w, h)), cv2.resize(r, (w, h))))
    return frames


def load_torch_oracle(pth_path, config):
    """Load the real state_dict into the reassembled reference network
    (tests/torch_ref mirrors reference core/pose/pose_net.py module for
    module, so the state_dict keys line up exactly)."""
    import torch

    from robust_pose_tpu.utils.torch_convert import strip_module_prefix
    from tests.torch_ref.posenet import PoseNet as TorchPoseNet

    checkp = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = strip_module_prefix(checkp["state_dict"])
    tmodel = TorchPoseNet(config)
    tmodel.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    tmodel.eval()
    return tmodel


def run_torch_oracle(tmodel, frames, K, baseline, config):
    """Roll the torch tracking loop (reference pose_estimator.py:50-96
    semantics). Besides the per-frame outputs, evaluates the f64 objective
    at the solved pose AND at identity — the LBFGS descent certificate the
    pose checks are gated on (reference pose_head.py:70 runs lr=1 LBFGS with
    no line search, which can overshoot on ill-conditioned problems)."""
    import torch

    h, w = config["image_shape"]
    tK = torch.tensor(K)[None]
    bl = torch.tensor([baseline])
    t = lambda x: torch.tensor(x.transpose(2, 0, 1))[None]
    outs = []
    with torch.no_grad():
        l0, r0 = frames[0]
        depth, valid, sflow = tmodel.flow2depth(t(l0), t(r0), bl)
        state = (t(l0), depth, sflow)
        for l, r in frames[1:]:
            img1, depth1, sflow1 = state
            img2, img2r = t(l), t(r)
            mask = torch.ones(1, 1, h, w, dtype=torch.bool)
            pose, tan, depth2, conf1, conf2, flow, sflow2 = tmodel.infer(
                img1, img2, tK, bl, depth1, img2r, mask, mask, sflow1)
            # rebuild the solver inputs for the f64 objective probe
            b = 1
            flows, net, inp = tmodel.flow(torch.cat([img1, img2], 0),
                                          torch.cat([img2, img2r], 0))
            fl = flows[-1][:b]
            sfl2 = flows[-1][b:]
            d2, valid2 = tmodel.flow2depth_from(sfl2, bl)
            m2 = mask & valid2
            pcl1 = tmodel.proj(depth1, tK)
            pcl2 = tmodel.proj(d2, tK)
            c1, c2, pcl2w, mask2w = tmodel.get_weight_maps(
                pcl1, pcl2, img1, img2, m2, fl, sflow1, sfl2)
            xs = (fl, pcl1, pcl2w, c1, c2, mask, mask2w, tK,
                  tmodel.loss_weight[None])
            xs64 = [x.double() if torch.is_floating_point(x) else x
                    for x in xs]

            def obj(p7):
                p = torch.as_tensor(np.asarray(p7),
                                    dtype=torch.float64)[None]
                return float(tmodel.pose_head.objective(xs64, p, h, w))

            ident = np.array([0, 0, 0, 0, 0, 0, 1.0])
            outs.append(dict(pose=pose.numpy()[0], flow=fl.numpy()[0],
                             depth2=depth2.numpy()[0],
                             conf1=conf1.numpy()[0], conf2=conf2.numpy()[0],
                             e_torch=obj(pose.numpy()[0]),
                             e_ident=obj(ident), _obj=obj))
            state = (img2, depth2, sflow2)
    return outs


def run_jax(variables, frames, K, baseline, config):
    import jax
    import jax.numpy as jnp

    from robust_pose_tpu.models.posenet import PoseNet

    h, w = config["image_shape"]
    jconfig = dict(config, mixed_precision=False, lookup="xla")
    jmodel = PoseNet(jconfig)
    jinfer = jax.jit(lambda v, *a: jmodel.apply(v, *a, method=PoseNet.infer))
    f2d = jax.jit(lambda v, *a: jmodel.apply(v, *a,
                                             method=PoseNet.flow2depth))
    jK = jnp.asarray(K)[None]
    bl = jnp.asarray([baseline])
    t = lambda x: jnp.asarray(x)[None]
    outs = []
    l0, r0 = frames[0]
    depth, valid, sflow = f2d(variables, t(l0), t(r0), bl)
    state = (t(l0), depth, sflow)
    for l, r in frames[1:]:
        img1, depth1, sflow1 = state
        img2, img2r = t(l), t(r)
        mask = jnp.ones((1, h, w, 1), bool)
        o = jinfer(variables, img1, img2, jK, bl, depth1, img2r, mask, mask,
                   sflow1)
        outs.append(dict(pose=np.asarray(o.pose[0]),
                         flow=np.asarray(o.flow[0]).transpose(2, 0, 1),
                         depth2=np.asarray(o.depth2[0]).transpose(2, 0, 1),
                         conf1=np.asarray(o.conf1[0]).transpose(2, 0, 1),
                         conf2=np.asarray(o.conf2[0]).transpose(2, 0, 1)))
        state = (img2, o.depth2, o.stereo_flow2)
    return outs


def chain_ate(outs_a, outs_b):
    """Chain per-frame relative poses into trajectories and compare: RMSE of
    positional deltas, relative to trajectory extent."""
    from robust_pose_tpu import se3

    import jax.numpy as jnp

    def chain(outs):
        pose = se3.identity((1,))
        pts = [np.zeros(3)]
        for o in outs:
            rel = jnp.asarray(o["pose"])[None]
            pose = se3.normalize(se3.mul(pose, se3.inv(rel)))
            pts.append(np.asarray(pose[0, :3]))
        return np.stack(pts)

    ta, tb = chain(outs_a), chain(outs_b)
    rmse = float(np.sqrt(np.mean(np.sum((ta - tb) ** 2, axis=-1))))
    extent = float(np.max(np.linalg.norm(tb - tb[0], axis=-1)) + 1e-9)
    return rmse, rmse / extent


def compare(jax_outs, ref_outs, se3mod):
    """-> list of (name, value, tol, ok).

    Pose checks follow the e2e-parity-test protocol: the reference solves
    with lr=1 torch LBFGS and NO line search (reference pose_head.py:70),
    which can overshoot — so tangent agreement and chained ATE are only
    asserted on frames where LBFGS actually descended (e_torch < e_ident),
    and the universally valid criterion is SOLVER QUALITY: the f32 GN pose
    must reach an f64-objective value no worse than the LBFGS pose."""
    rows = []
    flow_err = max(float(np.max(np.abs(j["flow"] - r["flow"])))
                   for j, r in zip(jax_outs, ref_outs))
    rows.append(("flow max|Δ| px", flow_err, TOL["flow_px"]))
    depth_err = max(float(np.median(
        np.abs(j["depth2"] - r["depth2"]) / (np.abs(r["depth2"]) + 1e-6)))
        for j, r in zip(jax_outs, ref_outs))
    rows.append(("depth med rel Δ", depth_err, TOL["depth_rel"]))
    conf_err = max(float(max(np.max(np.abs(j["conf1"] - r["conf1"])),
                             np.max(np.abs(j["conf2"] - r["conf2"]))))
                   for j, r in zip(jax_outs, ref_outs))
    rows.append(("confidence max|Δ|", conf_err, TOL["conf_abs"]))

    import jax.numpy as jnp

    if "_obj" in ref_outs[0]:
        # live torch oracle: objective-quality check on every frame
        qual = max((r["_obj"](j["pose"]) - r["e_torch"])
                   / max(abs(r["e_torch"]), 1e-12)
                   for j, r in zip(jax_outs, ref_outs))
        rows.append(("GN obj excess over LBFGS (rel)", qual,
                     TOL["obj_excess"]))

    descended = [bool(r["e_torch"] < r["e_ident"]) for r in ref_outs]
    pairs = [(j, r) for (j, r), d in zip(zip(jax_outs, ref_outs), descended)
             if d]
    if pairs:
        pose_err = max(float(jnp.max(jnp.abs(se3mod.log(
            se3mod.mul(se3mod.inv(jnp.asarray(j["pose"])[None]),
                       jnp.asarray(r["pose"])[None])))))
            for j, r in pairs)
        rows.append((f"pose tangent dist ({len(pairs)}/{len(ref_outs)} "
                     "descended frames)", pose_err, TOL["pose_tan"]))
    if all(descended):
        ate, ate_rel = chain_ate(jax_outs, ref_outs)
        rows.append(("chained ATE (rel)", ate_rel, TOL["ate_rel"]))
    else:
        print(f"note: LBFGS descended on {sum(descended)}/{len(descended)} "
              "frames — chained-ATE check skipped (oracle poses are not a "
              "trustworthy trajectory); with trained weights all frames "
              "should descend")
    return [(n, v, t, v <= t) for n, v, t in rows]


def make_selftest_pth(path, config):
    """Write a random-weights checkpoint in the reference's exact on-disk
    format: {'state_dict': DataParallel-prefixed tensors, 'config': {...}}."""
    import torch

    from tests.torch_ref.posenet import PoseNet as TorchPoseNet

    torch.manual_seed(7)
    tmodel = TorchPoseNet(config)
    with torch.no_grad():
        tmodel.flow.update_block.flow_head.conv2.bias.copy_(
            torch.tensor([-2.5, 0.0]))
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.8, 1.5)
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    torch.save({"state_dict": sd, "config": {"model": dict(config)}}, path)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--posenet", help="poseNet_2xf8up4b.pth (or compatible)")
    ap.add_argument("--raft", help="raft-things.pth (flow-level check)")
    ap.add_argument("--data", help="dir of left/right PNG pairs")
    ap.add_argument("--record", help="save torch-oracle outputs to .npz")
    ap.add_argument("--golden", help="compare against a recorded .npz")
    ap.add_argument("--image-shape", type=int, nargs=2, default=(384, 512),
                    help="H W (384x512 = smallest TinyUNet-valid shape)")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4,
                    help="RAFT GRU iterations for the check")
    ap.add_argument("--selftest", action="store_true",
                    help="run end-to-end with a synthesized random .pth")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # numerics belong on f32 CPU
    from robust_pose_tpu import se3
    from robust_pose_tpu.utils.torch_convert import (
        convert_posenet_pth, convert_raft_pth)

    h, w = args.image_shape
    config = {"image_shape": (h, w), "iters": args.iters, "lbgfs_iters": 25,
              "use_weights": True}
    if args.selftest:
        import tempfile
        args.posenet = os.path.join(tempfile.mkdtemp(), "selftest.pth")
        make_selftest_pth(args.posenet, config)
        print(f"selftest: synthesized {args.posenet}")
    assert args.posenet or args.golden, "--posenet or --golden required"

    K = np.array([[350.0, 0, w / 2], [0, 350.0, h / 2], [0, 0, 1.0]],
                 np.float32)
    # normalized baseline sized so an untrained/biased flow still yields
    # mid-range depths and a well-conditioned pose problem (see
    # tests/test_e2e_torch_parity.py)
    baseline = 20.0
    frames = (load_data_dir(args.data, h, w) if args.data else
              make_synthetic_sequence(h, w, n=args.frames))

    if args.raft:
        rv = convert_raft_pth(args.raft)
        n_leaves = len(jax.tree_util.tree_leaves(rv["params"]))
        print(f"raft checkpoint converted: {n_leaves} param tensors OK")

    converted = convert_posenet_pth(args.posenet) if args.posenet else None
    jax_outs = run_jax(converted["params"], frames, K, baseline, config)

    if args.golden:
        g = np.load(args.golden, allow_pickle=True)
        ref_outs = list(g["outs"])
    else:
        tmodel = load_torch_oracle(args.posenet, config)
        ref_outs = run_torch_oracle(tmodel, frames, K, baseline, config)
    if args.record:
        recordable = [{k: v for k, v in r.items() if k != "_obj"}
                      for r in ref_outs]
        np.savez_compressed(args.record, outs=np.asarray(recordable,
                                                         dtype=object))
        print(f"recorded torch-oracle outputs -> {args.record}")

    rows = compare(jax_outs, ref_outs, se3)
    width = max(len(r[0]) for r in rows)
    ok_all = True
    for name, val, tol, ok in rows:
        ok_all &= ok
        print(f"{name:{width}s}  {val:12.3e}  (tol {tol:.0e})  "
              f"{'PASS' if ok else 'FAIL'}")
    print("PARITY:", "PASS" if ok_all else "FAIL")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
