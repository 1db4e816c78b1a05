"""End-to-end numerical parity: full JAX PoseNet vs the PyTorch reference.

The reference's pretrained checkpoint was stripped from the snapshot, so the
oracle reconstructs the complete torch system (tests/torch_ref/: full RAFT,
TinyUNet heads, f64-LBFGS pose head — reference core/pose/pose_net.py:13-164,
core/pose/pose_head.py:5-79) with random weights, converts them through
utils/torch_convert (the same path a real ``poseNet_2xf8up4b.pth`` takes),
and runs BOTH systems over a synthetic stereo sequence:

* RAFT flows, depths and confidence maps must agree to f32 tolerance —
  validates the assembled network (corr pyramid scaling + window channel
  order + GRU scan + convex upsampling + head plumbing), not just modules;
* per-frame solved poses must agree in tangent distance AND in objective
  value (the f32 Gauss-Newton solver must match the f64 LBFGS argmin);
* the bf16 production config is A/B'd against f32 and the pose delta bounded
  (the BASELINE "ATE within 1%" prerequisite).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from robust_pose_tpu import se3 as jse3
from robust_pose_tpu.models.posenet import PoseNet
from robust_pose_tpu.utils.torch_convert import convert_posenet_state_dict
from tests.torch_ref import se3 as tse3
from tests.torch_ref.posenet import PoseNet as TorchPoseNet

H, W = 384, 512  # smallest shape the unpadded TinyUNet heads support

# the shared ``systems`` fixture traces+compiles the full PoseNet twice
# (JAX and torch oracles) — minutes of cold-cache CPU compile; CI quick
# tier skips the module, the full tier runs it with a warm .jax_cache
pytestmark = pytest.mark.heavy
N_FRAMES = 4
ITERS = 3         # RAFT GRU iterations (config-controlled; parity unaffected)
SOLVER_ITERS = 25

CONFIG = {"image_shape": (H, W), "iters": ITERS, "lbgfs_iters": SOLVER_ITERS,
          "use_weights": True}


def _sequence(n=N_FRAMES):
    """Smooth random stereo frames with a small horizontal disparity."""
    import cv2

    rng = np.random.default_rng(42)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (H, W + 64, 3)).astype(np.float32), (0, 0), 3)
    frames = []
    for i in range(n):
        l = base[:, 4 * i:4 * i + W]
        r = base[:, 4 * i + 6:4 * i + 6 + W]
        frames.append((l, r))
    return frames


@pytest.fixture(scope="module")
def systems():
    torch.manual_seed(7)
    tmodel = TorchPoseNet(CONFIG).eval()
    with torch.no_grad():
        # bias the flow head so untrained flow yields valid disparity and
        # randomize BN stats so conversion is non-trivial
        tmodel.flow.update_block.flow_head.conv2.bias.copy_(
            torch.tensor([-2.5, 0.0]))
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.8, 1.5)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_posenet_state_dict(sd)

    jconfig = dict(CONFIG, mixed_precision=False, lookup="xla")
    jmodel = PoseNet(jconfig)
    jinfer = jax.jit(lambda v, *a: jmodel.apply(v, *a, method=PoseNet.infer))
    K = np.array([[350.0, 0, W / 2], [0, 350.0, H / 2], [0, 0, 1.0]],
                 np.float32)
    return tmodel, variables, jinfer, K


def _run_torch(tmodel, frames, K, baseline):
    tK = torch.tensor(K)[None]
    bl = torch.tensor([baseline])
    outs = []
    with torch.no_grad():
        l0, r0 = frames[0]
        t = lambda x: torch.tensor(x.transpose(2, 0, 1))[None]
        depth, valid, sflow = tmodel.flow2depth(t(l0), t(r0), bl)
        state = (t(l0), depth, sflow)
        for l, r in frames[1:]:
            img1, depth1, sflow1 = state
            img2, img2r = t(l), t(r)
            mask = torch.ones(1, 1, H, W, dtype=torch.bool)
            pose, tan, depth2, conf1, conf2, flow, sflow2 = tmodel.infer(
                img1, img2, tK, bl, depth1, img2r, mask, mask, sflow1)
            outs.append(dict(pose=pose.numpy()[0], tan=tan.numpy()[0],
                             flow=flow.numpy()[0], depth2=depth2.numpy()[0],
                             conf1=conf1.numpy()[0], conf2=conf2.numpy()[0]))
            state = (img2, depth2, sflow2)
    return outs


def _run_jax(jinfer, variables, frames, K, baseline, config=None):
    model_cfg = dict(CONFIG, mixed_precision=False, lookup="xla")
    if config:
        model_cfg.update(config)
        jmodel = PoseNet(model_cfg)
        jinfer = jax.jit(
            lambda v, *a: jmodel.apply(v, *a, method=PoseNet.infer))
        flow2depth = jax.jit(
            lambda v, *a: jmodel.apply(v, *a, method=PoseNet.flow2depth))
    else:
        jmodel = PoseNet(model_cfg)
        flow2depth = jax.jit(
            lambda v, *a: jmodel.apply(v, *a, method=PoseNet.flow2depth))
    jK = jnp.asarray(K)[None]
    bl = jnp.asarray([baseline])
    t = lambda x: jnp.asarray(x)[None]  # HWC -> NHWC
    outs = []
    l0, r0 = frames[0]
    depth, valid, sflow = flow2depth(variables, t(l0), t(r0), bl)
    state = (t(l0), depth, sflow)
    for l, r in frames[1:]:
        img1, depth1, sflow1 = state
        img2, img2r = t(l), t(r)
        mask = jnp.ones((1, H, W, 1), bool)
        o = jinfer(variables, img1, img2, jK, bl, depth1, img2r, mask, mask,
                   sflow1)
        outs.append(dict(pose=np.asarray(o.pose[0]),
                         tan=np.asarray(o.pose_tan[0]),
                         flow=np.asarray(o.flow[0]),
                         depth2=np.asarray(o.depth2[0]),
                         conf1=np.asarray(o.conf1[0]),
                         conf2=np.asarray(o.conf2[0])))
        state = (img2, o.depth2, o.stereo_flow2)
    return outs


def _objective_at(tmodel, frames, K, baseline, idx, pose7):
    """Evaluate the torch (f64) objective at an externally solved pose."""
    # re-run the torch forward to rebuild the solver inputs for frame idx
    tK = torch.tensor(K)[None]
    bl = torch.tensor([baseline])
    t = lambda x: torch.tensor(x.transpose(2, 0, 1))[None]
    with torch.no_grad():
        depth, valid, sflow = tmodel.flow2depth(t(frames[0][0]),
                                                t(frames[0][1]), bl)
        state = (t(frames[0][0]), depth, sflow)
        for i, (l, r) in enumerate(frames[1:]):
            img1, depth1, sflow1 = state
            img2, img2r = t(l), t(r)
            mask = torch.ones(1, 1, H, W, dtype=torch.bool)
            b = 1
            flows, net, inp = tmodel.flow(torch.cat([img1, img2], 0),
                                          torch.cat([img2, img2r], 0))
            flow_all = flows[-1]
            flow, sflow2 = flow_all[:b], flow_all[b:]
            tmodel.hidden, tmodel.context = net[:b], inp[:b]
            depth2, valid2 = tmodel.flow2depth_from(sflow2, bl)
            m2 = mask & valid2
            pcl1 = tmodel.proj(depth1, tK)
            pcl2 = tmodel.proj(depth2, tK)
            conf1, conf2, pcl2w, mask2w = tmodel.get_weight_maps(
                pcl1, pcl2, img1, img2, m2, flow, sflow1, sflow2)
            if i == idx:
                xs = (flow, pcl1, pcl2w, conf1, conf2, mask, mask2w, tK,
                      tmodel.loss_weight[None])
                xs64 = [x.double() if torch.is_floating_point(x) else x
                        for x in xs]
                val = tmodel.pose_head.objective(
                    xs64, torch.tensor(pose7, dtype=torch.float64)[None]
                    if not torch.is_tensor(pose7)
                    else pose7.double()[None], H, W)
                return float(val)
            state = (img2, depth2, sflow2)
    raise IndexError(idx)


def test_e2e_network_and_pose_parity(systems):
    tmodel, variables, jinfer, K = systems
    frames = _sequence()
    # normalized baseline sized so the biased untrained flow (~ -40 px)
    # yields mid-range depths (~0.5) and a well-conditioned pose problem
    baseline = 20.0

    touts = _run_torch(tmodel, frames, K, baseline)
    jouts = _run_jax(jinfer, variables, frames, K, baseline)

    for i, (to, jo) in enumerate(zip(touts, jouts)):
        # network tensors: torch NCHW vs JAX NHWC
        np.testing.assert_allclose(
            jo["flow"].transpose(2, 0, 1), to["flow"], atol=0.05,
            err_msg=f"frame {i} temporal flow")
        np.testing.assert_allclose(
            jo["depth2"][..., 0], to["depth2"][0], atol=5e-3,
            err_msg=f"frame {i} depth")
        np.testing.assert_allclose(
            jo["conf1"][..., 0], to["conf1"][0], atol=5e-3,
            err_msg=f"frame {i} conf1")
        np.testing.assert_allclose(
            jo["conf2"][..., 0], to["conf2"][0], atol=5e-3,
            err_msg=f"frame {i} conf2")

        # objective parity: the torch f64 objective and the JAX objective
        # must assign (near-)identical values to the same candidate poses
        e_jax_t = _objective_at(tmodel, frames, K, baseline, i, jo["pose"])
        e_jax_j = _jax_objective_at(variables, frames, K, baseline, i,
                                    jo["pose"])
        np.testing.assert_allclose(e_jax_t, e_jax_j, rtol=5e-3, atol=1e-9,
                                   err_msg=f"frame {i} objective mismatch")

        # solver-quality parity: the f32 GN solution must reach an objective
        # value no worse than the f64 LBFGS solution (evaluated with the
        # torch f64 objective). LBFGS (lr=1, no line search — reference
        # pose_head.py:70) can overshoot on ill-conditioned problems, so
        # tangent agreement is only asserted when it actually descended.
        e_torch = _objective_at(tmodel, frames, K, baseline, i, to["pose"])
        e_ident = _objective_at(tmodel, frames, K, baseline, i,
                                np.array([0, 0, 0, 0, 0, 0, 1.0]))
        assert e_jax_t <= min(e_torch, e_ident) * 1.02 + 1e-12, (
            f"frame {i}: GN objective {e_jax_t} vs LBFGS {e_torch} "
            f"vs identity {e_ident}")
        if e_torch < 0.5 * e_ident:  # LBFGS converged -> same argmin
            rel = jse3.mul(jse3.inv(jnp.asarray(to["pose"])[None]),
                           jnp.asarray(jo["pose"])[None])
            dist = float(jnp.linalg.norm(jse3.log(rel)))
            assert dist < 2e-2, f"frame {i}: pose tangent distance {dist}"


def _jax_objective_at(variables, frames, K, baseline, idx, pose7):
    """Evaluate the JAX (f32) objective at an externally solved pose, on the
    JAX-side solver inputs of frame ``idx``."""
    from robust_pose_tpu.ops.geometry import create_img_coords, depth_to_pcl
    from robust_pose_tpu.ops.warp import remap_from_flow, remap_from_flow_nearest
    from robust_pose_tpu.solver.objectives import (PoseProblemInputs,
                                                   objective)

    model_cfg = dict(CONFIG, mixed_precision=False, lookup="xla")
    jmodel = PoseNet(model_cfg)
    jK = jnp.asarray(K)[None]
    bl = jnp.asarray([baseline])
    t = lambda x: jnp.asarray(x)[None]
    flow2depth = jax.jit(
        lambda v, *a: jmodel.apply(v, *a, method=PoseNet.flow2depth))
    jinfer = jax.jit(lambda v, *a: jmodel.apply(v, *a, method=PoseNet.infer))
    coords = create_img_coords(H, W)

    l0, r0 = frames[0]
    depth, valid, sflow = flow2depth(variables, t(l0), t(r0), bl)
    state = (t(l0), depth, sflow)
    for i, (l, r) in enumerate(frames[1:]):
        img1, depth1, sflow1 = state
        img2, img2r = t(l), t(r)
        mask = jnp.ones((1, H, W, 1), bool)
        o = jinfer(variables, img1, img2, jK, bl, depth1, img2r, mask, mask,
                   sflow1)
        if i == idx:
            # rebuild the solver inputs exactly as PoseNet.infer does
            depth2, valid2 = PoseNet.disparity_to_depth(o.stereo_flow2, bl)
            m2 = mask & valid2
            pcl1 = depth_to_pcl(depth1, jK, coords)
            pcl2 = depth_to_pcl(depth2, jK, coords)
            pcl2w, _ = remap_from_flow(pcl2, o.flow)
            m2f, validm = remap_from_flow_nearest(m2.astype(jnp.float32),
                                                  o.flow)
            m2w = validm & (m2f > 0)
            lw = jnp.asarray(
                variables["params"]["loss_weight"])[None]
            xs = PoseProblemInputs(
                flow=o.flow, pcl1=pcl1, pcl2=pcl2w, weights1=o.conf1,
                weights2=o.conf2, mask1=mask, mask2=m2w, intrinsics=jK,
                loss_weight=lw)
            return float(objective(xs, jnp.asarray(pose7)[None], coords)[0])
        state = (img2, o.depth2, o.stereo_flow2)
    raise IndexError(idx)


def test_trajectory_ate_parity(systems):
    """Chained-trajectory oracle for the BASELINE 'ATE within 1%' target:
    both systems track the same synthetic sequence, relative poses are
    chained into absolute trajectories exactly like PoseEstimator
    (``last * rel^-1``, reference pose_estimator.py:90-91), and the
    ATE-RMSE between the two trajectories must stay below 1% of the
    trajectory length."""
    from robust_pose_tpu.utils.metrics import absolute_trajectory_error

    tmodel, variables, jinfer, K = systems
    frames = _sequence(7)
    baseline = 20.0

    touts = _run_torch(tmodel, frames, K, baseline)
    jouts = _run_jax(jinfer, variables, frames, K, baseline)

    def chain(outs):
        poses = [jse3.identity((1,))]
        for o in outs:
            rel = jnp.asarray(o["pose"])[None]
            poses.append(jse3.normalize(
                jse3.mul(poses[-1], jse3.inv(rel))))
        return np.stack([np.asarray(jse3.matrix(p[0])) for p in poses])

    traj_t = chain(touts)
    traj_j = chain(jouts)

    length = float(sum(
        np.linalg.norm(traj_t[i + 1][:3, 3] - traj_t[i][:3, 3])
        for i in range(len(traj_t) - 1)))
    ate_rmse, *_ = absolute_trajectory_error(traj_t, traj_j)
    print(f"traj length {length:.4f}, torch-vs-jax ATE {float(ate_rmse):.6f} "
          f"({100 * float(ate_rmse) / length:.3f}% of length)")
    assert length > 0.05, "degenerate synthetic trajectory"
    assert float(ate_rmse) < 0.01 * length, (
        f"ATE {float(ate_rmse)} exceeds 1% of trajectory length {length}")


def test_bf16_ab_pose_delta(systems):
    """A/B: production bf16 convs + bf16 corr volume vs f32 — the pose delta
    must stay far below the failure-detection threshold (0.1) and small
    enough to support the ATE-within-1% target."""
    tmodel, variables, jinfer, K = systems
    frames = _sequence()
    baseline = 20.0

    f32 = _run_jax(jinfer, variables, frames, K, baseline)
    bf16 = _run_jax(jinfer, variables, frames, K, baseline,
                    config={"mixed_precision": True, "lookup": "xla"})
    deltas = []
    for a, b in zip(f32, bf16):
        rel = jse3.mul(jse3.inv(jnp.asarray(a["pose"])[None]),
                       jnp.asarray(b["pose"])[None])
        deltas.append(float(jnp.linalg.norm(jse3.log(rel))))
    print("bf16-vs-f32 per-frame pose tangent deltas:", deltas)
    assert max(deltas) < 2e-2, deltas
