"""Model smoke + shape tests: RAFT, TinyUNet, PoseNet (jitted end-to-end)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_pose_tpu.models.raft import RAFT, build_corr_pyramid, lookup_corr, upsample_flow_convex
from robust_pose_tpu.models.unet import TinyUNet
from robust_pose_tpu.models.posenet import PoseNet

H, W = 64, 96  # small but 8-divisible


@pytest.fixture(scope="module")
def raft_and_params():
    model = RAFT(iters=3)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, H, W, 3))
    variables = model.init(key, img, img)
    return model, variables


def test_raft_shapes(raft_and_params):
    model, variables = raft_and_params
    key = jax.random.PRNGKey(1)
    img1 = 255.0 * jax.random.uniform(key, (2, H, W, 3))
    img2 = 255.0 * jax.random.uniform(jax.random.PRNGKey(2), (2, H, W, 3))
    flow, net, inp = jax.jit(model.apply)(variables, img1, img2)
    assert flow.shape == (2, H, W, 2)
    assert net.shape == (2, H // 8, W // 8, 128)
    assert inp.shape == (2, H // 8, W // 8, 128)
    assert jnp.all(jnp.isfinite(flow))
    # context features are post-ReLU
    assert jnp.all(inp >= 0)
    # hidden state is post-GRU (tanh-bounded at init scale)
    assert jnp.all(jnp.abs(net) <= 1.0 + 1e-5)


def test_raft_zero_motion_small_flow(raft_and_params):
    """Identical frames -> flow should stay near zero (correlation peak at
    the center of the lookup window)."""
    model, variables = raft_and_params
    img = 255.0 * jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 3))
    flow, _, _ = jax.jit(model.apply)(variables, img, img)
    # untrained net: flow magnitude should at least be finite and modest
    assert jnp.all(jnp.isfinite(flow))


def test_corr_pyramid_and_lookup():
    b, h8, w8, c = 1, 8, 12, 16
    f1 = jax.random.normal(jax.random.PRNGKey(0), (b, h8, w8, c))
    f2 = jax.random.normal(jax.random.PRNGKey(1), (b, h8, w8, c))
    pyr = build_corr_pyramid(f1, f2)
    assert len(pyr) == 4
    assert pyr[0].shape == (b, h8 * w8, h8, w8)
    assert pyr[1].shape == (b, h8 * w8, h8 // 2, w8 // 2)

    # lookup at integer self-coordinates reproduces the raw correlation value
    xs_ = jnp.arange(w8, dtype=jnp.float32)
    ys_ = jnp.arange(h8, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs_, ys_, indexing="xy")
    coords = jnp.stack([xg, yg], -1)[None]
    out = lookup_corr(pyr, coords)
    assert out.shape == (b, h8, w8, 4 * 81)
    # center of the level-0 window (offset (0,0) is at index (4,4) -> 4*9+4=40)
    center = out[..., 40]
    expect = jax.vmap(lambda i: pyr[0][0, i].reshape(-1)[i])(jnp.arange(h8 * w8))
    np.testing.assert_allclose(center.reshape(-1), expect, rtol=1e-4, atol=1e-5)


def test_convex_upsample_constant_flow():
    """A constant flow field upsamples to the same constant (x8 scale)."""
    b, h8, w8 = 1, 4, 6
    flow = jnp.ones((b, h8, w8, 2)) * jnp.array([1.5, -0.75])
    mask = jnp.zeros((b, h8, w8, 64 * 9))  # uniform softmax
    up = upsample_flow_convex(flow, mask)
    assert up.shape == (b, 8 * h8, 8 * w8, 2)
    # interior pixels: exactly 8x the constant flow
    np.testing.assert_allclose(
        up[:, 8:-8, 8:-8, 0], 12.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        up[:, 8:-8, 8:-8, 1], -6.0, rtol=1e-5
    )


def test_tiny_unet_shapes():
    # production 1/8-res input shape (512x640 images -> 64x80 features);
    # the reference's unpadded UNet (and therefore ours) requires >= ~48 px
    # feature maps, so tiny synthetic shapes are not representable
    uh, uw = 64, 80
    model = TinyUNet(in_channels=264, output_size=(8 * uh, 8 * uw))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, uh, uw, 264))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 8 * uh, 8 * uw, 1)
    assert jnp.all(jnp.isfinite(y))


PH, PW = 384, 512  # smallest shape the unpadded TinyUNet supports at 1/8 res


@pytest.fixture(scope="module")
def posenet_and_params():
    config = {"image_shape": (PH, PW), "iters": 2, "lbgfs_iters": 8,
              "use_weights": True}
    model = PoseNet(config)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, PH, PW, 3))
    K = jnp.eye(3)[None].at[0, 0, 0].set(100.0).at[0, 1, 1].set(100.0) \
        .at[0, 0, 2].set(PW / 2).at[0, 1, 2].set(PH / 2)
    bl = jnp.asarray([40.0])
    variables = model.init(key, img, img, K, bl, img, img)
    return model, variables, K, bl


def test_posenet_infer_jitted(posenet_and_params):
    model, variables, K, bl = posenet_and_params
    key = jax.random.PRNGKey(5)
    img1 = 255.0 * jax.random.uniform(key, (1, PH, PW, 3))
    img2 = 255.0 * jax.random.uniform(jax.random.PRNGKey(6), (1, PH, PW, 3))
    img2r = 255.0 * jax.random.uniform(jax.random.PRNGKey(7), (1, PH, PW, 3))
    depth1 = jnp.full((1, PH, PW, 1), 0.5)
    mask = jnp.ones((1, PH, PW, 1), bool)
    sflow1 = jnp.zeros((1, PH, PW, 2))

    infer = jax.jit(lambda v, *a: model.apply(v, *a, method=PoseNet.infer))
    out = infer(variables, img1, img2, K, bl, depth1, img2r, mask, mask, sflow1)
    assert out.pose.shape == (1, 7)
    assert out.pose_tan.shape == (1, 6)
    assert out.depth2.shape == (1, PH, PW, 1)
    assert out.conf1.shape == (1, PH, PW, 1)
    assert jnp.all(jnp.isfinite(out.pose))
    assert jnp.all((out.conf1 >= 0) & (out.conf1 <= 1))
    # unit quaternion
    np.testing.assert_allclose(
        jnp.linalg.norm(out.pose[0, 3:]), 1.0, rtol=1e-5
    )


def test_posenet_f2m_split_matches_infer(posenet_and_params):
    """f2m_precompute + f2m_track (the frame-to-model fast path: batched
    map-independent pre-pass + lean sequential step) must reproduce
    PoseNet.infer exactly on the same (reference, frame) problem.

    Compared in f32 (same params, compute dtype only): under the production
    bf16 GRU the two batch compositions (joint batch-2 vs temporal-only
    batch-1) tile differently and accumulate ~0.1 px of bf16 rounding noise
    over 12 GRU iterations, which the random-weight confidence heads then
    amplify — pose-level bf16 agreement is covered by the estimator
    window==per-frame tests."""
    bf_model, variables, K, bl = posenet_and_params
    model = PoseNet(dict(bf_model.config, mixed_precision=False))
    ref = 255.0 * jax.random.uniform(jax.random.PRNGKey(11), (1, PH, PW, 3))
    limg = 255.0 * jax.random.uniform(jax.random.PRNGKey(12), (1, PH, PW, 3))
    rimg = 255.0 * jax.random.uniform(jax.random.PRNGKey(13), (1, PH, PW, 3))
    depth1 = jnp.full((1, PH, PW, 1), 0.5)
    mask = jnp.ones((1, PH, PW, 1), bool)
    sflow1 = jnp.zeros((1, PH, PW, 2))

    out_a = jax.jit(lambda v: model.apply(
        v, ref, limg, K, bl, depth1, rimg, mask, mask, sflow1,
        method=PoseNet.infer))(variables)

    @jax.jit
    def split(v):
        f_l, n_l, i_l, sf2, d2, m2 = model.apply(
            v, limg, rimg, mask, bl, method=PoseNet.f2m_precompute)
        return model.apply(v, ref, depth1, mask, sflow1, limg, m2, K,
                           f_l, n_l, i_l, sf2, d2, method=PoseNet.f2m_track)

    out_b = split(variables)
    np.testing.assert_allclose(out_b.pose, out_a.pose, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_b.flow, out_a.flow, atol=1e-3)
    np.testing.assert_allclose(out_b.depth2, out_a.depth2, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(out_b.conf1, out_a.conf1, atol=1e-4)
    np.testing.assert_allclose(out_b.conf2, out_a.conf2, atol=1e-4)


def test_posenet_train_forward(posenet_and_params):
    model, variables, K, bl = posenet_and_params
    img1 = 255.0 * jax.random.uniform(jax.random.PRNGKey(8), (2, PH, PW, 3))
    img2 = 255.0 * jax.random.uniform(jax.random.PRNGKey(9), (2, PH, PW, 3))
    img1r = 255.0 * jax.random.uniform(jax.random.PRNGKey(10), (2, PH, PW, 3))
    img2r = 255.0 * jax.random.uniform(jax.random.PRNGKey(11), (2, PH, PW, 3))
    K2 = jnp.tile(K, (2, 1, 1))
    bl2 = jnp.tile(bl, (2,))
    out = jax.jit(model.apply)(variables, img1, img2, K2, bl2, img1r, img2r)
    assert out.pose_tan.shape == (2, 6)
    assert jnp.all(jnp.isfinite(out.pose_tan))


def test_lookup_corr_fast_matches_gather_oracle():
    """The TPU-fast sliced lookup must match the element-gather oracle,
    including border and far-out-of-bounds coords (grid_sample zeros
    semantics)."""
    from robust_pose_tpu.models.raft import lookup_corr_gather

    b, h8, w8, c = 2, 16, 24, 8
    f1 = jax.random.normal(jax.random.PRNGKey(0), (b, h8, w8, c))
    f2 = jax.random.normal(jax.random.PRNGKey(1), (b, h8, w8, c))
    pyr = build_corr_pyramid(f1, f2)
    xg, yg = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                          jnp.arange(h8, dtype=jnp.float32), indexing="xy")
    base = jnp.tile(jnp.stack([xg, yg], -1)[None], (b, 1, 1, 1))
    for coords in (base + jnp.array([3.3, -2.7]),
                   base * 3.0 - 50.0,
                   base + 0.5):
        ref = lookup_corr_gather(pyr, coords)
        fast = lookup_corr(pyr, coords, precise=True)
        np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)
        # default (weights folded into the volume dtype) stays close in f32
        approx = lookup_corr(pyr, coords)
        np.testing.assert_allclose(approx, ref, rtol=1e-3, atol=1e-3)


def test_raft_small_variant():
    """Upstream RAFT small=True variant (hdim 96, cdim 64, radius-3 lookup,
    bilinear upsampling) — reference config key model.small."""
    model = RAFT(iters=2, small=True)
    img = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), img, img)
    flow, net, inp = jax.jit(model.apply)(
        variables,
        255.0 * jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3)),
        255.0 * jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3)),
    )
    assert flow.shape == (1, H, W, 2)
    assert net.shape == (1, H // 8, W // 8, 96)
    assert inp.shape == (1, H // 8, W // 8, 64)
    assert jnp.all(jnp.isfinite(flow))


def test_pallas_lookup_matches_oracle_interpret():
    """Pallas correlation-lookup kernel (interpret mode) vs gather oracle,
    including out-of-bounds windows."""
    from robust_pose_tpu.models.raft import lookup_corr_gather
    from robust_pose_tpu.ops.pallas_lookup import pallas_lookup_pyramid

    b, h8, w8, c = 2, 16, 24, 8
    f1 = jax.random.normal(jax.random.PRNGKey(0), (b, h8, w8, c))
    f2 = jax.random.normal(jax.random.PRNGKey(1), (b, h8, w8, c))
    pyr = build_corr_pyramid(f1, f2)
    xg, yg = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                          jnp.arange(h8, dtype=jnp.float32), indexing="xy")
    base = jnp.tile(jnp.stack([xg, yg], -1)[None], (b, 1, 1, 1))
    from robust_pose_tpu.ops.pallas_lookup import pallas_lookup_pyramid_grouped

    for coords in (base + jnp.array([3.3, -2.7]), base * 3.0 - 50.0):
        ref = lookup_corr_gather(pyr, coords)
        out = jnp.concatenate(
            pallas_lookup_pyramid(pyr, coords, interpret=True), axis=-1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
        grouped = jnp.concatenate(
            pallas_lookup_pyramid_grouped(pyr, coords, interpret=True),
            axis=-1)
        np.testing.assert_allclose(grouped, ref, rtol=1e-4, atol=1e-5)


def test_lanewise_lookup_matches_oracle_interpret():
    """Lane-parallel Pallas lookup (transposed volume) vs gather oracle,
    including out-of-bounds and fully-OOB windows and non-128-multiple N."""
    from robust_pose_tpu.models.raft import lookup_corr_gather
    from robust_pose_tpu.ops.pallas_lookup_lanewise import (
        build_corr_pyramid_t,
        lanewise_lookup,
    )

    b, h8, w8, c = 2, 16, 24, 8  # N = 384 = 3 x 128
    f1 = jax.random.normal(jax.random.PRNGKey(0), (b, h8, w8, c))
    f2 = jax.random.normal(jax.random.PRNGKey(1), (b, h8, w8, c))
    pyr = build_corr_pyramid(f1, f2)
    pyr_t = build_corr_pyramid_t(f1, f2)
    xg, yg = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                          jnp.arange(h8, dtype=jnp.float32), indexing="xy")
    base = jnp.tile(jnp.stack([xg, yg], -1)[None], (b, 1, 1, 1))

    for coords in (base + jnp.array([3.3, -2.7]), base * 3.0 - 50.0):
        ref = lookup_corr_gather(pyr, coords)
        outs = lanewise_lookup(pyr_t, coords, interpret=True)
        got = jnp.concatenate(
            [o.reshape(b, 81, h8, w8).transpose(0, 2, 3, 1) for o in outs],
            axis=-1)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # ragged N (pad path): 10x9 = 90 pixels < 128
    h2, w2 = 10, 9
    f1s = jax.random.normal(jax.random.PRNGKey(2), (1, h2, w2, c))
    f2s = jax.random.normal(jax.random.PRNGKey(3), (1, h2, w2, c))
    pyr_s = build_corr_pyramid(f1s, f2s)
    pyr_st = build_corr_pyramid_t(f1s, f2s)
    coords = (jnp.stack(jnp.meshgrid(jnp.arange(w2, dtype=jnp.float32),
                                     jnp.arange(h2, dtype=jnp.float32),
                                     indexing="xy"), -1)[None] + 0.4)
    ref = lookup_corr_gather(pyr_s, coords)
    outs = lanewise_lookup(pyr_st, coords, interpret=True)
    got = jnp.concatenate(
        [o.reshape(1, 81, h2, w2).transpose(0, 2, 3, 1) for o in outs],
        axis=-1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_onthefly_lookup_matches_oracle_interpret():
    """On-the-fly correlation kernel (volume recomputed per block on the MXU,
    never materialized in HBM) vs gather oracle, including out-of-bounds
    windows, ragged N, and exact gradients through the XLA-reference VJP."""
    from robust_pose_tpu.models.raft import lookup_corr_gather
    from robust_pose_tpu.ops.pallas_corr_onthefly import (
        onthefly_lookup,
        pool_fmap_pyramid,
    )

    b, h8, w8, c = 2, 16, 24, 8  # N = 384 = 3 x 128
    f1 = jax.random.normal(jax.random.PRNGKey(0), (b, h8, w8, c))
    f2 = jax.random.normal(jax.random.PRNGKey(1), (b, h8, w8, c))
    pyr = build_corr_pyramid(f1, f2)
    f2_levels = pool_fmap_pyramid(f2)
    xg, yg = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                          jnp.arange(h8, dtype=jnp.float32), indexing="xy")
    base = jnp.tile(jnp.stack([xg, yg], -1)[None], (b, 1, 1, 1))

    for coords in (base + jnp.array([3.3, -2.7]), base * 3.0 - 50.0):
        ref = lookup_corr_gather(pyr, coords)
        outs = onthefly_lookup(f1, f2_levels, coords, interpret=True)
        got = jnp.concatenate(
            [o.reshape(b, 81, h8, w8).transpose(0, 2, 3, 1) for o in outs],
            axis=-1)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # ragged N (pad path): 10x9 = 90 pixels < 128
    h2, w2 = 10, 9
    f1s = jax.random.normal(jax.random.PRNGKey(2), (1, h2, w2, c))
    f2s = jax.random.normal(jax.random.PRNGKey(3), (1, h2, w2, c))
    pyr_s = build_corr_pyramid(f1s, f2s)
    coords = (jnp.stack(jnp.meshgrid(jnp.arange(w2, dtype=jnp.float32),
                                     jnp.arange(h2, dtype=jnp.float32),
                                     indexing="xy"), -1)[None] + 0.4)
    ref = lookup_corr_gather(pyr_s, coords)
    outs = onthefly_lookup(f1s, pool_fmap_pyramid(f2s), coords,
                           interpret=True)
    got = jnp.concatenate(
        [o.reshape(1, 81, h2, w2).transpose(0, 2, 3, 1) for o in outs],
        axis=-1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # gradients: custom VJP (XLA reference recompute) vs autodiff through the
    # differentiable gather oracle
    coords = base + jnp.array([1.3, -0.7])

    def loss_kernel(f1_, f2_, cs):
        outs = onthefly_lookup(f1_, pool_fmap_pyramid(f2_), cs,
                               interpret=True)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    def loss_oracle(f1_, f2_, cs):
        out = lookup_corr_gather(build_corr_pyramid(f1_, f2_), cs)
        # oracle is (B, H, W, 4*81) level-major; kernel list matches per level
        b_, h_, w_, _ = cs.shape
        outs = [out[..., 81 * l:81 * (l + 1)]
                .transpose(0, 3, 1, 2).reshape(b_, 81, h_ * w_)
                for l in range(4)]
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(f1, f2, coords)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(f1, f2, coords)
    for a, b_ in zip(g_k, g_o):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_instance_norm_stats_kernel_and_torch_parity():
    """Single-pass Pallas instance-norm stats (interpret mode) vs exact sums,
    and the full norm vs torch InstanceNorm2d(affine=False)."""
    import torch

    from robust_pose_tpu.ops.pallas_instance_norm import (
        instance_norm,
        instance_norm_stats,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 24, 20, 96)) * 2.0 + 1.0
    s, ss = instance_norm_stats(x, interpret=True)
    np.testing.assert_allclose(s, x.sum((1, 2)), rtol=1e-5)
    np.testing.assert_allclose(ss, (x * x).sum((1, 2)), rtol=1e-5)

    t = torch.nn.functional.instance_norm(
        torch.tensor(np.asarray(x)).permute(0, 3, 1, 2))
    y = instance_norm(x)
    np.testing.assert_allclose(y, t.permute(0, 2, 3, 1).numpy(), atol=2e-5)

    # the kernel must be differentiable (training on TPU backprops through
    # every encoder norm): custom-VJP grads vs XLA autodiff, probed with
    # fixed random linear weights (grads are exact: a + 2x*b)
    a = jax.random.normal(jax.random.PRNGKey(1), (3, 96))
    b_ = jax.random.normal(jax.random.PRNGKey(2), (3, 96))

    def loss_k(x_):
        s_, ss_ = instance_norm_stats(x_, interpret=True)
        return jnp.sum(a * s_) + jnp.sum(b_ * ss_)

    def loss_ref(x_):
        return (jnp.sum(a * x_.sum((1, 2)))
                + jnp.sum(b_ * (x_ * x_).sum((1, 2))))

    g_k = jax.grad(loss_k)(x)
    g_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(g_k, g_r, rtol=1e-5, atol=1e-5)


def test_raft_lookup_impls_agree():
    """RAFT forward with lookup='lanewise' matches lookup='xla' (f32)."""
    img1 = 255.0 * jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    img2 = 255.0 * jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    kw = dict(iters=3, dtype=jnp.float32, corr_dtype=jnp.float32)
    m_xla = RAFT(lookup="xla", **kw)
    variables = m_xla.init(jax.random.PRNGKey(0), img1, img2)
    f_xla, n_xla, i_xla = jax.jit(m_xla.apply)(variables, img1, img2)
    m_lane = RAFT(lookup="lanewise", **kw)
    f_lane, n_lane, i_lane = jax.jit(m_lane.apply)(variables, img1, img2)
    np.testing.assert_allclose(f_lane, f_xla, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(n_lane, n_xla, rtol=1e-4, atol=1e-3)
    m_otf = RAFT(lookup="onthefly", **kw)
    f_otf, n_otf, i_otf = jax.jit(m_otf.apply)(variables, img1, img2)
    np.testing.assert_allclose(f_otf, f_xla, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(n_otf, n_xla, rtol=1e-4, atol=1e-3)


def test_raft_dropout_config_honored():
    """configuration train.yaml carries model.dropout; the encoders must
    honor it (upstream RAFT Dropout2d): inactive at inference, active and
    channel-broadcast in training."""
    img = 255.0 * jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))
    model = RAFT(iters=1, dropout=0.5, dtype=jnp.float32,
                 corr_dtype=jnp.float32, lookup="xla")
    variables = model.init(jax.random.PRNGKey(1), img, img)

    # inference: deterministic, no rng needed
    f1, _, _ = model.apply(variables, img, img)
    f2, _, _ = model.apply(variables, img, img)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    # training: stochastic across rng keys
    fa, _, _ = model.apply(variables, img, img, True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    fb, _, _ = model.apply(variables, img, img, True,
                           rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.array_equal(np.asarray(fa), np.asarray(fb)), \
        "dropout must be active in training mode"
