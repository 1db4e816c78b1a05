"""Numerical parity between the flax modules + weight converter and
torch implementations of the reference architectures.

The reference's networks are plain torch modules (core/unet/unet.py, the RAFT
submodule); here we instantiate equivalent torch modules with the reference's
exact layer names, push random weights through utils/torch_convert, and check
the flax outputs match torch to f32 tolerance. This validates conv/convT
kernel layouts, BatchNorm mapping, VALID-padding + crop semantics, and the
bilinear resize convention — the riskiest parts of checkpoint conversion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from robust_pose_tpu.models.raft import (
    BasicEncoder,
    BasicMotionEncoder,
    FlowHead,
    SepConvGRU,
)
from robust_pose_tpu.models.unet import TinyUNet
from robust_pose_tpu.utils.torch_convert import (
    _convert_bn,
    _convert_conv,
    _convert_encoder,
    _convert_tiny_unet,
)

torch.manual_seed(0)


def _to_nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _from_nhwc(x: jnp.ndarray) -> np.ndarray:
    return np.asarray(x).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# torch reference modules (reference core/unet/unet.py:7-82 semantics)
# ---------------------------------------------------------------------------

class TDownBlock(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3)
        self.norm = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3)

    def forward(self, x):
        return self.conv2(self.relu(self.norm(self.conv1(x))))


class TUpBlock(TDownBlock):
    def forward(self, x):
        return self.conv2(self.norm(self.relu(self.conv1(x))))


class TEncoder(tnn.Module):
    def __init__(self, chs):
        super().__init__()
        self.enc_blocks = tnn.ModuleList(
            [TDownBlock(chs[i], chs[i + 1]) for i in range(len(chs) - 1)])
        self.pool = tnn.MaxPool2d(2)

    def forward(self, x):
        ftrs = []
        for block in self.enc_blocks:
            x = block(x)
            ftrs.append(x)
            x = self.pool(x)
        return ftrs


class TDecoder(tnn.Module):
    def __init__(self, chs):
        super().__init__()
        self.chs = chs
        self.upconvs = tnn.ModuleList(
            [tnn.ConvTranspose2d(chs[i], chs[i + 1], 2, 2)
             for i in range(len(chs) - 1)])
        self.dec_blocks = tnn.ModuleList(
            [TUpBlock(chs[i], chs[i + 1]) for i in range(len(chs) - 1)])

    def forward(self, x, encoder_features):
        for i in range(len(self.chs) - 1):
            x = self.upconvs[i](x)
            enc = encoder_features[i]
            H2, W2 = enc.shape[-2:]
            H, W = x.shape[-2:]
            dh, dw = (H2 - H) // 2, (W2 - W) // 2
            enc = enc[..., dh:(H2 - dh), dw:(W2 - dw)][..., :H, :W]
            x = torch.cat([x, enc], dim=1)
            x = self.dec_blocks[i](x)
        return x


class TTinyUNet(tnn.Module):
    def __init__(self, in_channels, output_size):
        super().__init__()
        enc_chs = (in_channels, 16, 32, 64)
        dec_chs = (64, 32, 16)
        self.encoder = TEncoder(enc_chs)
        self.decoder = TDecoder(dec_chs)
        self.head = tnn.Conv2d(dec_chs[-1], 1, 1)
        self.out_sz = output_size

    def forward(self, x):
        f = self.encoder(x)
        out = self.decoder(f[::-1][0], f[::-1][1:])
        out = self.head(out)
        return F.interpolate(out, self.out_sz, mode="bilinear")


def test_tiny_unet_parity():
    in_ch = 12
    uh, uw = 64, 80
    tmodel = TTinyUNet(in_ch, (8 * uh, 8 * uw)).eval()
    # randomize BN stats so the test is not trivially mean0/var1
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    sd = {f"w.0.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = {}, {}
    _convert_tiny_unet(params, stats, sd, "w.0", "w")
    variables = {"params": params["w"], "batch_stats": stats["w"]}

    x = torch.randn(1, in_ch, uh, uw)
    with torch.no_grad():
        ty = tmodel(x).numpy()

    jmodel = TinyUNet(in_channels=in_ch, output_size=(8 * uh, 8 * uw))
    jy = _from_nhwc(jmodel.apply(variables, _to_nhwc(x)))
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# RAFT sub-modules (upstream princeton-vl RAFT semantics)
# ---------------------------------------------------------------------------

class TResidualBlock(tnn.Module):
    def __init__(self, in_planes, planes, norm_fn="instance", stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        self.relu = tnn.ReLU(inplace=True)
        if norm_fn == "instance":
            self.norm1 = tnn.InstanceNorm2d(planes)
            self.norm2 = tnn.InstanceNorm2d(planes)
            norm3 = tnn.InstanceNorm2d(planes)
        else:
            self.norm1 = tnn.BatchNorm2d(planes)
            self.norm2 = tnn.BatchNorm2d(planes)
            norm3 = tnn.BatchNorm2d(planes)
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_planes, planes, 1, stride=stride), norm3)

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        x = x if self.downsample is None else self.downsample(x)
        return self.relu(x + y)


class TBasicEncoder(tnn.Module):
    def __init__(self, output_dim=256, norm_fn="instance"):
        super().__init__()
        self.norm_fn = norm_fn
        if norm_fn == "instance":
            self.norm1 = tnn.InstanceNorm2d(64)
        else:
            self.norm1 = tnn.BatchNorm2d(64)
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.relu1 = tnn.ReLU(inplace=True)
        self.layer1 = tnn.Sequential(
            TResidualBlock(64, 64, norm_fn, 1), TResidualBlock(64, 64, norm_fn, 1))
        self.layer2 = tnn.Sequential(
            TResidualBlock(64, 96, norm_fn, 2), TResidualBlock(96, 96, norm_fn, 1))
        self.layer3 = tnn.Sequential(
            TResidualBlock(96, 128, norm_fn, 2), TResidualBlock(128, 128, norm_fn, 1))
        self.conv2 = tnn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


def test_basic_encoder_parity_instance():
    tmodel = TBasicEncoder(output_dim=256, norm_fn="instance").eval()
    sd2 = {f"x.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = {}, {}
    _convert_encoder(params, stats, sd2, "x", "e", norm="instance")
    variables = {"params": params["e"]}

    x = torch.randn(2, 3, 64, 96)
    with torch.no_grad():
        ty = tmodel(x).numpy()
    jmodel = BasicEncoder(output_dim=256, norm="instance")
    jy = _from_nhwc(jmodel.apply(variables, _to_nhwc(x)))
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=5e-4)


def test_basic_encoder_parity_batch():
    tmodel = TBasicEncoder(output_dim=256, norm_fn="batch").eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    sd = {f"x.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = {}, {}
    _convert_encoder(params, stats, sd, "x", "e", norm="batch")
    variables = {"params": params["e"], "batch_stats": stats["e"]}

    x = torch.randn(2, 3, 64, 96)
    with torch.no_grad():
        ty = tmodel(x).numpy()
    jmodel = BasicEncoder(output_dim=256, norm="batch")
    jy = _from_nhwc(jmodel.apply(variables, _to_nhwc(x)))
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=5e-4)


class TSepConvGRU(tnn.Module):
    def __init__(self, hidden_dim=128, input_dim=256):
        super().__init__()
        hd = hidden_dim
        self.convz1 = tnn.Conv2d(hd + input_dim, hd, (1, 5), padding=(0, 2))
        self.convr1 = tnn.Conv2d(hd + input_dim, hd, (1, 5), padding=(0, 2))
        self.convq1 = tnn.Conv2d(hd + input_dim, hd, (1, 5), padding=(0, 2))
        self.convz2 = tnn.Conv2d(hd + input_dim, hd, (5, 1), padding=(2, 0))
        self.convr2 = tnn.Conv2d(hd + input_dim, hd, (5, 1), padding=(2, 0))
        self.convq2 = tnn.Conv2d(hd + input_dim, hd, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


def test_sepconv_gru_parity():
    tmodel = TSepConvGRU().eval()
    sd = {f"x.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    params = {}
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        _convert_conv(params, sd, f"x.{name}", f"g/{name}")
    variables = {"params": params["g"]}

    h = torch.randn(1, 128, 16, 20)
    x = torch.randn(1, 256, 16, 20)
    with torch.no_grad():
        ty = tmodel(h, x).numpy()
    jy = _from_nhwc(SepConvGRU().apply(variables, _to_nhwc(h), _to_nhwc(x)))
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=5e-4)
