"""PyTorch -> JAX weight conversion for reference checkpoints.

Maps the reference's torch state_dicts — RAFT (``raft-things.pth``, loaded in
reference core/pose/pose_net.py:137-147) and full PoseNet checkpoints
(``{'state_dict', 'config'}`` dicts, core/pose/pose_estimator.py:26-37) —
onto this package's flax variable trees.

Layout conversions:
* Conv2d weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
* ConvTranspose2d weight (I, O, kh, kw) -> flax kernel (kh, kw, I, O) with
  ``transpose_kernel=True`` semantics (validated in tests/test_torch_parity.py)
* BatchNorm2d weight/bias -> scale/bias params; running stats -> batch_stats
* InstanceNorm2d in the reference is affine=False -> no parameters
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _convT_w(w) -> np.ndarray:
    # torch (I, O, kh, kw) -> flax transpose_kernel=True layout (kh, kw, O, I)
    return np.asarray(w).transpose(2, 3, 1, 0)


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel 'module.' prefixes (reference pose_net.py:143-145)."""
    return {k.replace("module.", ""): v for k, v in state_dict.items()}


def _convert_conv(params: Dict, torch_sd: Dict, tpre: str, jpath: str,
                  transpose: bool = False):
    w = torch_sd[f"{tpre}.weight"]
    _set(params, f"{jpath}/kernel", _convT_w(w) if transpose else _conv_w(w))
    if f"{tpre}.bias" in torch_sd:
        _set(params, f"{jpath}/bias", np.asarray(torch_sd[f"{tpre}.bias"]))


def _convert_bn(params: Dict, stats: Dict, torch_sd: Dict, tpre: str,
                jpath: str):
    _set(params, f"{jpath}/scale", np.asarray(torch_sd[f"{tpre}.weight"]))
    _set(params, f"{jpath}/bias", np.asarray(torch_sd[f"{tpre}.bias"]))
    _set(stats, f"{jpath}/mean", np.asarray(torch_sd[f"{tpre}.running_mean"]))
    _set(stats, f"{jpath}/var", np.asarray(torch_sd[f"{tpre}.running_var"]))


def _convert_encoder(params, stats, sd, tpre: str, jpre: str, norm: str):
    """BasicEncoder (fnet: instance norm -> no params; cnet: batch norm)."""
    _convert_conv(params, sd, f"{tpre}.conv1", f"{jpre}/conv1")
    _convert_conv(params, sd, f"{tpre}.conv2", f"{jpre}/conv2")
    if norm == "batch":
        _convert_bn(params, stats, sd, f"{tpre}.norm1", f"{jpre}/norm1")
    for li in (1, 2, 3):
        for bi in (0, 1):
            tb = f"{tpre}.layer{li}.{bi}"
            jb = f"{jpre}/layer{li}_{bi}"
            _convert_conv(params, sd, f"{tb}.conv1", f"{jb}/conv1")
            _convert_conv(params, sd, f"{tb}.conv2", f"{jb}/conv2")
            if norm == "batch":
                _convert_bn(params, stats, sd, f"{tb}.norm1", f"{jb}/norm1")
                _convert_bn(params, stats, sd, f"{tb}.norm2", f"{jb}/norm2")
            if f"{tb}.downsample.0.weight" in sd:
                _convert_conv(params, sd, f"{tb}.downsample.0",
                              f"{jb}/downsample")
                if norm == "batch":
                    _convert_bn(params, stats, sd, f"{tb}.downsample.1",
                                f"{jb}/norm3")


def _permute_corr_window(kernel: np.ndarray, radius: int = 4,
                         levels: int = 4) -> np.ndarray:
    """Transpose the per-level (D, D) correlation-window channel blocks of a
    convc1 kernel (kh, kw, levels*D*D, O).

    Upstream RAFT samples the window with ``delta = meshgrid(dy, dx)`` whose
    FIRST component displaces X (corr.py quirk), so checkpoint channels are
    x-offset-major; this package's lookup emits y-offset-major windows.
    """
    d = 2 * radius + 1
    kh, kw, cin, cout = kernel.shape
    assert cin == levels * d * d, (cin, levels, d)
    k = kernel.reshape(kh, kw, levels, d, d, cout)
    return k.transpose(0, 1, 2, 4, 3, 5).reshape(kernel.shape)


def _convert_update_block(params, sd, tpre: str, jpre: str):
    enc = f"{tpre}.encoder"
    jenc = f"{jpre}/encoder"
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        _convert_conv(params, sd, f"{enc}.{name}", f"{jenc}/{name}")
    # remap the correlation-window channel order (see _permute_corr_window)
    node = params
    for p in f"{jenc}/convc1".split("/"):
        node = node[p]
    node["kernel"] = _permute_corr_window(node["kernel"])
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        _convert_conv(params, sd, f"{tpre}.gru.{name}", f"{jpre}/gru/{name}")
    _convert_conv(params, sd, f"{tpre}.flow_head.conv1", f"{jpre}/flow_head/conv1")
    _convert_conv(params, sd, f"{tpre}.flow_head.conv2", f"{jpre}/flow_head/conv2")


def convert_raft_state_dict(sd: Dict[str, Any]):
    """RAFT torch state_dict -> (params, batch_stats) nested dicts matching
    robust_pose_tpu.models.raft.RAFT."""
    sd = strip_module_prefix(sd)
    params: Dict = {}
    stats: Dict = {}
    _convert_encoder(params, stats, sd, "fnet", "fnet", norm="instance")
    _convert_encoder(params, stats, sd, "cnet", "cnet", norm="batch")
    _convert_update_block(params, sd, "update_block", "update/update_block")
    # torch: update_block.mask = Sequential(Conv3x3, ReLU, Conv1x1); lives
    # OUTSIDE the scanned step here (models/raft.py UpMaskHead — only the
    # final iteration's mask is ever consumed)
    _convert_conv(params, sd, "update_block.mask.0", "up_mask/mask_conv1")
    _convert_conv(params, sd, "update_block.mask.2", "up_mask/mask_conv2")
    return params, stats


def _convert_tiny_unet(params, stats, sd, tpre: str, jpre: str):
    """TinyUNet (reference unet.py:80-82); torch wraps it in
    Sequential(TinyUNet, Sigmoid) so keys live under '<head>.0.'."""
    for i in range(3):  # enc blocks
        tb = f"{tpre}.encoder.enc_blocks.{i}"
        jb = f"{jpre}/unet/enc{i}"
        _convert_conv(params, sd, f"{tb}.conv1", f"{jb}/conv1")
        _convert_conv(params, sd, f"{tb}.conv2", f"{jb}/conv2")
        _convert_bn(params, stats, sd, f"{tb}.norm", f"{jb}/norm")
    for i in range(2):  # dec blocks
        _convert_conv(params, sd, f"{tpre}.decoder.upconvs.{i}",
                      f"{jpre}/unet/upconv{i}", transpose=True)
        tb = f"{tpre}.decoder.dec_blocks.{i}"
        jb = f"{jpre}/unet/dec{i}"
        _convert_conv(params, sd, f"{tb}.conv1", f"{jb}/conv1")
        _convert_conv(params, sd, f"{tb}.conv2", f"{jb}/conv2")
        _convert_bn(params, stats, sd, f"{tb}.norm", f"{jb}/norm")
    _convert_conv(params, sd, f"{tpre}.head", f"{jpre}/unet/head")


def convert_posenet_state_dict(sd: Dict[str, Any]):
    """Full reference PoseNet state_dict -> flax variables
    {'params': ..., 'batch_stats': ...}."""
    sd = strip_module_prefix(sd)
    params: Dict = {}
    stats: Dict = {}
    raft_sd = {k[len("flow."):]: v for k, v in sd.items()
               if k.startswith("flow.")}
    rp, rs = convert_raft_state_dict(raft_sd)
    params["flow"] = rp
    stats["flow"] = rs
    _convert_tiny_unet(params, stats, sd, "weight_head_2d.0", "weight_head_2d")
    _convert_tiny_unet(params, stats, sd, "weight_head_3d.0", "weight_head_3d")
    params["loss_weight"] = np.asarray(sd["loss_weight"])
    return {"params": params, "batch_stats": stats}


def convert_posenet_pth(path: str) -> Dict:
    """Load a reference .pth checkpoint {'state_dict', 'config'} and convert
    (requires torch, CPU)."""
    import torch

    checkp = torch.load(path, map_location="cpu", weights_only=False)
    # DataParallel-trained checkpoints carry a 'module.' prefix the
    # reference strips at load (pose_estimator.py:33-35)
    sd = strip_module_prefix(checkp["state_dict"])
    sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert_posenet_state_dict(sd)
    return {"params": variables, "config": checkp["config"]}


def convert_raft_pth(path: str) -> Dict:
    """Load raft-things.pth (plain state_dict) -> flax variables for RAFT."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in sd.items()}
    params, stats = convert_raft_state_dict(sd)
    return {"params": params, "batch_stats": stats}
