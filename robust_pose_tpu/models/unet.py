"""UNet / TinyUNet confidence weight heads in flax.

TPU-native rebuild of reference core/unet/unet.py:7-82. Faithfully preserves
the reference's architectural quirks so converted PyTorch weights are drop-in:

* 3x3 convolutions with **no padding** (torch ``nn.Conv2d`` default) and
  center-cropped skip connections (reference unet.py:53-58),
* DownBlock order conv->norm->relu->conv vs UpBlock order
  conv->relu->norm->conv (reference unet.py:15-20),
* final bilinear resize to the requested output size (``retain_dim``,
  reference unet.py:75-76).

Layout is NHWC (TPU-native); the PoseNet boundary transposes.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class DownBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="norm")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_ch, (3, 3), padding="VALID", dtype=self.dtype,
                       name="conv2")(x)


class UpBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="norm")(x)
        return nn.Conv(self.out_ch, (3, 3), padding="VALID", dtype=self.dtype,
                       name="conv2")(x)


def _center_crop(x: Array, h: int, w: int) -> Array:
    """Crop skip features to the decoder size (reference unet.py:53-58)."""
    h2, w2 = x.shape[1], x.shape[2]
    dh, dw = (h2 - h) // 2, (w2 - w) // 2
    return x[:, dh:h2 - dh, dw:w2 - dw][:, :h, :w]


class UNet(nn.Module):
    enc_chs: Sequence[int] = (3, 64, 128, 256, 512, 1024)
    dec_chs: Sequence[int] = (1024, 512, 256, 128, 64)
    num_class: int = 1
    retain_dim: bool = False
    out_sz: Tuple[int, int] = (572, 572)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        for i, ch in enumerate(self.enc_chs[1:]):
            x = DownBlock(ch, dtype=self.dtype, name=f"enc{i}")(x, train)
            feats.append(x)
            if i < len(self.enc_chs) - 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        feats = feats[::-1]
        x = feats[0]
        for i, ch in enumerate(self.dec_chs[1:]):
            # transpose_kernel=True matches torch ConvTranspose2d semantics
            # (kernel layout (kh, kw, out, in); see utils/torch_convert.py)
            x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                 transpose_kernel=True, dtype=self.dtype,
                                 name=f"upconv{i}")(x)
            skip = _center_crop(feats[i + 1], x.shape[1], x.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
            x = UpBlock(ch, dtype=self.dtype, name=f"dec{i}")(x, train)

        # the 1x1 head + resize stay f32 (confidences feed the GN solver)
        x = nn.Conv(self.num_class, (1, 1), dtype=jnp.float32,
                    name="head")(x.astype(jnp.float32))
        if self.retain_dim:
            x = jax.image.resize(
                x, (x.shape[0], *self.out_sz, x.shape[-1]), method="linear"
            )
        return x


class TinyUNet(nn.Module):
    """enc (in, 16, 32, 64), dec (64, 32, 16) — reference unet.py:80-82.

    ``levels`` (default 3 = reference architecture) truncates the
    encoder/decoder; levels < 3 shrink the minimum spatial size the VALID-pad
    convolutions admit (used by tests/the multi-chip dryrun to validate the
    weight-head + BatchNorm plumbing on tiny shapes)."""

    in_channels: int
    output_size: Tuple[int, int]
    dtype: Any = jnp.float32
    levels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc = (self.in_channels, 16, 32, 64)[: self.levels + 1]
        dec = tuple(reversed(enc[1:]))
        return UNet(
            enc_chs=enc,
            dec_chs=dec,
            out_sz=tuple(self.output_size),
            retain_dim=True,
            dtype=self.dtype,
            name="unet",
        )(x, train)
