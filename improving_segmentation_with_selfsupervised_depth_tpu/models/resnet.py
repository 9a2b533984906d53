"""ResNet feature-pyramid encoder (Flax linen, NHWC).

TPU-native re-design of the reference encoder (models/resnet_encoder.py):
- same 5-scale pyramid contract: [relu1, layer1, layer2, layer3, layer4] with
  channels [64, 64, 128, 256, 512] (x4 from layer1 for depth >= 50)
- input normalization (x - 0.45) / 0.225 baked in (resnet_encoder.py:92)
- `replace_stride_with_dilation` with torchvision semantics (stride -> 1,
  dilation *= stride per dilated stage)
- multi-image input for the pose encoder (conv1 over num_input_images*3
  channels, resnet_encoder.py:19-61)

NHWC + bf16-friendly: convs take dtype (param dtype stays fp32).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_out

_STAGES = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def num_ch_enc(depth: int) -> Tuple[int, ...]:
    base = (64, 64, 128, 256, 512)
    if depth > 34:
        return (64, 256, 512, 1024, 2048)
    return base


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype)
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation), use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out, name="conv1")(x)
        y = bn()(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation), use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out, name="conv2")(y)
        y = bn()(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                               dtype=self.dtype, kernel_init=kaiming_out, name="ds_conv")(x)
            identity = bn()(identity)
        return nn.relu(y + identity)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype)
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv1")(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation), use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out, name="conv2")(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out, name="conv3")(y)
        y = bn()(y)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, kernel_init=kaiming_out,
                               name="ds_conv")(x)
            identity = bn()(identity)
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """5-scale feature pyramid: returns [f0 (stride 2), f1 (4), f2, f3, f4].

    With `replace_stride_with_dilation=(False, False, True)` (the r101
    configuration used throughout the reference), f3 and f4 share stride 16.
    """

    depth: int = 101
    num_input_images: int = 1
    replace_stride_with_dilation: Optional[Sequence[bool]] = None
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block_kind, stage_sizes = _STAGES[self.depth]
        block = _BasicBlock if block_kind == "basic" else _Bottleneck
        if self.remat:
            # rematerialize each residual block: trades recompute for HBM,
            # enabling larger per-chip batches (jax.checkpoint)
            block = nn.remat(block, static_argnums=(2,))
        dilate = self.replace_stride_with_dilation or (False, False, False)

        x = (x - 0.45) / 0.225  # baked-in normalization (resnet_encoder.py:92)
        # NOTE: a space-to-depth stem (7x7/s2 Cin=3 re-expressed as 4x4/s1 on
        # the 2x2-packed input, the classic TPU ResNet trick) measured ~5 ms
        # SLOWER in-step on v5e (253.6 vs 248.4 ms steady, bs8 512^2) — the
        # full-res 6D relayout outweighs the conv win here. docs/profile_r03.md.
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        f0 = nn.relu(x)

        x = jnp.pad(f0, [(0, 0), (1, 1), (1, 1), (0, 0)], constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        features = [f0]
        dilation = 1
        in_ch = 64  # channels entering the stage
        for stage_i, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), stage_sizes)):
            # torchvision _make_layer semantics: the stage's first block uses
            # the dilation from *before* this stage's dilate update.
            stride = 1 if stage_i == 0 else 2
            prev_dilation = dilation
            if stage_i > 0 and dilate[stage_i - 1]:
                dilation *= stride
                stride = 1
            out_ch = planes * (1 if block_kind == "basic" else 4)
            for b in range(n_blocks):
                needs_ds = b == 0 and (stride != 1 or in_ch != out_ch)
                x = block(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=(prev_dilation if b == 0 else dilation),
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage_i + 1}_{b}",
                )(x, train)
            in_ch = out_ch
            features.append(x)

        return features
