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


class _StemConv(nn.Module):
    """Drop-in for the stem `nn.Conv(features, (7, 7), strides=2, padding=3,
    use_bias=False)`, computed via space-to-depth: the 7x7/stride-2 conv on
    (H, W, Cin) is re-expressed exactly as a 4x4/stride-1 conv on the 2x2
    space-to-depth tensor (H/2, W/2, 4*Cin) with rearranged (zero-padded 8x8)
    weights. Cin=3 convs run far below MXU rate on TPU (the input channel dim
    can't fill the systolic array's contraction lanes); packing 2x2 pixel
    blocks into channels quadruples the contraction depth and halves the
    spatial extent — the standard TPU ResNet-stem formulation. The param tree
    ("kernel", (7, 7, Cin, features)) is unchanged, so torch checkpoint
    conversion and all init/transfer paths are unaffected.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        cin = x.shape[-1]
        assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
        kernel = self.param("kernel", kaiming_out, (7, 7, cin, self.features))
        # w8[2u+a, 2v+b, c, o] -> ws[u, v, (a, b, c), o]
        w8 = jnp.pad(kernel, [(0, 1), (0, 1), (0, 0), (0, 0)])
        ws = (w8.reshape(4, 2, 4, 2, cin, self.features)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * cin, self.features))
        # y[i] = sum_di w[di] * xp[2i + di] with xp = x padded 3 on the left;
        # right pad 5 keeps the length even for the 2x2 block reshape (the
        # extra taps hit w8's zero row/col or are sliced away below)
        xp = jnp.pad(x, [(0, 0), (3, 5), (3, 5), (0, 0)])
        n, hp, wp, _ = xp.shape
        xs = (xp.reshape(n, hp // 2, 2, wp // 2, 2, cin)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(n, hp // 2, wp // 2, 4 * cin))
        out = lax.conv_general_dilated(
            xs.astype(self.dtype), ws.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h_out = (x.shape[1] + 1) // 2
        w_out = (x.shape[2] + 1) // 2
        return out[:, :h_out, :w_out, :]


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
        x = _StemConv(64, dtype=self.dtype, name="conv1")(x)
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
