"""Shared model building blocks (Flax linen, NHWC).

Counterparts of reference models/monodepth_layers.py:108-142 (ConvBlock,
Conv3x3) and models/model_parts.py (ASPP, SelfAttention), re-expressed as
functional Flax modules. Convs run in bf16 under the mixed-precision policy
(set by the caller's dtype) with fp32 params.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

# torch-style kaiming-normal fan_out (reference resnet init,
# models/resnet_encoder.py:36-41) — sensible default for all convs here.
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class Conv3x3(nn.Module):
    """Reflection-pad + 3x3 conv (reference monodepth_layers.py:127-142)."""

    out_ch: int
    use_refl: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mode = "reflect" if self.use_refl else "constant"
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode=mode)
        return nn.Conv(self.out_ch, (3, 3), padding="VALID", dtype=self.dtype,
                       kernel_init=kaiming_out)(x)


class ConvBlock(nn.Module):
    """Conv3x3 + optional BN + ELU + optional 2D dropout
    (reference monodepth_layers.py:108-124)."""

    out_ch: int
    bn: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = Conv3x3(self.out_ch, dtype=self.dtype)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.elu(x)
        if self.dropout > 0:
            # 2D (channel-wise) dropout, like torch nn.Dropout2d
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


class ConvBNReLU(nn.Module):
    out_ch: int
    kernel: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = ((self.kernel - 1) // 2) * self.dilation
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel), padding=pad,
                    kernel_dilation=(self.dilation, self.dilation), use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference models/model_parts.py:5-32,
    torchvision deeplabv3 assembly): 1x1 branch + dilated 3x3 branches +
    optional global-pool branch -> 1x1 projection + BN + ReLU + dropout(0.5)."""

    atrous_rates: Sequence[int]
    pooling: bool = True
    out_ch: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        branches = [ConvBNReLU(self.out_ch, 1, dtype=self.dtype)(x, train=train)]
        for r in self.atrous_rates:
            branches.append(ConvBNReLU(self.out_ch, 3, dilation=r, dtype=self.dtype)(x, train=train))
        if self.pooling:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
            pooled = ConvBNReLU(self.out_ch, 1, dtype=self.dtype)(pooled, train=train)
            # broadcast back (1x1 pooled -> bilinear upsample == broadcast)
            branches.append(jnp.broadcast_to(pooled, x.shape[:3] + (self.out_ch,)))
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.out_ch, 1, dtype=self.dtype)(y, train=train)
        return nn.Dropout(0.5, deterministic=not train)(y)


class SelfAttention(nn.Module):
    """Conv-gated local attention with zero-initialized gate
    (reference models/model_parts.py:35-46)."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, kernel_init=kaiming_out)(x)
        gate = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                       dtype=self.dtype, kernel_init=nn.initializers.zeros)(x)
        return feats * nn.sigmoid(gate)
