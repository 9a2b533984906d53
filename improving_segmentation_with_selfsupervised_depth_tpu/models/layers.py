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


class _Conv3x3Params(nn.Module):
    """Parameter container mirroring nn.Conv's names/shapes ("Conv_0/kernel",
    "Conv_0/bias") so Conv3x3's param tree is unchanged while the forward can
    route through either the plain conv or the fused up2+concat+conv path."""

    out_ch: int
    in_ch: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", kaiming_out, (3, 3, self.in_ch, self.out_ch))
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return kernel, bias


def _conv_nhwc(x, kernel, dtype):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _up2_phase_conv(x, kernel, dtype):
    """conv3x3(nearest_x2(x)) without materializing the upsampled tensor.

    Nearest x2 makes adjacent 3x3 taps hit the SAME source pixel, so each of
    the 4 output phases (a, b) = (row, col parity) is a 2x2 conv on the
    half-res input with tap-summed weights:
      rows: a=0 -> (W0, W1+W2), a=1 -> (W0+W1, W2);  cols likewise.
    Border semantics: reflect-pad of the x2-upsampled tensor equals EDGE-pad
    of the half-res input (up2 rows (0,1) are both x[0], so reflecting row -1
    lands on x[0]) — exact, not an approximation. 2.25x fewer MACs than the
    materialized form and one full-res tensor less traffic.
    Tap sums run in f32 (param precision) before the cast to `dtype`.
    """
    n, h, w, c = x.shape
    # row-pair weights (2, 3, cin, cout) per row phase
    r0 = jnp.stack([kernel[0], kernel[1] + kernel[2]])
    r1 = jnp.stack([kernel[0] + kernel[1], kernel[2]])
    phases = {}
    for a, ra in ((0, r0), (1, r1)):
        for b in (0, 1):
            if b == 0:
                k_ab = jnp.stack([ra[:, 0], ra[:, 1] + ra[:, 2]], axis=1)
            else:
                k_ab = jnp.stack([ra[:, 0] + ra[:, 1], ra[:, 2]], axis=1)
            phases[(a, b)] = k_ab  # (2, 2, cin, cout)
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    outs = {}
    for (a, b), k_ab in phases.items():
        full = _conv_nhwc(xp, k_ab, dtype)          # (n, h+1, w+1, cout)
        outs[(a, b)] = full[:, a:h + a, b:w + b, :]
    row0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)  # (n, h, w, 2, co)
    row1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
    out = jnp.stack([row0, row1], axis=2)           # (n, h, 2, w, 2, co)
    return out.reshape(n, 2 * h, 2 * w, -1)


class Conv3x3(nn.Module):
    """Reflection-pad + 3x3 conv (reference monodepth_layers.py:127-142).

    `up2_cat=True` treats `x` as the HALF-resolution tensor that would be
    nearest-x2 upsampled and concatenated with `skip` before the conv
    (monodepth decoder stage pattern): the conv kernel is split over the
    channel groups and the upsampled group runs as 4 phase convs — the same
    math without ever materializing the upsampled full-res tensor
    (see `_up2_phase_conv`)."""

    out_ch: int
    use_refl: bool = True
    # zero-pad the kernel's output channels to this width at call time and
    # slice the result back: EXACT same math (zero filters produce discarded
    # zeros) but avoids XLA's pathological C_out=1 conv lowering — the disp
    # heads measured 0.8-2.2 TF/s vs 50-90 for the neighboring convs. Param
    # tree unchanged.
    pad_out_to: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, up2_cat: bool = False):
        if not up2_cat:
            assert skip is None
            mode = "reflect" if self.use_refl else "constant"
            cin = x.shape[-1]
            kernel, bias = _Conv3x3Params(self.out_ch, cin, name="Conv_0")()
            if self.pad_out_to > self.out_ch:
                pad = self.pad_out_to - self.out_ch
                kernel = jnp.pad(kernel, [(0, 0)] * 3 + [(0, pad)])
                bias = jnp.pad(bias, [(0, pad)])
            xpad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode=mode)
            out = _conv_nhwc(xpad, kernel, self.dtype)
            out = out + bias.astype(self.dtype)
            if self.pad_out_to > self.out_ch:
                out = out[..., :self.out_ch]
            return out
        assert self.use_refl  # decoder stages always reflect-pad
        c_up = x.shape[-1]
        c_skip = 0 if skip is None else skip.shape[-1]
        kernel, bias = _Conv3x3Params(self.out_ch, c_up + c_skip, name="Conv_0")()
        out = _up2_phase_conv(x, kernel[:, :, :c_up], self.dtype)
        if skip is not None:
            spad = jnp.pad(skip, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
            out = out + _conv_nhwc(spad, kernel[:, :, c_up:], self.dtype)
        return out + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    """Conv3x3 + optional BN + ELU + optional 2D dropout
    (reference monodepth_layers.py:108-124)."""

    out_ch: int
    bn: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, up2_cat: bool = False, *, train: bool = False):
        x = Conv3x3(self.out_ch, dtype=self.dtype)(x, skip=skip, up2_cat=up2_cat)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.elu(x)
        if self.dropout > 0:
            # 2D (channel-wise) dropout, like torch nn.Dropout2d
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


class PaddedConv1x1(nn.Module):
    """1x1 conv whose output channels are zero-padded to `pad_to` for the
    conv and sliced back — identical math, avoids XLA's slow small-C_out
    lowering for classifier heads (19 classes measured ~3 TF/s). Param
    names/shapes match nn.Conv ("kernel"/"bias") so checkpoints and the
    torch converter are unaffected."""

    out_ch: int
    pad_to: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming_out, (1, 1, cin, self.out_ch))
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        pad = max(self.pad_to - self.out_ch, 0)
        kernel = jnp.pad(kernel, [(0, 0)] * 3 + [(0, pad)])
        bias = jnp.pad(bias, [(0, pad)])
        out = _conv_nhwc(x, kernel, self.dtype) + bias.astype(self.dtype)
        return out[..., :self.out_ch]


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
