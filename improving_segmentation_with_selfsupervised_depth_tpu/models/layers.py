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


def _up2_phase_conv(x, kernel, dtype, packed_out: bool = False):
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

    `packed_out=True` returns the PHASE-PACKED form (n, h, w, 4*cout) —
    channel block k = 2a+b holds output phase (row parity a, col parity b) —
    skipping the full-res interleave entirely (the stack+reshape and its
    backward measured ~9 ms/step on the flagship geometry; see
    docs/profile_r03.md). Downstream stage-0 ops consume this space-to-depth
    layout directly (`phase_unpack` recovers the full-res tensor exactly).
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
    # ONE conv for all 4 phases (kernels concat on the out-channel axis):
    # same MACs, 4x fewer conv dispatches and a 4x wider (lane-friendlier)
    # C_out than per-phase convs
    co = kernel.shape[3]
    kcat = jnp.concatenate([phases[(0, 0)], phases[(0, 1)],
                            phases[(1, 0)], phases[(1, 1)]], axis=3)
    full = _conv_nhwc(xp, kcat, dtype)              # (n, h+1, w+1, 4*cout)
    outs = {}
    for (a, b) in phases:
        k = 2 * a + b
        outs[(a, b)] = full[:, a:h + a, b:w + b, k * co:(k + 1) * co]
    if packed_out:
        return jnp.concatenate(
            [outs[(0, 0)], outs[(0, 1)], outs[(1, 0)], outs[(1, 1)]], axis=-1)
    row0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)  # (n, h, w, 2, co)
    row1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
    out = jnp.stack([row0, row1], axis=2)           # (n, h, 2, w, 2, co)
    return out.reshape(n, 2 * h, 2 * w, -1)


def phase_unpack(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Phase-packed (n, h, w, 4c) [block k=2a+b] -> full-res (n, 2h, 2w, c)."""
    n, h, w, _ = x.shape
    blocks = [x[..., k * c:(k + 1) * c] for k in range(4)]
    row0 = jnp.stack([blocks[0], blocks[1]], axis=3)   # (n, h, w, 2, c), dim3=b
    row1 = jnp.stack([blocks[2], blocks[3]], axis=3)
    out = jnp.stack([row0, row1], axis=2)              # (n, h, 2, w, 2, c)
    return out.reshape(n, 2 * h, 2 * w, c)


def _phase_pack_kernel_3x3(kernel: jnp.ndarray, bias: jnp.ndarray, out_pad: int):
    """(3,3,C,O) conv params -> the equivalent packed-domain 3x3 conv.

    A stride-1 3x3 conv on the full-res interleaved tensor is exactly a 3x3
    conv on the phase-packed tensor with a structured kernel: output phase
    (a, b), tap (di, dj) reads full-res row r = 2p + a + di - 1 = packed row
    p + U - 1 of input phase alpha, with alpha = r mod 2 and U the packed row
    offset (likewise beta/V for columns). Each per-phase output block is
    zero-padded to `out_pad` channels (XLA's tiny-C_out conv lowering is the
    reason the disp heads pad at all; 4*out_pad packed output channels fill
    the lanes). Returns (packed_kernel (3,3,4C,4*out_pad), packed_bias).
    """
    c, o = kernel.shape[2], kernel.shape[3]
    op = max(out_pad, o)
    pk = jnp.zeros((3, 3, 4 * c, 4 * op), kernel.dtype)
    pb = jnp.zeros((4 * op,), bias.dtype)
    for a in (0, 1):
        for b in (0, 1):
            kout = 2 * a + b
            pb = pb.at[kout * op:kout * op + o].set(bias)
            for di in range(3):
                r = a + di - 1
                alpha, u = r & 1, (r - (r & 1)) // 2 + 1
                for dj in range(3):
                    s = b + dj - 1
                    beta, v = s & 1, (s - (s & 1)) // 2 + 1
                    kin = 2 * alpha + beta
                    pk = pk.at[u, v, kin * c:(kin + 1) * c,
                               kout * op:kout * op + o].set(kernel[di, dj])
    return pk, pb


def _phase_reflect_pad1(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Packed-domain equivalent of full-res reflect-pad-by-1.

    Full-res row -1 reflects to row 1 = packed row 0, phase alpha=1; row 2H
    reflects to 2H-2 = packed row H-1, phase alpha=0. The opposite-parity
    blocks of each pad row/col are only ever multiplied by structural zeros
    of the packed kernel, so they are zero-filled. Pads 1 in the packed
    (quarter-area) space instead of materializing a (2H+2, 2W+2) copy.
    """
    z2 = jnp.zeros_like(x[:, :1, :, :2 * c])
    top = jnp.concatenate([z2, x[:, :1, :, 2 * c:]], axis=-1)
    bot = jnp.concatenate([x[:, -1:, :, :2 * c], z2], axis=-1)
    xp = jnp.concatenate([top, x, bot], axis=1)
    zc = jnp.zeros_like(xp[:, :, :1, :c])
    left = jnp.concatenate(
        [zc, xp[:, :, :1, c:2 * c], zc, xp[:, :, :1, 3 * c:4 * c]], axis=-1)
    right = jnp.concatenate(
        [xp[:, :, -1:, :c], zc, xp[:, :, -1:, 2 * c:3 * c], zc], axis=-1)
    return jnp.concatenate([left, xp, right], axis=2)


def packed_conv3x3(x, kernel, bias, dtype, pad_mode="reflect",
                   keep_packed=False, out_pad=0):
    """Full-res 3x3 conv executed in the phase-packed domain.

    `x` is (n, h, w, 4*cin) phase-packed; `kernel` the FULL-RES (3, 3, cin,
    cout) weights. Runs the exact full-res stride-1 conv with 1-pixel
    `pad_mode` padding ("reflect" or "zero") as a quarter-area conv with the
    structured packed kernel (`_phase_pack_kernel_3x3`). Returns the packed
    (n, h, w, 4*cout) result when `keep_packed`, else the interleaved
    full-res (n, 2h, 2w, cout) tensor. `out_pad` zero-pads each phase
    block's output channels for XLA's conv lowering (sliced back)."""
    c = x.shape[-1] // 4
    o = kernel.shape[3]
    op = max(out_pad, o)
    pk, pb = _phase_pack_kernel_3x3(kernel, bias, op)
    if pad_mode == "reflect":
        xp = _phase_reflect_pad1(x, c)
    else:
        # full-res zero-pad: every pad element is zero in every phase block
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    out = _conv_nhwc(xp, pk, dtype) + pb.astype(dtype)
    if op > o:
        out = jnp.concatenate(
            [out[..., k * op:k * op + o] for k in range(4)], axis=-1)
    return out if keep_packed else phase_unpack(out, o)


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
    def __call__(self, x, skip=None, up2_cat: bool = False,
                 packed_out: bool = False, packed_in: bool = False):
        if packed_in:
            # `x` is phase-packed (n, h, w, 4*cin): run the EXACT full-res
            # reflect-pad + 3x3 conv in the packed domain (structured packed
            # kernel + quarter-area pad). Returns the full-res (2h, 2w,
            # out_ch) result — same contract as the plain path.
            assert self.use_refl and skip is None and not up2_cat
            cin = x.shape[-1] // 4
            kernel, bias = _Conv3x3Params(self.out_ch, cin, name="Conv_0")()
            return packed_conv3x3(x, kernel, bias, self.dtype,
                                  pad_mode="reflect", out_pad=self.pad_out_to)
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
        if packed_out:
            assert skip is None  # stage 0 (the packed stage) has no skip
            out = _up2_phase_conv(x, kernel, self.dtype, packed_out=True)
            return out + jnp.tile(bias, 4).astype(self.dtype)
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
    def __call__(self, x, skip=None, up2_cat: bool = False,
                 packed_out: bool = False, *, train: bool = False):
        assert not (packed_out and self.bn)  # packed stage implies bn-free
        x = Conv3x3(self.out_ch, dtype=self.dtype)(x, skip=skip, up2_cat=up2_cat,
                                                   packed_out=packed_out)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.elu(x)
        if self.dropout > 0:
            # 2D (channel-wise) dropout, like torch nn.Dropout2d. In packed
            # form the same channel of all 4 phase blocks shares one draw
            # (full-res channel-wise semantics), via a reshape that exposes
            # the phase axis to the broadcast dims.
            if packed_out:
                n, h, w, c4 = x.shape
                x = x.reshape(n, h, w, 4, c4 // 4)
                x = nn.Dropout(self.dropout, broadcast_dims=(1, 2, 3),
                               deterministic=not train)(x)
                x = x.reshape(n, h, w, c4)
            else:
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
    def __call__(self, x, packed_in: bool = False):
        cin = x.shape[-1] // 4 if packed_in else x.shape[-1]
        kernel = self.param("kernel", kaiming_out, (1, 1, cin, self.out_ch))
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        if packed_in:
            # phase-packed input (n, h, w, 4*cin): a 1x1 conv acts on each
            # phase block independently with the SAME kernel, so run it as a
            # quarter-area matmul over an exposed phase axis and interleave
            # only the (cheap, out_ch-wide) result to full res.
            n, h, w, _ = x.shape
            xr = x.reshape(n, h, w, 4, cin).astype(self.dtype)
            out = jnp.einsum("nhwpc,co->nhwpo", xr,
                             kernel[0, 0].astype(self.dtype))
            out = out + bias.astype(self.dtype)
            return phase_unpack(out.reshape(n, h, w, 4 * self.out_ch),
                                self.out_ch)
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
