"""Segmentation decoders built on SDE features (Flax linen, NHWC).

- `JointSegDepthDecoder` — transfer-learning decoder (reference
  models/joint_segmentation_depth_decoder.py:11-75): runs a full DepthDecoder
  U-Net, 1x1-projects a chosen set of pyramid layers (0-4 encoder / 5-9
  decoder), bilinearly resizes them to `last_layer_size = full//output_stride`,
  concats, applies a conv-bn-relu-dropout head + 1x1 classifier, and upsamples
  logits to full resolution.
- `PAD` — privileged-attention multi-task decoder (reference
  joint_segmentation_depth_decoder.py:78-184): two DepthDecoders (depth + seg
  branches), split at `distillation_layer`; zero-initialized self-attention
  cross-distillation between the halves; final + optional intermediate 1x1 seg
  heads.

Layer indexing follows the reference `_get_layer` (models/utils.py:100-105):
layer l <= 4 -> encoder feature l; l in 5..9 -> decoder output upconv_{9-l}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .depth_decoder import DepthDecoder
from .layers import PaddedConv1x1, SelfAttention, kaiming_out, packed_conv3x3


def _get_layer(encoder_features, decoder_outputs, layer: int):
    if layer <= 4:
        return encoder_features[layer]
    return decoder_outputs[f"upconv_{9 - layer}"]


class _Conv1x1Params(nn.Module):
    """Bias-free 1x1-conv parameter container with nn.Conv's param layout
    ("<name>/kernel", (1, 1, cin, cout), kaiming_out) so the fused seg-head
    path below leaves the checkpoint tree identical to the nn.Conv path."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_out, (1, 1, self.in_ch, self.out_ch))


class _Conv3x3NoBiasParams(nn.Module):
    """Bias-free 3x3-conv parameter container (nn.Conv layout, see above)."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_out, (3, 3, self.in_ch, self.out_ch))


class JointSegDepthDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    num_classes: int
    layers: Sequence[int] = (9,)
    head_inter_channels: int = 64
    head_dropout: float = 0.1
    layer_dropout: float = 0.0
    output_stride: int = 1
    layer_out_channels: int = 64
    head_inter: bool = True
    depth_args: Optional[Dict[str, Any]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoder_features, *, train: bool = False):
        depth_args = dict(self.depth_args or {})
        unet = DepthDecoder(num_ch_enc=tuple(self.num_ch_enc), dtype=self.dtype,
                            name="unet_dec", **depth_args)
        seg_features = unet(encoder_features, train=train)

        seg_size = _get_layer(encoder_features, seg_features, 9).shape[1:3]
        last_size = (seg_size[0] // self.output_stride, seg_size[1] // self.output_stride)

        # Single-full-res-layer fast path: with one projected layer, no
        # resize and no dropout between, project_seg (1x1, no bias) followed
        # by head_conv (zero-pad 3x3, no bias) is one 3x3 conv with the
        # composed kernel W3[d, c, o] = sum_m P[c, m] W3[d, m, o] — same
        # math (linear maps compose; zero-padding commutes since P(0)=0),
        # one less full-res C=64 conv + round-trip. Params are unchanged
        # (both kernels still exist under their own names).
        fold = (self.head_inter and len(self.layers) == 1
                and self.layer_dropout == 0
                and _get_layer(encoder_features, seg_features,
                               self.layers[0]).shape[1:3] == tuple(last_size))
        x_packed = False
        if fold:
            layer = self.layers[0]
            feat = _get_layer(encoder_features, seg_features, layer)
            pk = _Conv1x1Params(feat.shape[-1], self.layer_out_channels,
                                name=f"project_seg{layer}")()
            hk = _Conv3x3NoBiasParams(self.layer_out_channels,
                                      self.head_inter_channels,
                                      name="head_conv")()
            composed = jnp.einsum("cm,ijmo->ijco", pk[0, 0], hk)
            if layer == 9 and "upconv_0_packed" in seg_features:
                # stage 0 never leaves the phase-packed domain: the composed
                # 3x3 conv, BN, relu and classifier all run at quarter area,
                # and only the num_classes-wide logits interleave to full res
                # (layers.py packed_conv3x3 / PaddedConv1x1(packed_in)). BN
                # sees the same value multiset via the exposed phase axis, so
                # stats/params are identical to the full-res path.
                xp = packed_conv3x3(
                    seg_features["upconv_0_packed"], composed,
                    jnp.zeros((self.head_inter_channels,), composed.dtype),
                    self.dtype, pad_mode="zero", keep_packed=True)
                n, h, w, c4 = xp.shape
                xr = xp.reshape(n, h, w, 4, c4 // 4)
                xr = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype,
                                  name="head_bn")(xr)
                x = nn.relu(xr).reshape(n, h, w, c4)
                x_packed = True
            else:
                x = lax.conv_general_dilated(
                    feat.astype(self.dtype), composed.astype(self.dtype), (1, 1),
                    [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="head_bn")(x)
                x = nn.relu(x)
            x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        else:
            stacked = []
            for layer in self.layers:
                proj = nn.Conv(self.layer_out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                               kernel_init=kaiming_out, name=f"project_seg{layer}")(
                    _get_layer(encoder_features, seg_features, layer)
                )
                stacked.append(resize_bilinear(proj, last_size, align_corners=False))
            x = jnp.concatenate(stacked, axis=-1)

            if self.layer_dropout > 0:
                x = nn.Dropout(self.layer_dropout, deterministic=not train)(x)
            if self.head_inter:
                x = nn.Conv(self.head_inter_channels, (3, 3), padding=1, use_bias=False,
                            dtype=self.dtype, kernel_init=kaiming_out, name="head_conv")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="head_bn")(x)
                x = nn.relu(x)
                x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        score = PaddedConv1x1(self.num_classes, dtype=self.dtype,
                              name="classifier")(x, packed_in=x_packed)
        if last_size != tuple(seg_size):
            score = resize_bilinear(score, seg_size, align_corners=False)
        return score.astype(jnp.float32)


class PAD(nn.Module):
    num_ch_enc: Sequence[int]
    num_classes: int
    final_layer: int = 9
    output_stride: int = 1
    distillation_layer: int = 7
    side_output: bool = True
    depth_args: Optional[Dict[str, Any]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoder_features, *, train: bool = False):
        depth_args = dict(self.depth_args or {})
        num_ch_dec = tuple(depth_args.get("num_ch_dec", (16, 32, 64, 128, 256)))
        n_upconv = depth_args.get("n_upconv", 4)
        num_scales = 4

        def layer_channels(layer: int) -> int:
            return self.num_ch_enc[layer] if layer <= 4 else num_ch_dec[9 - layer]

        depth_dec = DepthDecoder(num_ch_enc=tuple(self.num_ch_enc), scales=tuple(range(num_scales)),
                                 dtype=self.dtype, name="depth_dec", **depth_args)
        seg_dec = DepthDecoder(num_ch_enc=tuple(self.num_ch_enc), scales=tuple(range(num_scales)),
                               enable_disparity=False, dtype=self.dtype, name="seg_dec",
                               **depth_args)

        dec_distill_i = 9 - self.distillation_layer
        inter_key = f"upconv_{dec_distill_i}"
        first_half = tuple(range(n_upconv, dec_distill_i - 1, -1))
        second_half = tuple(range(dec_distill_i - 1, -1, -1))

        depth_features = depth_dec(encoder_features, exec_layer=first_half, train=train)
        seg_features = seg_dec(encoder_features, exec_layer=first_half, train=train)

        intermediate_seg = None
        if self.side_output:
            intermediate_seg = PaddedConv1x1(self.num_classes, dtype=self.dtype,
                                             name="seg_intermediate_head")(
                seg_features[inter_key]
            ).astype(jnp.float32)

        distill_ch = layer_channels(self.distillation_layer)
        sa_depth = SelfAttention(distill_ch, dtype=self.dtype, name="sa_depth")(
            depth_features[inter_key])
        sa_seg = SelfAttention(distill_ch, dtype=self.dtype, name="sa_seg")(
            seg_features[inter_key])

        merged_for_seg = seg_features[inter_key] + sa_depth
        merged_for_depth = depth_features[inter_key] + sa_seg

        depth_features.update(
            depth_dec(encoder_features, x=merged_for_depth, exec_layer=second_half, train=train))
        seg_features = seg_dec(encoder_features, x=merged_for_seg, exec_layer=second_half,
                               train=train)
        if self.final_layer == 9 and "upconv_0_packed" in seg_features:
            # consume the packed stage 0 directly: quarter-area 1x1 head,
            # only the logits interleave to full res (see layers.py)
            final_seg = PaddedConv1x1(self.num_classes, dtype=self.dtype,
                                      name="seg_final_head")(
                seg_features["upconv_0_packed"], packed_in=True
            ).astype(jnp.float32)
        else:
            final_seg = PaddedConv1x1(self.num_classes, dtype=self.dtype,
                                      name="seg_final_head")(
                _get_layer(None, seg_features, self.final_layer)
            ).astype(jnp.float32)

        seg_size = encoder_features[0].shape[1:3]
        last_size = (seg_size[0] // self.output_stride, seg_size[1] // self.output_stride)
        if self.side_output and last_size != tuple(seg_size):
            intermediate_seg = resize_bilinear(intermediate_seg, seg_size, align_corners=False)
        if last_size != tuple(seg_size):
            final_seg = resize_bilinear(final_seg, seg_size, align_corners=False)

        out = dict(depth_features)
        out.pop("upconv_0_packed", None)  # internal packed view, not API
        out["semantics"] = final_seg
        if self.side_output:
            out["intermediate_semantics"] = intermediate_seg
        return out
