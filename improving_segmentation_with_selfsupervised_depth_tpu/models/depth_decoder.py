"""Monodepth U-Net decoder (Flax linen, NHWC).

Re-design of reference models/depth_decoder.py:22-116:
- 5 decoder stages i = n_upconv..0, each: upconv0 (ConvBlock, or ASPP at the
  bottleneck stage when `intermediate_aspp`) -> nearest x2 upsample *only when
  the skip is spatially larger* (static-shape check — with a dilated encoder
  stages 4/3 share stride) -> concat with (optionally 1x1-projected) skip ->
  upconv1.
- sigmoid `dispconv` heads at `scales` (when `enable_disparity`).
- partial execution via a static `exec_layer` tuple and bottleneck injection
  `x=` (used by the PAD multi-task decoder to splice attention between the two
  halves, reference joint_segmentation_depth_decoder.py:138-164).

Outputs dict: "upconv_{i}" per executed stage, "disp_{s}" per scale head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ASPP, Conv3x3, ConvBlock, ConvBNReLU, phase_unpack


class DepthDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    intermediate_aspp: bool = False
    aspp_rates: Sequence[int] = (6, 12, 18)
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    n_upconv: int = 4
    batch_norm: bool = False
    dropout: float = 0.0
    n_project_skip_ch: int = -1
    aspp_pooling: bool = True
    enable_disparity: bool = True
    # Run stage 0 (the full-resolution stage) in the phase-packed
    # (space-to-depth) domain: the 4 phase outputs of the fused up2-conv stay
    # channel-packed at half resolution, ELU/dropout/dispconv consume them
    # there, and the full-res `upconv_0` is only interleaved on demand (XLA
    # DCEs it when no consumer reads it). Full-res C=64 tensors are the
    # slowest thing XLA lowers in this model (12%-MXU convs + layout flips,
    # docs/profile_r03.md); the packed form is mathematically identical
    # (tests pin it) and keeps every stage-0 op at C=256 quarter-area.
    packed_stage0: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: Sequence[jnp.ndarray],
        x: Optional[jnp.ndarray] = None,
        exec_layer: Optional[Tuple[int, ...]] = None,
        *,
        train: bool = False,
    ):
        outputs = {}
        if x is None:
            x = input_features[-1]
        layers = tuple(range(self.n_upconv, -1, -1)) if exec_layer is None else tuple(exec_layer)

        for i in range(self.n_upconv, -1, -1):
            if i not in layers:
                continue
            # upconv0
            if i == self.n_upconv and self.intermediate_aspp:
                x = ASPP(self.aspp_rates, self.aspp_pooling, self.num_ch_dec[i],
                         dtype=self.dtype, name=f"upconv_{i}_0")(x, train=train)
            else:
                x = ConvBlock(self.num_ch_dec[i], bn=self.batch_norm, dropout=self.dropout,
                              dtype=self.dtype, name=f"upconv_{i}_0")(x, train=train)
            # upsample only when spatially needed (static shapes)
            needs_up = i == 0 or x.shape[2] < input_features[i - 1].shape[2]
            skip = None
            if self.use_skips and i > 0:
                skip = input_features[i - 1]
                if self.n_project_skip_ch != -1:
                    skip = ConvBNReLU(self.n_project_skip_ch, 1, dtype=self.dtype,
                                      name=f"skip_proj_{i}")(skip, train=train)
            packed = (i == 0 and self.packed_stage0 and not self.batch_norm
                      and skip is None and needs_up)
            if needs_up:
                # fused nearest-x2 + concat + conv3x3: same math, the
                # upsampled full-res tensor is never materialized
                # (models/layers.py _up2_phase_conv); at stage 0 the output
                # additionally STAYS phase-packed (packed_stage0 above)
                x = ConvBlock(self.num_ch_dec[i], bn=self.batch_norm,
                              dropout=self.dropout, dtype=self.dtype,
                              name=f"upconv_{i}_1")(x, skip=skip, up2_cat=True,
                                                    packed_out=packed,
                                                    train=train)
            else:
                if skip is not None:
                    x = jnp.concatenate([x, skip], axis=-1)
                x = ConvBlock(self.num_ch_dec[i], bn=self.batch_norm,
                              dropout=self.dropout, dtype=self.dtype,
                              name=f"upconv_{i}_1")(x, train=train)
            if packed:
                # interleaved view for consumers (seg head, PAD final head);
                # dead-code-eliminated when only disp heads read stage 0.
                # Packed-aware consumers read `upconv_0_packed` instead and
                # the interleave never materializes (joint.py / seg_decoder.py
                # pop the extra key before returning their output dicts).
                outputs[f"upconv_{i}"] = phase_unpack(x, self.num_ch_dec[i])
                outputs["upconv_0_packed"] = x
            else:
                outputs[f"upconv_{i}"] = x
            if i in self.scales and self.enable_disparity:
                # pad_out_to=8: XLA's C_out=1 conv lowering runs ~50x below
                # MXU rate; zero-padded output channels (sliced away) are
                # mathematically identical and lower well (see layers.py)
                disp = Conv3x3(self.num_output_channels, dtype=self.dtype,
                               pad_out_to=8, name=f"dispconv_{i}")(
                    x, packed_in=packed)
                outputs[f"disp_{i}"] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs
