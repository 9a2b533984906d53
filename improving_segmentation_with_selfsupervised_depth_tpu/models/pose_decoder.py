"""Pose decoder (Flax linen, NHWC).

Reference models/pose_decoder.py:18-58: 1x1 squeeze(->256) + ReLU, three convs
(3x3, 3x3, 1x1 to 6*num_frames), global mean over H,W, scaled by 0.01 and
split into axis-angle + translation.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_out


class PoseDecoder(nn.Module):
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features: Sequence[Sequence[jnp.ndarray]]):
        last = [f[-1] for f in input_features]
        squeeze = nn.Conv(256, (1, 1), dtype=self.dtype, kernel_init=kaiming_out,
                          name="squeeze")  # one shared squeeze conv (reference pose_decoder.py:30,42)
        out = jnp.concatenate([nn.relu(squeeze(f)) for f in last], axis=-1)
        out = nn.relu(nn.Conv(256, (3, 3), strides=self.stride, padding=1,
                              dtype=self.dtype, kernel_init=kaiming_out, name="pose_0")(out))
        out = nn.relu(nn.Conv(256, (3, 3), strides=self.stride, padding=1,
                              dtype=self.dtype, kernel_init=kaiming_out, name="pose_1")(out))
        out = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), dtype=self.dtype,
                      kernel_init=kaiming_out, name="pose_2")(out)
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # (N, 6*F)
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]  # axisangle, translation
