"""Joint segmentation + self-supervised-depth model (Flax linen, NHWC).

Re-design of the reference container module
(models/joint_segmentation_depth.py:10-183). One Flax module owns the
submodules (keyed exactly like the reference's ModuleDict so param subtrees
map 1:1 for EMA masks / freezing / transfer checkpoints):

  encoder        ResNetEncoder backbone
  depth          DepthDecoder (when monodepth enabled and not mtl_pad)
  segmentation   JointSegDepthDecoder (when segmentation_name set)
  mtl_decoder    PAD (when segmentation_name == 'mtl_pad')
  pose_encoder   ResNetEncoder(num_input_images=2) (when pose enabled)
  pose           PoseDecoder
  imnet_encoder  frozen ImageNet-feature encoder for the feat-dist loss

Forward takes the string-keyed batch dict (see ops/photometric.py) and returns
the output dict: "bottleneck", "disp_{s}", "semantics",
["intermediate_semantics"], "cam_T_cam_0_{f}", "axisangle_0_{f}",
"translation_0_{f}", ["encoder_features", "imnet_features"].

Freezing is NOT done here — the optimizer partitions params by these submodule
names (engine/optim.py), the TPU-native equivalent of requires_grad=False.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.geometry import transformation_from_parameters
from ..ops.photometric import key_of
from .depth_decoder import DepthDecoder
from .pose_decoder import PoseDecoder
from .resnet import ResNetEncoder, num_ch_enc
from .seg_decoder import PAD, JointSegDepthDecoder


class JointSegmentationDepth(nn.Module):
    backbone_depth: int = 101
    replace_stride_with_dilation: Optional[Tuple[bool, bool, bool]] = None
    segmentation_name: Optional[str] = "joint_seg_depth_dec"
    segmentation_args: Optional[Dict[str, Any]] = None
    depth_args: Optional[Dict[str, Any]] = None
    num_classes: int = 19
    frame_ids: Tuple[Any, ...] = (0, -1, 1)
    num_scales: int = 4
    pose_model_input: str = "pairs"
    pose_pair_batching: bool = True
    provide_uncropped_for_pose: bool = False
    disable_monodepth: bool = False
    disable_pose: bool = False
    enable_imnet_encoder: bool = False
    imnet_encoder_dilation: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def use_pose_net(self) -> bool:
        return not (tuple(self.frame_ids) == (0, "s")) and not self.disable_pose

    def setup(self):
        assert self.frame_ids[0] == 0
        self.encoder = ResNetEncoder(
            depth=self.backbone_depth,
            replace_stride_with_dilation=self.replace_stride_with_dilation,
            remat=self.remat,
            dtype=self.dtype,
            name="encoder",
        )
        ch_enc = num_ch_enc(self.backbone_depth)
        depth_args = dict(self.depth_args or {})
        seg_args = dict(self.segmentation_args or {})

        if self.enable_imnet_encoder:
            self.imnet_encoder = ResNetEncoder(
                depth=self.backbone_depth,
                replace_stride_with_dilation=(
                    self.replace_stride_with_dilation if self.imnet_encoder_dilation else None
                ),
                remat=self.remat,
                dtype=self.dtype,
                name="imnet_encoder",
            )

        if self.use_pose_net and not self.disable_monodepth:
            num_pose_frames = 2 if self.pose_model_input == "pairs" else len(self.frame_ids)
            self.pose_encoder = ResNetEncoder(
                depth=18, num_input_images=num_pose_frames, dtype=self.dtype, name="pose_encoder"
            )
            self.pose = PoseDecoder(
                num_input_features=1, num_frames_to_predict_for=2, dtype=self.dtype, name="pose"
            )

        if self.segmentation_name == "mtl_pad":
            self.mtl_decoder = PAD(
                num_ch_enc=ch_enc, num_classes=self.num_classes, depth_args=depth_args,
                dtype=self.dtype, name="mtl_decoder", **seg_args,
            )
        else:
            if not self.disable_monodepth:
                self.depth = DepthDecoder(
                    num_ch_enc=ch_enc, scales=tuple(range(self.num_scales)),
                    dtype=self.dtype, name="depth", **depth_args,
                )
            if self.segmentation_name is not None:
                self.segmentation = JointSegDepthDecoder(
                    num_ch_enc=ch_enc, num_classes=self.num_classes, depth_args=depth_args,
                    dtype=self.dtype, name="segmentation", **seg_args,
                )

    def predict_poses(self, inputs, *, train: bool = False):
        """Pairwise pose prediction in temporal order with inversion for past
        frames (reference joint_segmentation_depth.py:20-70).

        TPU-first: with `pose_pair_batching` (default) the frame pairs are
        stacked on the batch axis and the pose encoder+decoder run ONCE per
        step instead of once per pair — same convs at 2x the batch, better
        MXU utilization, half the launches. Convs and the (norm-free) pose
        decoder match the pair loop to float reassociation noise (~1e-7);
        the only semantic delta is
        that the pose encoder's train-mode BatchNorm sees joint statistics
        over all pairs rather than per-pair (eval mode, which uses running
        stats, is exact — tests/test_models.py pins both). Set
        `pose_pair_batching: false` under `model:` for strict per-pair BN.
        """
        outputs = {}
        src = "color_full_aug" if self.provide_uncropped_for_pose else "color_aug"
        num_pose_frames = 2 if self.pose_model_input == "pairs" else len(self.frame_ids)
        if num_pose_frames == 2:
            feats = {f: inputs[key_of(src, f, 0)] for f in self.frame_ids}
            pair_frames = [f for f in self.frame_ids[1:] if f != "s"]
            pair_inputs = {
                f_i: (jnp.concatenate([feats[f_i], feats[0]], axis=-1) if f_i < 0
                      else jnp.concatenate([feats[0], feats[f_i]], axis=-1))
                for f_i in pair_frames
            }
            if self.pose_pair_batching and len(pair_frames) > 1:
                n = feats[0].shape[0]
                stacked = jnp.concatenate([pair_inputs[f] for f in pair_frames], axis=0)
                pose_feats = self.pose_encoder(stacked, train=train)
                axisangle, translation = self.pose([pose_feats])
                per_pair = {
                    f_i: (axisangle[i * n:(i + 1) * n], translation[i * n:(i + 1) * n])
                    for i, f_i in enumerate(pair_frames)
                }
            else:
                per_pair = {}
                for f_i in pair_frames:
                    pose_feats = self.pose_encoder(pair_inputs[f_i], train=train)
                    per_pair[f_i] = self.pose([pose_feats])
            for f_i in pair_frames:
                axisangle, translation = per_pair[f_i]
                outputs[key_of("axisangle", 0, f_i)] = axisangle
                outputs[key_of("translation", 0, f_i)] = translation
                outputs[key_of("cam_T_cam", 0, f_i)] = transformation_from_parameters(
                    axisangle[:, 0], translation[:, 0], invert=(f_i < 0)
                )
        else:
            pose_in = jnp.concatenate(
                [inputs[key_of(src, f, 0)] for f in self.frame_ids if f != "s"], axis=-1
            )
            pose_feats = self.pose_encoder(pose_in, train=train)
            axisangle, translation = self.pose([pose_feats])
            for i, f_i in enumerate(self.frame_ids[1:]):
                if f_i == "s":
                    continue
                outputs[key_of("axisangle", 0, f_i)] = axisangle
                outputs[key_of("translation", 0, f_i)] = translation
                outputs[key_of("cam_T_cam", 0, f_i)] = transformation_from_parameters(
                    axisangle[:, i], translation[:, i]
                )
        return outputs

    def __call__(self, inputs: Dict[str, jnp.ndarray], *, train: bool = False,
                 train_encoder_bn: Optional[bool] = None, use_pose: bool = True):
        """Forward pass (reference joint_segmentation_depth.py:77-100).

        `train_encoder_bn=False` emulates `freeze_backbone_bn` (reference
        train.py:465-466): the backbone uses running BN stats even in train
        mode. `use_pose=False` skips pose prediction (teacher forward,
        reference train.py:664).
        """
        outputs: Dict[str, jnp.ndarray] = {}
        enc_train = train if train_encoder_bn is None else train_encoder_bn
        features = self.encoder(inputs[key_of("color_aug", 0, 0)], train=enc_train)
        outputs["bottleneck"] = features[-1]

        if self.segmentation_name == "mtl_pad":
            outputs.update(self.mtl_decoder(features, train=train))
        else:
            if not self.disable_monodepth:
                outputs.update(self.depth(features, train=train))
                # internal phase-packed stage-0 view (models/depth_decoder.py)
                # — not part of the output contract; XLA DCEs the interleaved
                # upconv_0 when nothing downstream reads it
                outputs.pop("upconv_0_packed", None)
            if self.segmentation_name is not None:
                outputs["semantics"] = self.segmentation(features, train=train)

        if self.enable_imnet_encoder:
            outputs["encoder_features"] = features[-1]
            imnet = self.imnet_encoder(inputs[key_of("color_aug", 0, 0)], train=False)
            outputs["imnet_features"] = jax.lax.stop_gradient(imnet[-1])

        if self.use_pose_net and not self.disable_monodepth and use_pose:
            outputs.update(self.predict_poses(inputs, train=train))
        return outputs

    def predict_test_disp(self, inputs, *, train: bool = False):
        """Pose-free depth forward on un-augmented color (reference
        joint_segmentation_depth.py:72-75)."""
        features = self.encoder(inputs[key_of("color", 0, 0)], train=train)
        if self.segmentation_name == "mtl_pad":
            return self.mtl_decoder(features, train=train)
        return self.depth(features, train=train)


_BACKBONE_DEPTH = {"resnet18": 18, "resnet34": 34, "resnet50": 50, "resnet101": 101,
                   "resnet152": 152}


def build_model(model_cfg: Dict[str, Any], n_classes: int,
                dtype: Any = jnp.float32) -> JointSegmentationDepth:
    """Config-dict factory mirroring the reference signature
    (models/joint_segmentation_depth.py:116-183 + models/__init__.py:6-23).

    Pretrained-weight loading (backbone_pretraining/depth_pretraining/
    pose_pretraining) is handled by engine/checkpoints.py after init;
    freeze_* flags are consumed by engine/optim.py.
    """
    m = dict(model_cfg)
    rsd = m.get("replace_stride_with_dilation")
    depth_args = dict(m.get("depth_args") or {})
    depth_args.pop("max_scale_size", None)  # static shapes make it redundant
    seg_args = dict(m.get("segmentation_args") or {})
    seg_args.pop("weights", None)  # pretrained unet weights handled by checkpoints
    m["depth_args"], m["segmentation_args"] = depth_args, seg_args
    return JointSegmentationDepth(
        backbone_depth=_BACKBONE_DEPTH[m.get("backbone_name", "resnet101")],
        replace_stride_with_dilation=tuple(rsd) if rsd else None,
        segmentation_name=m.get("segmentation_name"),
        segmentation_args=m.get("segmentation_args") or {},
        depth_args=m.get("depth_args") or {},
        num_classes=n_classes,
        frame_ids=tuple(m.get("frame_ids", (0, -1, 1))),
        num_scales=m.get("num_scales", 4),
        pose_model_input=m.get("pose_model_input", "pairs"),
        pose_pair_batching=m.get("pose_pair_batching", True),
        provide_uncropped_for_pose=m.get("provide_uncropped_for_pose", False),
        disable_monodepth=m.get("disable_monodepth", False),
        disable_pose=m.get("disable_pose", False),
        enable_imnet_encoder=m.get("enable_imnet_encoder", False),
        imnet_encoder_dilation=m.get("imnet_encoder_dilation", True),
        remat=m.get("remat", False),
        dtype=dtype,
    )


def get_model(model_dict: Dict[str, Any], n_classes: int,
              dtype: Any = jnp.float32) -> JointSegmentationDepth:
    arch = model_dict.get("arch", "joint_segmentation_depth")
    if arch != "joint_segmentation_depth":
        raise ValueError(f"Unknown model arch {arch}")
    return build_model(model_dict, n_classes, dtype=dtype)
