"""Jitted train / eval steps — the whole per-iteration compute graph.

TPU-native re-design of the reference Trainer's per-step logic
(train.py:442-549 `train_step`, 653-746 `train_step_segmentation_unlabeled`,
817-923 `validate`): one pure function per step kind, compiled once with pjit
and sharded over the data mesh. Everything the reference does across several
`backward(retain_graph=True)` calls is a single fused loss; the EMA teacher
update, strong augmentation, DepthMix mask generation, pseudo-labeling and the
confusion-matrix metric all execute on device inside the same program.

bf16 policy: the model computes in bf16 (model dtype), losses and the
optimizer in fp32 — the functional replacement for torch.cuda.amp
(train.py:300,468,502).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import photometric
from ..ops.image import color_jitter, gaussian_blur
from ..ops.losses import berhu, cross_entropy2d
from ..ops.metrics import confusion_matrix
from ..ops.mixing import (
    depthhist_thresholds,
    generate_class_mask,
    generate_depth_mask,
    generate_depthcomp_mask,
    mix,
)
from ..ops.photometric import key_of
from ..ops.resize import resize_bilinear
from .state import TrainState, update_ema

IGNORE = 250


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static (trace-time) configuration of the train/eval steps."""

    # lambdas (reference training.* cfg)
    monodepth_lambda: float = 0.0
    feat_dist_lambda: float = 0.0
    pseudo_depth_lambda: float = 0.0
    segmentation_lambda: float = 1.0
    pseudo_depth_loss_log: bool = False
    # monodepth geometry (reference monodepth_options)
    frame_ids: Tuple[Any, ...] = (0, -1, 1)
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 100.0
    test_min_depth: float = 0.1
    test_max_depth: float = 100.0
    disparity_smoothness: float = 1e-3
    no_ssim: bool = False
    avg_reprojection: bool = False
    disable_automasking: bool = False
    # SSIM/L1 chain compute dtype; bf16 under amp (the reference autocasts
    # the SSIM module to fp16 when monodepth configs set amp: true)
    photometric_dtype: Any = None
    # route the per-scale (gradient-path) reprojection error through the
    # fused Pallas SSIM+L1 kernel instead of the XLA chain (A/B knob;
    # training.fused_reprojection in configs)
    fused_pred_loss: bool = False
    # rematerialize the photometric SSIM/L1/automask chain on the backward
    # pass instead of storing its fusion residuals: trades VPU recompute for
    # HBM traffic on a BW-bound chain. The warp itself stays OUTSIDE the
    # remat boundary (its outputs are the saved residuals), so the Pallas
    # kernel never re-runs. (A/B knob; training.remat_photometric in configs)
    remat_photometric: bool = False
    # "pack": one multi-grid warp call per source frame, NCHW color_pred and
    # an NCHW SSIM/L1 chain (no full-res layout copies); "nhwc": one warp
    # call per (frame, scale) with NHWC outputs (A/B + debugging knob;
    # training.pred_layout in configs). Same math either way.
    pred_layout: str = "pack"
    # model-level switches
    disable_monodepth: bool = False
    disable_pose: bool = False
    freeze_backbone_bn: bool = False
    has_depth_teacher: bool = False
    num_classes: int = 19
    # semi-supervised (reference training.unlabeled_segmentation)
    unlabeled: bool = False
    consistency_weight: float = 1.0
    mix_mask: Optional[str] = None
    unlabeled_color_jitter: bool = False
    unlabeled_blur: bool = False
    mix_use_gt: bool = False
    depthcomp_margin: float = 0.0
    depthcomp_foreground_threshold: Any = 0.0
    depthmix_online_depth: bool = False
    backward_first_pseudo_label: bool = False
    # Fuse two of the step's student forwards into ONE batch-concatenated
    # forward (2N instead of 2xN), picking the pair by dependency structure:
    #  - online-depth DepthMix: labeled + unlabeled (the mixed forward needs
    #    the unlabeled disparities). The whole photometric chain (warp
    #    included) also runs once at 2N; the loss total is exact because each
    #    per-scale photometric loss is a batch mean, so m_labeled +
    #    m_unlabeled == 2 * m_combined for equal halves.
    #  - offline DepthMix (monodepth off, e.g. exp210): labeled + mixed (the
    #    mix mask is parameter-free there: offline pseudo-depth + teacher
    #    argmax). Both CE losses are computed per-half, so the totals are
    #    exact.
    # In both modes the only semantic delta is that train-mode BatchNorm sees
    # joint statistics over the 2N batch instead of two sequential N batches —
    # the same tradeoff `pose_pair_batching` (models/joint.py) already makes,
    # and the standard formulation in batch-concatenated semi-supervised
    # training (FixMatch-style interleaving).
    # Opt-in: training.fuse_unlabeled_forward.
    fuse_unlabeled_forward: bool = False
    # EMA teacher
    use_ema: bool = False
    ema_alpha: float = 0.99
    ema_names: Optional[Tuple[str, ...]] = None
    # debug: return mixed images / mask / pseudo-label from the step
    # (reference dumps class_mix_debug panels, train.py:726-744)
    debug_images: bool = False


def _apply(model, params, batch_stats, batch, *, train, rng=None, mutable=False, **kw):
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": rng} if rng is not None else None
    if mutable:
        out, mut = model.apply(variables, batch, train=train, rngs=rngs,
                               mutable=["batch_stats"], **kw)
        return out, mut.get("batch_stats", batch_stats)
    out = model.apply(variables, batch, train=train, rngs=rngs, **kw)
    return out, batch_stats


def _depth_loss_mask(disp0: jnp.ndarray) -> jnp.ndarray:
    """Zero the bottom 10% rows (own car hood), reference train.py:491-493."""
    h = disp0.shape[1]
    row = jnp.arange(h).reshape(1, h, 1, 1)
    return (row < int(h * 0.9)).astype(jnp.float32) * jnp.ones_like(disp0)


def _monodepth_loss(cfg: StepConfig, rng, batch, outputs):
    outputs = photometric.generate_images_pred(
        batch, outputs, scales=cfg.scales, frame_ids=cfg.frame_ids,
        min_depth=cfg.min_depth, max_depth=cfg.max_depth,
        pred_layout=cfg.pred_layout,
    )
    def _losses(rng, batch, outputs):
        return photometric.compute_losses(
            rng, batch, outputs,
            scales=cfg.scales, frame_ids=cfg.frame_ids,
            disparity_smoothness=cfg.disparity_smoothness, no_ssim=cfg.no_ssim,
            avg_reprojection=cfg.avg_reprojection,
            disable_automasking=cfg.disable_automasking,
            pred_dtype=cfg.photometric_dtype, fused_pred=cfg.fused_pred_loss,
            pred_layout=cfg.pred_layout,
        )

    if cfg.remat_photometric:
        # recompute the loss chain in bwd from the warped preds (which stay
        # residuals — the warp is outside this boundary and never re-runs)
        _losses = jax.checkpoint(_losses)
    losses = _losses(rng, batch, outputs)
    return losses["loss"], outputs


def _segmentation_loss(cfg: StepConfig, outputs, labels):
    seg_loss = cross_entropy2d(outputs["semantics"], labels)
    if "intermediate_semantics" in outputs:
        seg_loss = (seg_loss + cross_entropy2d(outputs["intermediate_semantics"], labels)) / 2.0
    return seg_loss * cfg.segmentation_lambda


def pseudo_label_loss(cfg: StepConfig, teacher_softmax, student_logits):
    """Confidence-weighted CE on (possibly mixed) teacher soft pseudo-labels.

    Reference train.py:644-651: pixels where the teacher max-prob is 0 are
    ignored; the whole batch is weighted by the fraction of pixels with
    max-prob >= 0.968.
    """
    max_probs = jnp.max(teacher_softmax, axis=-1)
    pseudo_label = jnp.argmax(teacher_softmax, axis=-1).astype(jnp.int32)
    pseudo_label = jnp.where(max_probs == 0, IGNORE, pseudo_label)
    unlabeled_weight = jnp.mean((max_probs >= 0.968).astype(jnp.float32))
    pixel_weights = unlabeled_weight * jnp.ones_like(max_probs)
    l_u = cfg.consistency_weight * cross_entropy2d(
        student_logits, pseudo_label, pixel_weights=pixel_weights
    )
    return l_u, pseudo_label


def generate_mix_mask(cfg: StepConfig, rng, argmax_u_w, depths):
    """Mask dispatch (reference train.py:572-642). `depths` (N,H,W) or None."""
    n, h, w = argmax_u_w.shape
    if cfg.mix_mask == "class":
        return generate_class_mask(rng, argmax_u_w, cfg.num_classes, IGNORE)
    if cfg.mix_mask == "depthcomp":
        return generate_depthcomp_mask(
            depths, rng, cfg.depthcomp_margin, cfg.depthcomp_foreground_threshold
        )
    if cfg.mix_mask == "depth":
        thr = jax.random.uniform(rng, (n, 1, 1), minval=0.1, maxval=0.4)
        return generate_depth_mask(depths, thr)
    if cfg.mix_mask == "depthhist":
        thr = depthhist_thresholds(depths, rng)
        return generate_depth_mask(depths, thr.reshape(n, 1, 1))
    if cfg.mix_mask is None:
        return jnp.ones((n, h, w), jnp.float32)
    raise NotImplementedError(f"Unknown mix_mask {cfg.mix_mask}")


def strong_transform(cfg: StepConfig, rng, mask, data=None, target=None):
    """mix -> color jitter -> gaussian blur (reference train.py:654-659)."""
    k_draw_j, k_jit, k_draw_b, k_blur = jax.random.split(rng, 4)
    data, target = mix(mask, data, target)
    if data is not None:
        if cfg.unlabeled_color_jitter:
            draw = jax.random.uniform(k_draw_j, ())
            data = color_jitter(k_jit, data, s=0.25, apply_prob_draw=draw)
        if cfg.unlabeled_blur:
            draw = jax.random.uniform(k_draw_b, ())
            data = gaussian_blur(k_blur, data, apply_prob_draw=draw)
    return data, target


def make_train_step(model, cfg: StepConfig, tx):
    """Build the jittable train step.

    signature: (state, batch, unlabeled_batch | None, rng) -> (state, metrics)
    """

    def train_step(state: TrainState, batch, unlabeled_batch, rng):
        k_drop, k_mono, k_teacher, k_mix, k_strong, k_mono_u, k_drop_u, k_drop_m = (
            jax.random.split(jax.random.fold_in(rng, state.step), 8)
        )
        enc_bn_kw = {"train_encoder_bn": False} if cfg.freeze_backbone_bn else {}

        # ---- teacher forward (no grad; params independent of student) ----
        teacher_softmax = None
        argmax_u_w = None
        if cfg.unlabeled and cfg.use_ema:
            # train-mode BN (batch statistics) like the reference teacher
            # (train.py:444-445); the mutated stats are discarded.
            t_out, _ = _apply(model, state.ema_params, state.batch_stats,
                              unlabeled_batch, train=True, rng=k_teacher,
                              mutable=True, use_pose=False, **enc_bn_kw)
            teacher_softmax = jax.lax.stop_gradient(
                jax.nn.softmax(t_out["semantics"].astype(jnp.float32), axis=-1))
            if cfg.mix_use_gt:
                onehot = unlabeled_batch["onehot_lbl"]
                is_lab = unlabeled_batch["is_labeled"].reshape(-1, 1, 1, 1).astype(jnp.bool_)
                teacher_softmax = jnp.where(is_lab, onehot, teacher_softmax)
            argmax_u_w = jnp.argmax(teacher_softmax, axis=-1).astype(jnp.int32)

        # one 2N forward for the labeled + unlabeled student passes (see
        # StepConfig.fuse_unlabeled_forward); requires the online-depth branch
        # (the mixed forward depends on its disparities, so only the first two
        # student forwards are independent) and equal half sizes for the
        # batch-mean exactness argument
        fused = (cfg.fuse_unlabeled_forward and cfg.unlabeled and cfg.use_ema
                 and cfg.depthmix_online_depth and cfg.monodepth_lambda > 0)
        if fused:
            n_lab = batch[key_of("color_aug", 0, 0)].shape[0]
            assert n_lab == unlabeled_batch[key_of("color_aug", 0, 0)].shape[0], (
                "fuse_unlabeled_forward requires equal labeled/unlabeled batch "
                "sizes (the photometric batch-mean split is only exact then)")

        # offline-DepthMix variant: fuse labeled + mixed (see StepConfig). The
        # mix mask and strong augmentation are parameter-free here (offline
        # pseudo-depth + teacher argmax), so the mixed batch is built once
        # outside the grad closure.
        fused_mixed = (cfg.fuse_unlabeled_forward and cfg.unlabeled
                       and cfg.use_ema and not cfg.depthmix_online_depth
                       and cfg.monodepth_lambda == 0)
        pre_mix = None
        if fused_mixed:
            depths_pre = (unlabeled_batch["pseudo_depth"][..., 0]
                          if "pseudo_depth" in unlabeled_batch else None)
            mask_pre = generate_mix_mask(cfg, k_mix, argmax_u_w, depths_pre)
            imgs_pre, _ = strong_transform(
                cfg, k_strong, mask_pre,
                data=unlabeled_batch[key_of("color_aug", 0, 0)])
            softmax_pre, _ = mix(mask_pre, data=teacher_softmax)
            pre_mix = (mask_pre, imgs_pre, softmax_pre)

        def loss_fn(params):
            metrics = {}
            bs = state.batch_stats

            mono_loss = jnp.asarray(0.0)
            mono_loss_u_fused = jnp.asarray(0.0)
            feat_dist_loss = jnp.asarray(0.0)
            out_1 = None
            if fused:
                comb = {}
                for k, v in batch.items():
                    u = unlabeled_batch.get(k)
                    if u is not None and getattr(u, "shape", ())[1:] == v.shape[1:]:
                        comb[k] = jnp.concatenate([v, u], axis=0)
                outputs_c, bs = _apply(model, params, bs, comb, train=True,
                                       rng=k_drop, mutable=True, **enc_bn_kw)
                # one photometric pass (warp + SSIM/L1 + smoothness) over both
                # halves: per-scale losses are batch means, so the labeled +
                # unlabeled contributions sum to exactly 2 * combined mean
                m_c, _ = _monodepth_loss(cfg, k_mono, comb, outputs_c)
                mono_loss = cfg.monodepth_lambda * m_c
                mono_loss_u_fused = cfg.monodepth_lambda * m_c
                outputs = jax.tree_util.tree_map(lambda x: x[:n_lab], outputs_c)
                out_1 = jax.tree_util.tree_map(lambda x: x[n_lab:], outputs_c)
            elif fused_mixed:
                mixed_batch = dict(unlabeled_batch)
                mixed_batch[key_of("color_aug", 0, 0)] = pre_mix[1]
                comb = {}
                for k, v in batch.items():
                    u = mixed_batch.get(k)
                    if u is not None and getattr(u, "shape", ())[1:] == v.shape[1:]:
                        comb[k] = jnp.concatenate([v, u], axis=0)
                outputs_c, bs = _apply(model, params, bs, comb, train=True,
                                       rng=k_drop, mutable=True, use_pose=False,
                                       **enc_bn_kw)
                n_mix = batch[key_of("color_aug", 0, 0)].shape[0]
                outputs = jax.tree_util.tree_map(lambda x: x[:n_mix], outputs_c)
                out_s_fused = jax.tree_util.tree_map(lambda x: x[n_mix:], outputs_c)
            else:
                outputs, bs = _apply(model, params, bs, batch, train=True, rng=k_drop,
                                     mutable=True, **enc_bn_kw)
                if cfg.monodepth_lambda > 0:
                    m, _ = _monodepth_loss(cfg, k_mono, batch, outputs)
                    mono_loss = cfg.monodepth_lambda * m
            if cfg.monodepth_lambda > 0 and cfg.feat_dist_lambda > 0:
                d = outputs["encoder_features"].astype(jnp.float32) - outputs[
                    "imnet_features"].astype(jnp.float32)
                feat_dist_loss = cfg.feat_dist_lambda * jnp.sqrt(jnp.sum(d * d))
            mono_total = mono_loss + feat_dist_loss

            pseudo_depth_loss = jnp.asarray(0.0)
            if cfg.pseudo_depth_lambda > 0:
                disp0 = outputs["disp_0"]
                pseudo_depth_loss = cfg.pseudo_depth_lambda * berhu(
                    disp0, batch["pseudo_depth"], _depth_loss_mask(disp0),
                    apply_log=cfg.pseudo_depth_loss_log,
                )

            seg_loss = jnp.asarray(0.0)
            seg_total = jnp.asarray(0.0)
            if cfg.segmentation_lambda > 0:
                seg_loss = _segmentation_loss(cfg, outputs, batch["lbl"])
                seg_total = seg_loss

            # ---- semi-supervised branch (reference train.py:653-746) ----
            if cfg.unlabeled and cfg.use_ema:
                unlabeled_imgs = unlabeled_batch[key_of("color_aug", 0, 0)]
                l_1 = jnp.asarray(0.0)
                mono_loss_u = jnp.asarray(0.0)
                if cfg.depthmix_online_depth:
                    if fused:
                        mono_loss_u = mono_loss_u_fused
                    else:
                        out_1, bs = _apply(model, params, bs, unlabeled_batch,
                                           train=True, rng=k_drop_u, mutable=True,
                                           **enc_bn_kw)
                        if cfg.monodepth_lambda > 0:
                            m_u, _ = _monodepth_loss(cfg, k_mono_u, unlabeled_batch, out_1)
                            mono_loss_u = cfg.monodepth_lambda * m_u
                    if cfg.monodepth_lambda > 0:
                        d = jax.lax.stop_gradient(out_1["disp_0"])
                        dmin = jnp.min(d, axis=(1, 2, 3), keepdims=True)
                        dmax = jnp.max(d, axis=(1, 2, 3), keepdims=True)
                        depths = ((d - dmin) / (dmax - dmin + 1e-12))[..., 0]
                    else:
                        depths = unlabeled_batch["pseudo_depth"][..., 0]
                    if cfg.backward_first_pseudo_label:
                        l_1, _ = pseudo_label_loss(cfg, teacher_softmax, out_1["semantics"])
                elif "pseudo_depth" in unlabeled_batch:
                    depths = unlabeled_batch["pseudo_depth"][..., 0]
                else:
                    depths = None

                if fused_mixed:
                    mix_mask, mixed_imgs, mixed_softmax = pre_mix
                    out_s = out_s_fused
                else:
                    mix_mask = generate_mix_mask(cfg, k_mix, argmax_u_w, depths)
                    mixed_imgs, _ = strong_transform(cfg, k_strong, mix_mask,
                                                     data=unlabeled_imgs)
                    mixed_softmax, _ = mix(mix_mask, data=teacher_softmax)

                    mixed_batch = dict(unlabeled_batch)
                    mixed_batch[key_of("color_aug", 0, 0)] = mixed_imgs
                    out_s, bs = _apply(model, params, bs, mixed_batch, train=True,
                                       rng=k_drop_m, mutable=True, use_pose=False,
                                       **enc_bn_kw)
                l_2, pseudo_label = pseudo_label_loss(cfg, mixed_softmax, out_s["semantics"])

                seg_total = seg_total + l_2 + l_1
                mono_total = mono_total + mono_loss_u
                metrics["unlabeled_loss"] = l_2 + l_1
                if cfg.debug_images:
                    metrics["debug/mixed_imgs"] = jax.lax.stop_gradient(mixed_imgs)
                    metrics["debug/mix_mask"] = mix_mask
                    metrics["debug/pseudo_label"] = pseudo_label
                    if depths is not None:
                        metrics["debug/depths"] = depths

            total = seg_total + mono_total + pseudo_depth_loss
            metrics.update({
                "segmentation_loss": seg_loss,
                "mono_loss": mono_loss,
                "pseudo_depth_loss": pseudo_depth_loss,
                "feat_dist_loss": feat_dist_loss,
                "segmentation_total_loss": seg_total,
                "mono_total_loss": mono_total,
                "total_loss": total,
            })
            return total, (metrics, bs)

        (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, updates)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

        new_ema = state.ema_params
        if cfg.use_ema:
            new_ema = update_ema(state.ema_params, new_params, state.step,
                                 cfg.ema_alpha, cfg.ema_names)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg: StepConfig):
    """Build the jittable eval step (reference Trainer.validate body,
    train.py:817-884): returns per-batch metric sums + the on-device
    confusion-matrix contribution + visualizables."""

    def eval_step(state: TrainState, batch, rng):
        outputs, _ = _apply(model, state.params, state.batch_stats, batch, train=False)
        metrics = {}
        aux = {}

        conf = jnp.zeros((cfg.num_classes, cfg.num_classes), jnp.float32)
        if cfg.segmentation_lambda > 0:
            labels = batch["lbl"]
            semantics = outputs["semantics"]
            metrics["segmentation_loss"] = cross_entropy2d(semantics, labels)
            if semantics.shape[1:3] != labels.shape[1:3]:
                semantics = resize_bilinear(semantics, labels.shape[1:3], align_corners=True)
            pred = jnp.argmax(semantics, axis=-1).astype(jnp.int32)
            conf = confusion_matrix(labels, pred, cfg.num_classes)
            aux["pred"] = pred
        else:
            metrics["segmentation_loss"] = jnp.asarray(0.0)

        if not cfg.disable_monodepth:
            if not cfg.disable_pose:
                out2 = photometric.generate_images_pred(
                    batch, outputs, scales=cfg.scales, frame_ids=cfg.frame_ids,
                    min_depth=cfg.min_depth, max_depth=cfg.max_depth)
                losses = photometric.compute_losses(
                    rng, batch, out2, scales=cfg.scales, frame_ids=cfg.frame_ids,
                    disparity_smoothness=cfg.disparity_smoothness, no_ssim=cfg.no_ssim,
                    avg_reprojection=cfg.avg_reprojection,
                    disable_automasking=cfg.disable_automasking,
                    # eval-only fast path: the fused Pallas reprojection
                    # kernel; training uses the XLA chain (faster in-step),
                    # so the val monodepth_loss scalar differs from the
                    # trained loss by the kernel's bf16 rounding (~1e-3)
                    fused_pred=True)
                metrics["monodepth_loss"] = losses["loss"]
            else:
                test_out = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    batch, train=False, method=model.predict_test_disp)
                outputs.update(test_out)
                outputs.update(photometric.generate_depth_test_pred(
                    outputs, scales=cfg.scales, test_min_depth=cfg.test_min_depth,
                    test_max_depth=cfg.test_max_depth))
                metrics["monodepth_loss"] = jnp.asarray(0.0)
            aux["disp_0"] = outputs["disp_0"]
        else:
            metrics["monodepth_loss"] = jnp.asarray(0.0)

        if cfg.has_depth_teacher and "pseudo_depth" in batch and "disp_0" in outputs:
            disp0 = outputs["disp_0"]
            metrics["pseudo_depth_loss"] = berhu(
                disp0, batch["pseudo_depth"], _depth_loss_mask(disp0),
                apply_log=cfg.pseudo_depth_loss_log)
        else:
            metrics["pseudo_depth_loss"] = jnp.asarray(0.0)

        # ---- depth eval metrics (abs_rel/sq_rel/rms/log_rms/a1-a3) ----
        # The reference declares these names but never computes them
        # (loss/monodepth_loss.py:35-36); here they are wired into every
        # validation pass so depth quality is measurable. Ground truth
        # priority: a real depth map under "depth_gt" (masked where > 0),
        # else the offline depth-teacher disparity ("pseudo_depth", compared
        # in depth units through the same disp_to_depth mapping, hood rows
        # masked like the pseudo-depth loss).
        if "disp_0" in outputs:
            from .trainer_depth_eval import eval_depth_metrics

            metrics.update(eval_depth_metrics(cfg, batch, outputs))

        return metrics, conf, aux

    return eval_step


def step_config_from_cfg(cfg: Dict[str, Any]) -> StepConfig:
    """Assemble a StepConfig from the experiment config dict (the merged
    training/model/monodepth_options sections, reference train.py:156-160)."""
    t = cfg.get("training", {})
    m = cfg.get("model", {})
    mono = dict(cfg.get("monodepth_options", {}))
    # depth-range/photometric params live under training.monodepth_loss
    # (reference configs/cityscapes_joint.yml:65-73, merged at train.py:156-160)
    mono.update(t.get("monodepth_loss") or {})
    u = t.get("unlabeled_segmentation") or {}
    from .state import ema_model_names

    use_ema = bool(u)
    return StepConfig(
        monodepth_lambda=t.get("monodepth_lambda", 0.0),
        feat_dist_lambda=t.get("feat_dist_lambda", 0.0),
        pseudo_depth_lambda=t.get("pseudo_depth_lambda", 0.0),
        segmentation_lambda=t.get("segmentation_lambda", 1.0),
        pseudo_depth_loss_log=t.get("pseudo_depth_loss_log", False),
        frame_ids=tuple(mono.get("frame_ids", (0, -1, 1))),
        scales=tuple(range(mono.get("num_scales", 4))),
        min_depth=mono.get("min_depth", 0.1),
        max_depth=mono.get("max_depth", 100.0),
        test_min_depth=mono.get("test_min_depth", mono.get("min_depth", 0.1)),
        test_max_depth=mono.get("test_max_depth", mono.get("max_depth", 100.0)),
        disparity_smoothness=mono.get("disparity_smoothness", 1e-3),
        no_ssim=mono.get("no_ssim", False),
        photometric_dtype=jnp.bfloat16 if t.get("amp", False) else None,
        fused_pred_loss=t.get("fused_reprojection", False),
        remat_photometric=t.get("remat_photometric", False),
        pred_layout=t.get("pred_layout", "pack"),
        avg_reprojection=mono.get("avg_reprojection", False),
        disable_automasking=mono.get("disable_automasking", False),
        disable_monodepth=m.get("disable_monodepth", False),
        disable_pose=m.get("disable_pose", False),
        freeze_backbone_bn=m.get("freeze_backbone_bn", False),
        has_depth_teacher=cfg.get("data", {}).get("depth_teacher") is not None,
        num_classes=cfg.get("data", {}).get("n_classes", 19),
        unlabeled=bool(u),
        consistency_weight=u.get("consistency_weight", 1.0),
        mix_mask=u.get("mix_mask"),
        unlabeled_color_jitter=bool(u.get("color_jitter", False)),
        unlabeled_blur=bool(u.get("blur", False)),
        mix_use_gt=u.get("mix_use_gt", False),
        depthcomp_margin=u.get("depthcomp_margin", 0.0),
        depthcomp_foreground_threshold=(
            tuple(u["depthcomp_foreground_threshold"])
            if isinstance(u.get("depthcomp_foreground_threshold"), (list, tuple))
            else u.get("depthcomp_foreground_threshold", 0.0)
        ),
        depthmix_online_depth=u.get("depthmix_online_depth", False),
        backward_first_pseudo_label=u.get("backward_first_pseudo_label", False),
        fuse_unlabeled_forward=t.get("fuse_unlabeled_forward", False),
        use_ema=use_ema,
        ema_names=ema_model_names(t, m),
        # the reference's experiments set 'debug_image' while the trainer reads
        # 'debug_images' (quirk, SURVEY §7) — accept both
        debug_images=bool(u.get("debug_images", u.get("debug_image", False))),
    )
