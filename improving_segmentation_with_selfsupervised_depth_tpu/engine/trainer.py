"""Trainer: host-side orchestration around the jitted steps.

Counterpart of the reference `Trainer` (train.py:154-923), re-organized for a
functional backend: all per-step compute lives in engine/train_steps.py; this
class owns data loaders, the device mesh, checkpointing, LR-plateau control,
early stopping and metrics logging. The training loop itself mirrors
train.py:748-815 (print_interval, step-threshold val_interval dict, best-mIoU
checkpointing, early stopping).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MachineConfig
from ..data.loader import DataLoader, infinite_iterator
from ..data.registry import build_loader
from ..models import build_model
from ..ops.metrics import AverageMeter, AverageMeterDict, RunningScore
from ..parallel import data_mesh, jit_eval_step, jit_train_step, replicate, shard_batch
from ..utils import set_seeds
from ..utils.compile_cache import enable_persistent_cache
from .checkpoints import (
    apply_pretraining,
    load_resume,
    save_monodepth_models,
    save_resume,
    wait_for_saves,
)
from .early_stopping import EarlyStopping
from .optim import build_optimizer
from .state import create_train_state
from .train_steps import make_eval_step, make_train_step, step_config_from_cfg
from .writer import MetricsWriter

logger = logging.getLogger("segsde")


def _colorize(img: np.ndarray, cmap: str = "plasma", max_percentile: int = 100) -> np.ndarray:
    """Colormap a depth/disparity map to RGB (reference train.py:137-151)."""
    img = np.asarray(img, np.float64).squeeze()
    vmin = float(np.min(img))
    vmax = float(np.max(img) if max_percentile == 100 else np.percentile(img, max_percentile))
    try:
        import matplotlib

        cm = matplotlib.colormaps[cmap]
        return cm(np.clip(img, vmin, vmax) / max(vmax, 1e-12))[..., :3]
    except Exception:
        norm = np.clip(img, vmin, vmax) / max(vmax, 1e-12)
        return np.stack([norm, norm, norm], axis=-1)


def current_val_interval(cfg: Dict[str, Any], step: int) -> int:
    """Step-threshold keyed val_interval dict (reference train.py:117-121)."""
    v = cfg["training"]["val_interval"]
    if isinstance(v, int):
        return v
    intervals = sorted(((int(k), int(val)) for k, val in v.items()), reverse=True)
    for k, val in intervals:
        if step > k:
            return val
    return intervals[-1][1]


def _pad_val_batch(batch: Dict[str, Any], target_n: int) -> Dict[str, Any]:
    """Pad a ragged validation batch to `target_n` by repeating the last item;
    padded labels are set to ignore (250) so metrics stay exact."""
    out = {}
    n = len(next(iter(batch.values())))
    pad = target_n - n
    if pad <= 0:
        return batch
    for k, v in batch.items():
        if k == "filename":
            out[k] = list(v) + [v[-1]] * pad
            continue
        v = np.asarray(v)
        reps = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        if k == "lbl":
            reps[n:] = 250
        out[k] = reps
    return out


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Strip host-only entries and convert to arrays."""
    out = {}
    for k, v in batch.items():
        if k == "filename":
            continue
        out[k] = np.asarray(v)
    return out


class Trainer:
    def __init__(self, cfg: Dict[str, Any], writer: Optional[MetricsWriter] = None,
                 img_writer: Optional[MetricsWriter] = None, logger_=None,
                 run_id: str = "run"):
        self.cfg = cfg
        self.run_id = run_id
        self.logger = logger_ or logger

        # merge shared monodepth options (reference train.py:156-160)
        mono = cfg.get("monodepth_options", {})
        for section in ("data", "model"):
            cfg.setdefault(section, {})
            for k, v in mono.items():
                cfg[section].setdefault(k, v)
        cfg["data"].setdefault("frame_ids", mono.get("frame_ids", [0, -1, 1]))
        cfg["data"].setdefault("num_scales", mono.get("num_scales", 4))
        if "crop_h" in mono:
            cfg["data"].setdefault("crop_h", mono["crop_h"])
            cfg["data"].setdefault("crop_w", mono["crop_w"])
        if "height" in mono:
            cfg["data"].setdefault("img_size", (mono["height"], mono["width"]))

        set_seeds(cfg.get("seed", cfg["training"].get("seed", 42)))

        log_path = cfg["training"].get("log_path", os.path.join(
            getattr(MachineConfig, "LOG_DIR", None) or "results/logs", run_id))
        os.makedirs(log_path, exist_ok=True)
        self.log_path = log_path
        self.writer = writer or MetricsWriter(log_path)
        self.img_writer = img_writer or self.writer

        # ---- semi-supervised config (reference setup_segmentation_unlabeled) ----
        u = cfg["training"].get("unlabeled_segmentation") or {}
        self.enable_unlabeled = bool(u)
        self.only_unlabeled = u.get("only_unlabeled", True)
        self.only_labeled = u.get("only_labeled", False)
        assert not (self.only_unlabeled and self.only_labeled)
        self.mix_use_gt = u.get("mix_use_gt", False)
        mix_mask = u.get("mix_mask")
        self.unlabeled_require_depth = mix_mask in ("depth", "depthcomp", "depthhist")

        # ---- offline pseudo-depth (reference train.py:194-207) ----
        need_offline_depth = (
            (self.unlabeled_require_depth and not u.get("depthmix_online_depth", False))
            or cfg["data"].get("depth_teacher") is not None
        )
        if need_offline_depth and cfg["data"].get("dataset") != "synthetic":
            from .depth_estimator import DepthEstimator

            DepthEstimator(cfg).prepare_depth_estimates()

        # ---- data ----
        data_cfg = dict(cfg["data"])
        if data_cfg.get("dataset_seed") in (None, "same"):
            data_cfg["dataset_seed"] = cfg.get("seed", 42)
        if cfg["model"].get("provide_uncropped_for_pose", False):
            data_cfg["load_color_full"] = True
        if not need_offline_depth:
            data_cfg.pop("generated_depth_dir", None)
        # sequence frames only when the photometric loss is on; labels only
        # when the segmentation loss is on (reference train.py:210-214)
        load_sequence = cfg["training"].get("monodepth_lambda", 0.0) != 0
        load_labels = cfg["training"].get("segmentation_lambda", 1.0) != 0
        self.train_dataset = build_loader(data_cfg, "train",
                                          load_labels=load_labels,
                                          load_sequence=load_sequence)
        val_split = data_cfg.get("val_split", "val")
        self.val_dataset = build_loader({**data_cfg, "restrict_to_subset": None}, val_split,
                                        load_labels=load_labels,
                                        load_sequence=load_sequence)
        self.n_classes = self.train_dataset.n_classes

        bs = cfg["training"]["batch_size"]
        nw = cfg["data"].get("n_workers", 4)
        self.train_loader = DataLoader(self.train_dataset, bs, shuffle=True,
                                       drop_last=True, num_workers=nw)
        self.val_loader = DataLoader(self.val_dataset,
                                     cfg["training"].get("val_batch_size", bs),
                                     shuffle=False, drop_last=False, num_workers=nw)
        self.unlabeled_iter = None
        if self.enable_unlabeled:
            # labeled/unlabeled composition (reference train.py:219-236)
            u_data_cfg = dict(data_cfg)
            mix_video = u.get("mix_video", False)
            if mix_video:
                assert not self.mix_use_gt and not self.only_labeled and not self.only_unlabeled
                u_data_cfg.update({"only_sequences_with_segmentation": False,
                                   "restrict_to_subset": None})
            ds = build_loader(
                u_data_cfg, "train",
                load_labels=load_labels and not mix_video,
                load_sequence=load_sequence,
                load_labeled=not self.only_unlabeled,
                load_unlabeled=not self.only_labeled,
                load_onehot=self.mix_use_gt)
            self.unlabeled_dataset = ds
            self.unlabeled_loader = DataLoader(ds, bs, shuffle=True, drop_last=True,
                                               num_workers=nw)
            self.unlabeled_iter = infinite_iterator(self.unlabeled_loader)

        # ---- model + state ----
        amp = cfg["training"].get("amp", False)
        dtype = jnp.bfloat16 if amp else jnp.float32
        self.model = build_model(cfg["model"], self.n_classes, dtype=dtype)

        example = device_batch(next(iter(self.val_loader)))
        rng = jax.random.PRNGKey(cfg.get("seed", 42))
        variables = self.model.init({"params": rng, "dropout": rng},
                                    {k: jnp.asarray(v) for k, v in example.items()})
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        params, batch_stats = apply_pretraining(
            cfg["model"], params, batch_stats,
            getattr(MachineConfig, "DOWNLOAD_MODEL_DIR", None))

        self.tx = build_optimizer(cfg["training"], cfg["model"], params)
        cfg.setdefault("data", {})["n_classes"] = self.n_classes
        self.step_cfg = step_config_from_cfg(cfg)
        self.state = create_train_state(self.model, rng, example, self.tx,
                                        with_ema=self.step_cfg.use_ema)
        self.state = self.state.replace(params=params, batch_stats=batch_stats)
        if self.step_cfg.use_ema:
            from .state import init_ema_params

            self.state = self.state.replace(ema_params=init_ema_params(params))

        # ---- compiled steps over the device mesh ----
        from ..ops.resample import configure_warp

        devices = jax.devices()
        self.mesh = None
        if len(devices) > 1 and bs % len(devices) == 0:
            self.mesh = data_mesh(devices)
        # register the warp implementation + mesh BEFORE any step is traced:
        # on a >1-device mesh the Pallas warp must run under shard_map
        # (pallas_call has no GSPMD partitioning rule); training.warp_impl
        # "xla" forces the full-f32 fallback for parity debugging
        configure_warp(cfg["training"].get("warp_impl", "auto"), mesh=self.mesh)
        if self.mesh is not None:
            self.train_step = jit_train_step(
                make_train_step(self.model, self.step_cfg, self.tx), self.mesh,
                with_unlabeled=self.enable_unlabeled)
            self.eval_step = jit_eval_step(make_eval_step(self.model, self.step_cfg),
                                           self.mesh)
            self.state = replicate(self.state, self.mesh)
        else:
            self.train_step = jax.jit(make_train_step(self.model, self.step_cfg, self.tx),
                                      donate_argnums=(0,))
            self.eval_step = jax.jit(make_eval_step(self.model, self.step_cfg))

        # ---- LR plateau / early stopping (reference train.py:296-315) ----
        sched = cfg["training"].get("lr_schedule") or {}
        self.plateau = None
        if sched.get("name") == "reduce_lr_on_plateau":
            self.plateau = {
                "factor": sched.get("factor", 0.1),
                "patience": sched.get("patience", 10),
                "best": -np.inf, "count": 0,
            }
        es_cfg = cfg["training"].get("early_stopping") or None
        self.early_stopping = EarlyStopping(logger=self.logger, **es_cfg) if es_cfg else None

        self.mIoU = 0.0
        self.fwAcc = 0.0
        self.best_iou = -100.0
        self.start_iter = 0

        if cfg["training"].get("resume"):
            self.load_resume()
        elif cfg["training"].get("auto_resume", False):
            # preemption recovery: when re-launched with the same log_path,
            # pick up the rolling last_model checkpoint automatically
            last = os.path.join(self.log_path, "last_model.msgpack")
            if os.path.isfile(last):
                self.state, self.start_iter, self.best_iou = load_resume(
                    last, self.state)
                self.logger.info("Auto-resumed %s (iter %d)", last, self.start_iter)

    # ------------------------------------------------------------------
    def _put(self, batch):
        b = {k: jnp.asarray(v) for k, v in device_batch(batch).items()}
        if self.mesh is not None:
            b = shard_batch(b, self.mesh)
        return b

    def train(self) -> int:
        cfg = self.cfg
        train_iters = cfg["training"]["train_iters"]
        print_interval = cfg["training"].get("print_interval", 100)
        rng = jax.random.PRNGKey(cfg.get("seed", 42))

        loss_meter = AverageMeterDict()
        time_meter = AverageMeter()
        pending_metrics = []
        step = self.start_iter
        flag = True
        start_ts = time.time()

        # optional JAX profiler capture (training.profile_dir +
        # profile_start/profile_steps) — the TPU-native replacement for the
        # reference's wall-clock-only telemetry (SURVEY §5)
        profile_dir = cfg["training"].get("profile_dir")
        profile_start = cfg["training"].get("profile_start", 10)
        profile_steps = cfg["training"].get("profile_steps", 5)
        profiling = False

        self.tensorboard_training_images()

        while step <= train_iters and flag:
            for batch in self.train_loader:
                step += 1
                if profile_dir and step == profile_start:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                if profiling and step == profile_start + profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                ub = None
                if self.enable_unlabeled:
                    ub = self._put(next(self.unlabeled_iter))
                self.state, metrics = self.train_step(self.state, self._put(batch), ub, rng)

                debug = {k: metrics.pop(k) for k in list(metrics) if k.startswith("debug/")}
                time_meter.update(time.time() - start_ts)
                # keep metrics on device — float() would force a sync per step
                # and stall the dispatch pipeline; convert at print_interval
                pending_metrics.append(metrics)

                if debug and (step + 1) % print_interval == 0:
                    self._dump_mix_debug(debug, step)

                if (step + 1) % print_interval == 0:
                    for m in pending_metrics:
                        loss_meter.update({k: float(v) for k, v in m.items()})
                    pending_metrics = []
                    msg = (f"Iter [{step + 1}/{train_iters}]  "
                           f"Loss: {loss_meter.avgs['total_loss']:.4f}  "
                           f"Time/Image: {time_meter.avg / cfg['training']['batch_size']:.4f}")
                    self.logger.info(msg)
                    for k, v in loss_meter.avgs.items():
                        self.writer.add_scalar("training/" + k, v, step + 1)
                    self.writer.add_scalar(
                        "training/time_per_image",
                        time_meter.avg / cfg["training"]["batch_size"], step + 1)
                    # effective LR = base * schedule factor * plateau scale
                    # (reference logs get_lr(optimizer), train.py:786)
                    base_lr = (cfg["training"].get("optimizer") or {}).get("lr", 0.01)
                    self.writer.add_scalar(
                        "training/learning_rate",
                        base_lr * float(self._lr_factor(step)) * float(self.state.lr_scale),
                        step + 1)
                    try:
                        import psutil

                        self.writer.add_scalar(
                            "training/memory",
                            psutil.virtual_memory().used / 1e9, step + 1)
                    except Exception:
                        pass
                    time_meter.reset()
                    loss_meter.reset()

                if (step + 1) % current_val_interval(cfg, step + 1) == 0 or \
                        (step + 1) == train_iters:
                    self.validate(step)
                    if self.mIoU >= self.best_iou:
                        self.best_iou = self.mIoU
                        if cfg["training"].get("save_model", True):
                            self.save_resume(step)
                    if cfg["training"].get("save_last", True) and \
                            cfg["training"].get("save_model", True):
                        # rolling latest-state checkpoint for preemption
                        # recovery (training.auto_resume picks it up)
                        save_resume(self.log_path, self.state, self.best_iou,
                                    async_write=cfg["training"].get(
                                        "async_checkpoints", True),
                                    basename="last_model")
                    if self.plateau is not None:
                        self._plateau_step(self.mIoU)
                    if self.early_stopping is not None and \
                            not self.early_stopping.step(self.mIoU):
                        flag = False
                        break

                if (step + 1) == train_iters:
                    flag = False
                    break
                start_ts = time.time()
        wait_for_saves()  # land any in-flight async checkpoint before return
        return step

    def _plateau_step(self, metric: float):
        p = self.plateau
        if metric > p["best"]:
            p["best"] = metric
            p["count"] = 0
        else:
            p["count"] += 1
            if p["count"] > p["patience"]:
                p["count"] = 0
                new_scale = float(self.state.lr_scale) * p["factor"]
                self.state = self.state.replace(lr_scale=jnp.asarray(new_scale, jnp.float32))
                self.logger.info("Plateau: lr_scale -> %.2e", new_scale)

    # ------------------------------------------------------------------
    def validate(self, step: int):
        loss_meter = AverageMeterDict()
        running = RunningScore(self.n_classes)
        rng = jax.random.PRNGKey(0)
        imgs_to_save = []
        # every reference config sets 20 and the reference trainer requires the
        # key (train.py:887) — default to the reference's effective behavior
        n_imgs = self.cfg["training"].get("n_tensorboard_imgs", 20)
        for batch in self.val_loader:
            n_real = len(next(iter(batch.values())))
            if self.mesh is not None and n_real % self.mesh.devices.size != 0:
                # pad to the next multiple of the mesh size (NOT to
                # val_batch_size, which itself may be smaller than the mesh —
                # e.g. vbs=4 on 8 devices); padded rows carry lbl=ignore so
                # the confusion matrix is unaffected
                m = self.mesh.devices.size
                batch = _pad_val_batch(batch, -(-n_real // m) * m)
            metrics, conf, aux = self.eval_step(self.state, self._put(batch), rng)
            loss_meter.update({k: float(v) for k, v in metrics.items()})
            running.update_matrix(np.asarray(conf))
            if len(imgs_to_save) < n_imgs:
                imgs = np.asarray(batch["color_aug_0_0"])
                gts = np.asarray(batch.get("lbl")) if "lbl" in batch else None
                preds = np.asarray(aux["pred"]) if "pred" in aux else None
                disps = np.asarray(aux["disp_0"], np.float32) if "disp_0" in aux else None
                for j in range(imgs.shape[0]):
                    if len(imgs_to_save) >= n_imgs:
                        break
                    imgs_to_save.append((
                        imgs[j],
                        gts[j] if gts is not None else None,
                        preds[j] if preds is not None else None,
                        disps[j] if disps is not None else None,
                    ))
        self._log_val_images(imgs_to_save, step)

        for k, v in loss_meter.avgs.items():
            self.writer.add_scalar("validation/" + k, v, step + 1)
        if self.cfg["training"].get("segmentation_lambda", 1.0) > 0:
            score, class_iou = running.get_scores()
            for k, v in score.items():
                self.writer.add_scalar(f"val_metrics/{k.strip()}", v, step + 1)
            for k, v in class_iou.items():
                self.writer.add_scalar(f"val_metrics/cls_{k}", v, step + 1)
            self.mIoU = score["Mean IoU : \t"]
            self.fwAcc = score["FreqW Acc : \t"]
            self.logger.info("Validation @%d: mIoU=%.4f", step + 1, self.mIoU)

    def _lr_factor(self, step: int) -> float:
        from .optim import build_lr_factor_fn

        if not hasattr(self, "_lr_factor_fn"):
            self._lr_factor_fn = build_lr_factor_fn(
                self.cfg["training"].get("lr_schedule"))
        return float(self._lr_factor_fn(step))

    def _dump_mix_debug(self, debug, step: int):
        """Dump DepthMix/ClassMix composites (reference train.py:726-744)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt
        except Exception:
            return
        imgs = np.asarray(debug["debug/mixed_imgs"], np.float32)
        masks = np.asarray(debug["debug/mix_mask"], np.float32)
        pseudo = np.asarray(debug["debug/pseudo_label"])
        depths = np.asarray(debug["debug/depths"], np.float32) if "debug/depths" in debug else None
        out_dir = os.path.join(self.log_path, "class_mix_debug")
        os.makedirs(out_dir, exist_ok=True)
        for j in range(min(2, imgs.shape[0])):
            fig, axs = plt.subplots(2, 2, figsize=(8, 8))
            axs[0][0].imshow(np.clip(imgs[j], 0, 1))
            axs[0][1].imshow(masks[j], cmap="gray")
            axs[1][0].imshow(self.val_dataset.decode_segmap_tocolor(pseudo[j]))
            if depths is not None:
                axs[1][1].imshow(depths[j], cmap="plasma")
            for ax in axs.flat:
                ax.axis("off")
            fig.savefig(os.path.join(out_dir, f"{step}_{j}_img.jpg"))
            plt.close(fig)

    def tensorboard_training_images(self):
        """Log the first K training images + GT at step 0 (reference
        train.py:412-431)."""
        n = self.cfg["training"].get("n_tensorboard_trainimgs", 0)
        if n == 0:
            return
        saved = 0
        for batch in self.train_loader:
            imgs = np.asarray(batch["color_aug_0_0"])
            lbls = np.asarray(batch["lbl"]) if "lbl" in batch else None
            for j in range(imgs.shape[0]):
                if saved >= n:
                    return
                saved += 1
                prefix = f"trainset_{self.run_id.replace('/', '_')}/{saved}"
                self.img_writer.add_image(f"{prefix}_0image", imgs[j], 0)
                if lbls is not None:
                    self.img_writer.add_image(
                        f"{prefix}_1ground_truth",
                        self.val_dataset.decode_segmap_tocolor(lbls[j]), 0)
            if saved >= n:
                return

    def _log_val_images(self, imgs_to_save, step: int):
        """Input / GT / prediction / plasma-colorized depth per sample
        (reference train.py:904-923, _colorize 137-151)."""
        for j, (img, gt, pred, disp) in enumerate(imgs_to_save):
            prefix = f"{self.run_id.replace('/', '_')}/{j}"
            self.img_writer.add_image(f"{prefix}_0image", img, step + 1)
            if gt is not None:
                self.img_writer.add_image(
                    f"{prefix}_1ground_truth",
                    self.val_dataset.decode_segmap_tocolor(gt), step + 1)
            if pred is not None:
                self.img_writer.add_image(
                    f"{prefix}_2prediction",
                    self.val_dataset.decode_segmap_tocolor(pred), step + 1)
            if disp is not None:
                self.img_writer.add_image(f"{prefix}_3depth", _colorize(disp), step + 1)

    # ------------------------------------------------------------------
    def train_loader_sequential(self) -> DataLoader:
        """Unshuffled, non-dropping loader over the train subset (used by
        label-selection scoring, reference label_selection.py:367-391)."""
        return DataLoader(self.train_dataset, self.cfg["training"]["batch_size"],
                          shuffle=False, drop_last=False,
                          num_workers=self.cfg["data"].get("n_workers", 2))

    def save_resume(self, step: int) -> str:
        # async by default: the D2H gather + msgpack write overlap the next
        # training steps (atomic rename; wait_for_saves() joins at train end)
        return save_resume(self.log_path, self.state, self.best_iou,
                           async_write=self.cfg["training"].get(
                               "async_checkpoints", True))

    def load_resume(self, strict: bool = True, load_model_only: bool = False):
        wait_for_saves()
        path = self.cfg["training"]["resume"]
        if os.path.isfile(path):
            self.state, self.start_iter, self.best_iou = load_resume(
                path, self.state, load_model_only)
            self.logger.info("Loaded checkpoint %s (iter %d)", path, self.start_iter)
        else:
            self.logger.info("No checkpoint found at %s", path)

    def save_monodepth_models(self):
        params = self.state.params
        if self.cfg["training"].get("save_monodepth_ema", False):
            assert self.state.ema_params is not None
            params = self.state.ema_params
        save_monodepth_models(
            self.log_path, params, self.state.batch_stats,
            include_encoder=not self.cfg["model"].get("freeze_backbone", False))


def train_main(cfg: Dict[str, Any], run_id: str = "run") -> None:
    """reference train.py:939-963."""
    from ..config import expand_cfg_vars

    enable_persistent_cache()
    MachineConfig(cfg.get("machine", "ws"))
    expand_cfg_vars(cfg)
    log_path = cfg["training"].setdefault(
        "log_path", os.path.join(MachineConfig.LOG_DIR, run_id))
    os.makedirs(log_path, exist_ok=True)
    import yaml

    with open(os.path.join(log_path, "cfg.yml"), "w") as f:
        yaml.safe_dump(cfg, f)

    from ..utils import get_logger

    lg = get_logger(log_path)
    trainer = Trainer(cfg, logger_=lg, run_id=run_id)
    trainer.train()
    if cfg["training"].get("save_separate_monodepth_models", False):
        # component export for the SDE transfer chain (reference train.py:377-390)
        trainer.save_monodepth_models()
