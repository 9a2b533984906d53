"""Benchmark: train-step throughput + MFU on TPU for the flagship workloads.

Workloads (reference counterparts in parentheses):
  sde_supervised     joint SDE + seg supervised step (train.py:442-549 with
                     monodepth + CE active) — the headline `value`, same
                     workload as round-1 benches
  exp210_depthcomp   semi-supervised mean-teacher DepthMix step: teacher fwd +
                     depthcomp mix + student fwd + labeled CE
                     (train.py:653-746)
  exp212_pad_online  PAD multi-task online-DepthMix step: 3 student forwards +
                     photometric loss (train.py:679-698), encoder remat

Prints ONE JSON line: value/vs_baseline refer to sde_supervised for
cross-round comparability; per-workload imgs/sec + MFU under "workloads".
`vs_baseline` derivation lives in BASELINE.md (reference eager-torch pipeline
on its single GPU, estimated at 12% MFU of A100 bf16 peak over the same
1.22 TFLOP/img step -> 30.6 imgs/sec proxy).

Each workload is compiled once (AOT) and timed with donated state over
n_steps; a global time budget skips later workloads rather than overrunning
the driver (skipped entries say so).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

A100_PEAK = 312e12          # A100 bf16 dense peak
REF_ASSUMED_MFU = 0.12      # see BASELINE.md for the derivation + sensitivity
V5E_PEAK = 197e12           # v5e bf16 peak per chip

H = W = 512
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2400))
_T0 = time.time()


def _model_cfg(pad: bool = False):
    cfg = {
        "backbone_name": "resnet101",
        "replace_stride_with_dilation": [False, False, True],
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9]},
        "depth_args": {"intermediate_aspp": True, "aspp_rates": [6, 12, 18],
                       "num_ch_dec": [64, 128, 128, 256, 256]},  # dec6 flagship
        "frame_ids": [0, -1, 1],
        "num_scales": 4,
    }
    if pad:
        cfg["segmentation_name"] = "mtl_pad"
        cfg["segmentation_args"] = {"final_layer": 9, "distillation_layer": 7,
                                    "side_output": True}
        cfg["remat"] = True  # 3-forward PAD step OOMs without (exp-212 parity)
    return cfg


_TRAINING_CFG = {
    "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9, "backbone_lr": 1e-3},
    "lr_schedule": {"name": "multi_step", "milestones": [30000], "gamma": 0.1},
    "clip_grad_norm": 10.0,
}


def _build(model_cfg, step_cfg, batch_size, with_ema):
    from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
        make_synthetic_batch,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import (
        build_optimizer,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
        create_train_state,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
        make_train_step,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model

    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(batch_size, H, W, frame_ids=(0, -1, 1),
                                  num_scales=4).items()}
    ubatch = None
    if step_cfg.unlabeled:
        ubatch = {k: jnp.asarray(v) for k, v in
                  make_synthetic_batch(batch_size, H, W, frame_ids=(0, -1, 1),
                                       num_scales=4, with_unlabeled_extras=True,
                                       seed=7).items()}
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(_TRAINING_CFG, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx,
                               with_ema=with_ema)
    step = jax.jit(make_train_step(model, step_cfg, tx), donate_argnums=(0,))
    return step, state, batch, ubatch


def bench_workload(name, model_cfg, step_cfg, batch_size, with_ema=False,
                   n_steps=10):
    if time.time() - _T0 > BUDGET_S:
        return {"skipped": f"time budget {BUDGET_S:.0f}s exceeded"}
    step, state, batch, ubatch = _build(model_cfg, step_cfg, batch_size, with_ema)
    rng = jax.random.PRNGKey(0)

    # AOT: one compile serves cost analysis AND execution
    compiled = step.lower(state, batch, ubatch, rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))

    state, metrics = compiled(state, batch, ubatch, rng)
    jax.block_until_ready(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = compiled(state, batch, ubatch, rng)
    jax.block_until_ready(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / n_steps

    return {
        "imgs_per_sec": round(batch_size / dt, 3),   # labeled imgs, like the
        # reference's training/time_per_image telemetry (train.py:787-788)
        "step_ms": round(dt * 1e3, 1),
        "batch_size": batch_size,
        "tflop_per_step": round(flops / 1e12, 3),
        "mfu_pct": round(100.0 * flops / dt / V5E_PEAK, 2),
    }


def main():
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
        StepConfig,
    )

    results = {}

    results["sde_supervised"] = bench_workload(
        "sde_supervised", _model_cfg(),
        StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                   frame_ids=(0, -1, 1), scales=(0, 1, 2, 3)),
        batch_size=8)

    # exp-210 transfer_dcompgt: seg-only model (SDE-pretrained), offline
    # pseudo-depth drives the depthcomp mask (config/experiments.py:110-143)
    cfg210 = _model_cfg()
    cfg210["disable_monodepth"] = True
    cfg210["disable_pose"] = True
    results["exp210_depthcomp"] = bench_workload(
        "exp210_depthcomp", cfg210,
        StepConfig(monodepth_lambda=0.0, segmentation_lambda=1.0,
                   frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                   unlabeled=True, use_ema=True, mix_mask="depthcomp",
                   unlabeled_color_jitter=True, unlabeled_blur=True,
                   mix_use_gt=True, depthcomp_margin=0.03,
                   depthcomp_foreground_threshold=0.0),
        batch_size=8, with_ema=True)

    # exp-212 pad_transfer_dcompgt: PAD decoder + online-depth DepthMix
    # (config/experiments.py:259-300); bs4 with encoder remat
    results["exp212_pad_online"] = bench_workload(
        "exp212_pad_online", _model_cfg(pad=True),
        StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                   frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                   unlabeled=True, use_ema=True, mix_mask="depthcomp",
                   unlabeled_color_jitter=True, unlabeled_blur=True,
                   mix_use_gt=True, depthcomp_margin=0.03,
                   depthcomp_foreground_threshold=0.0,
                   depthmix_online_depth=True),
        batch_size=4, with_ema=True)

    # per-workload proxy: the reference's eager pipeline executes the same
    # TFLOP/img on an A100 at the assumed MFU (BASELINE.md derivation)
    for r in results.values():
        if "tflop_per_step" in r:
            proxy = A100_PEAK * REF_ASSUMED_MFU / (
                r["tflop_per_step"] * 1e12 / r["batch_size"])
            r["vs_baseline"] = round(r["imgs_per_sec"] / proxy, 3)

    head = results["sde_supervised"]
    ref_imgs_per_sec = A100_PEAK * REF_ASSUMED_MFU / (
        head.get("tflop_per_step", 9.8) * 1e12 / head.get("batch_size", 8))
    print(json.dumps({
        "metric": "train_imgs_per_sec",
        "value": head.get("imgs_per_sec", 0.0),
        "unit": "imgs/sec",
        "vs_baseline": round(head.get("imgs_per_sec", 0.0) / ref_imgs_per_sec, 3),
        "baseline_imgs_per_sec": round(ref_imgs_per_sec, 2),
        "workloads": results,
    }))


if __name__ == "__main__":
    main()
