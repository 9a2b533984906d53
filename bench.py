"""Benchmark: train-step throughput + MFU on TPU for the flagship workloads.

Workloads (reference counterparts in parentheses):
  sde_supervised     joint SDE + seg supervised step (train.py:442-549 with
                     monodepth + CE active) — the headline `value`, same
                     workload as round-1/2 benches
  exp210_depthcomp   semi-supervised mean-teacher DepthMix step: teacher fwd +
                     depthcomp mix + student fwd + labeled CE
                     (train.py:653-746)
  exp212_pad_online  PAD multi-task online-DepthMix step: 3 student forwards +
                     photometric loss (train.py:679-698)

Measurement modes: monodepth workloads are timed twice —
  cold          at random init, where the predicted depth is spatially rough
                and the Pallas warp kernel's candidate loop is at its widest
  steady_state  after `WARMUP_STEPS` real training steps on the synthetic
                scene with a settling LR schedule, the regime every real
                training run spends >99% of its iterations in (the grids are
                smooth; `grid_yspan_px` — mean per-(8,128)-tile span of
                clamped sample rows — is reported so the claim is checkable)
The headline `value`/`vs_baseline` use steady_state, matching the
reference's own steady-state `time_per_image` telemetry (train.py:787-788).

Batch sizes are throughput-optimal for the 16 GB v5e chip (bs8 / bs4+remat),
NOT the reference experiment definitions (bs2, experiments.py:142-149) —
imgs/sec and MFU are the quantities compared, and the derived baseline is
normalized per image.

Prints ONE JSON line; `vs_baseline` derivation lives in BASELINE.md
(reference eager-torch pipeline on its single GPU, estimated at 12% MFU of
A100 bf16 peak over the same TFLOP/img -> ~30 imgs/sec proxy; the JSON
carries `baseline_kind` so the ratio is self-describing).

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
BASELINE_KIND = "derived_proxy_12pct_a100_mfu"
V5E_PEAK = 197e12           # v5e bf16 peak per chip

# The reference's FLOPs per image for each workload — XLA cost analysis of the
# round-2 program, whose compute graph matches the reference's model math
# 1:1 (materialized upsamples, unfused 3x3 convs). FROZEN so that our own
# FLOP-reducing rewrites (e.g. the phase-decomposed upsample-conv) don't move
# the baseline: the reference still executes its unfused math, so the proxy
# `A100_PEAK * MFU / tflop_per_img` must use ITS per-image work, not ours.
# MFU in the per-mode stats still uses the LIVE cost analysis (our program's
# actual FLOPs on this chip).
REF_TFLOP_PER_IMG = {
    "sde_supervised": 9.797 / 8,     # BENCH_r02 sde_supervised
    "exp210_depthcomp": 14.05 / 8,   # BENCH_r02 exp210_depthcomp
    "exp212_pad_online": 15.258 / 4, # BENCH_r02 exp212_pad_online
}

H = W = 512
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2400))
WARMUP_STEPS = int(os.environ.get("BENCH_WARMUP_STEPS", 450))
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
        # encoder remat no longer needed: the phase-packed stage 0 removed
        # the full-res C=64 residuals and the 3-forward PAD step fits 16G
        # without it (measured ~3% faster; flip back via cfg["remat"]=True)
    return cfg


# the multi_step decay only matters for the steady_state warmup: by step
# ~WARMUP_STEPS the lr has annealed and the depth/pose have settled into the
# smooth-grid regime real training lives in; the schedule costs nothing in
# the timed step (one multiply inside the compiled program). Decaying too
# early freezes whatever roughness the oscillating high-lr phase happened to
# be at (observed: yspan 133 with milestones at 50%/83%), so the first decay
# waits until the scene is fit (~55%), then a long 0.1x phase settles it.
_TRAINING_CFG = {
    "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9, "backbone_lr": 1e-3},
    "lr_schedule": {"name": "multi_step",
                    "milestones": [int(WARMUP_STEPS * 0.55),
                                   int(WARMUP_STEPS * 0.9)],
                    "gamma": 0.1},
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
    return step, state, batch, ubatch, model


def _grid_yspan(model, step_cfg, state, batch):
    """Mean per-(8,128)-tile span of clamped sample-grid rows (scale 0,
    frame +1) — the quantity the warp kernel's candidate loop scales with."""
    from improving_segmentation_with_selfsupervised_depth_tpu.ops import photometric

    @jax.jit
    def f(state, batch):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False)
        outputs = photometric.generate_images_pred(
            batch, outputs, scales=(0,), frame_ids=step_cfg.frame_ids,
            min_depth=step_cfg.min_depth, max_depth=step_cfg.max_depth)
        grid = outputs[photometric.key_of("sample", 1, 0)]
        iy = jnp.clip((grid[..., 1] + 1.0) * 0.5 * (H - 1), 0, H - 1)
        t = iy.reshape(-1, H // 8, 8, W // 128, 128)
        return jnp.mean(jnp.max(t, axis=(2, 4)) - jnp.min(t, axis=(2, 4)))

    return round(float(f(state, batch)), 1)


def _time(compiled, state, batch, ubatch, rng, n_steps):
    state, metrics = compiled(state, batch, ubatch, rng)
    jax.block_until_ready(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = compiled(state, batch, ubatch, rng)
    jax.block_until_ready(metrics["total_loss"])
    return (time.perf_counter() - t0) / n_steps, state


def bench_workload(name, model_cfg, step_cfg, batch_size, with_ema=False,
                   n_steps=10, steady=False):
    if time.time() - _T0 > BUDGET_S:
        return {"skipped": f"time budget {BUDGET_S:.0f}s exceeded"}
    step, state, batch, ubatch, model = _build(model_cfg, step_cfg, batch_size,
                                               with_ema)
    rng = jax.random.PRNGKey(0)

    # AOT: one compile serves cost analysis AND execution
    compiled = step.lower(state, batch, ubatch, rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))

    def stats(dt):
        return {
            "imgs_per_sec": round(batch_size / dt, 3),   # labeled imgs, like
            # the reference's training/time_per_image telemetry
            # (train.py:787-788)
            "step_ms": round(dt * 1e3, 1),
            "mfu_pct": round(100.0 * flops / dt / V5E_PEAK, 2),
        }

    dt_cold, state = _time(compiled, state, batch, ubatch, rng, n_steps)
    res = {
        "batch_size": batch_size,
        "tflop_per_step": round(flops / 1e12, 3),
        "cold": stats(dt_cold),
    }
    if steady and time.time() - _T0 < BUDGET_S:
        res["cold"]["grid_yspan_px"] = _grid_yspan(model, step_cfg, state, batch)
        for _ in range(WARMUP_STEPS):
            state, _ = compiled(state, batch, ubatch, rng)
        # warmup trajectories vary; extend while the grids are still rough
        # (bounded) so steady_state means what it says
        yspan = _grid_yspan(model, step_cfg, state, batch)
        extra = 0
        # "steady" means the settled training regime: tools/bench_steady.py
        # ladders show yspan ~60 still costs ~10% step time vs yspan <20
        while yspan > 25 and extra < 5 and time.time() - _T0 < BUDGET_S:
            for _ in range(150):
                state, _ = compiled(state, batch, ubatch, rng)
            yspan = _grid_yspan(model, step_cfg, state, batch)
            extra += 1
        dt_ss, state = _time(compiled, state, batch, ubatch, rng, n_steps)
        res["steady_state"] = stats(dt_ss)
        res["steady_state"]["grid_yspan_px"] = _grid_yspan(model, step_cfg,
                                                           state, batch)
    return res


def _probe_smooth_warp() -> bool:
    """Compile-probe the warp kernel's smooth-grid fast path on the real
    backend. The fast path's dynamic-shift `pltpu.roll` is the one Mosaic
    construct in this repo with toolchain-version risk; if it fails to
    compile, drop to the always-legal group-scan kernel (set_smooth_path
    clears the jit cache) instead of failing the whole bench."""
    if jax.default_backend() != "tpu":
        return True
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas import warp
    try:
        img = jnp.zeros((1, 8, 128, 1), jnp.float32)
        ix = jnp.zeros((1, 8, 128), jnp.float32)
        iy = jnp.zeros((1, 8, 128), jnp.float32)
        jax.block_until_ready(warp.bilinear_warp_corners_nchw(img, ix, iy))
        return True
    except Exception:
        warp.set_smooth_path(False)
        return False


def main():
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
        StepConfig,
    )

    # a dead TPU tunnel makes backend init block forever: emit a
    # self-describing failure line instead of hanging the driver
    import signal

    def _unreachable(signum, frame):
        print(json.dumps({
            "metric": "imgs_per_sec_sde_supervised", "value": 0.0,
            "unit": "imgs/sec", "vs_baseline": 0.0,
            "error": "backend init exceeded 900s (remote TPU unreachable?)"}))
        os._exit(2)

    signal.signal(signal.SIGALRM, _unreachable)
    signal.alarm(900)
    jax.devices()
    signal.alarm(0)

    warp_smooth_ok = _probe_smooth_warp()
    results = {}

    results["sde_supervised"] = bench_workload(
        "sde_supervised", _model_cfg(),
        StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                   frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                   photometric_dtype=jnp.bfloat16),  # amp: true parity
        batch_size=8, steady=True)

    # exp-210 transfer_dcompgt: seg-only model (SDE-pretrained), offline
    # pseudo-depth drives the depthcomp mask (config/experiments.py:110-143).
    # No monodepth -> no warp -> no cold/steady distinction.
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
    # (config/experiments.py:259-300); bs4, no remat (see _model_cfg note)
    results["exp212_pad_online"] = bench_workload(
        "exp212_pad_online", _model_cfg(pad=True),
        StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                   frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                   unlabeled=True, use_ema=True, mix_mask="depthcomp",
                   unlabeled_color_jitter=True, unlabeled_blur=True,
                   mix_use_gt=True, depthcomp_margin=0.03,
                   depthcomp_foreground_threshold=0.0,
                   depthmix_online_depth=True,
                   photometric_dtype=jnp.bfloat16),  # amp: true parity
        batch_size=4, with_ema=True, steady=True)

    # per-workload proxy: the reference's eager pipeline executes ITS
    # (frozen, unfused) TFLOP/img on an A100 at the assumed MFU
    # (BASELINE.md derivation + REF_TFLOP_PER_IMG note above)
    for name, r in results.items():
        if "tflop_per_step" not in r:
            continue
        proxy = A100_PEAK * REF_ASSUMED_MFU / (REF_TFLOP_PER_IMG[name] * 1e12)
        r["baseline_imgs_per_sec"] = round(proxy, 2)
        for mode in ("cold", "steady_state"):
            if mode in r:
                r[mode]["vs_baseline"] = round(r[mode]["imgs_per_sec"] / proxy, 3)
        # headline per workload: the training regime (steady when measured)
        r["vs_baseline"] = (r.get("steady_state") or r["cold"])["vs_baseline"]

    head = results["sde_supervised"]
    head_stats = head.get("steady_state") or head.get("cold", {})
    print(json.dumps({
        "metric": "train_imgs_per_sec",
        "value": head_stats.get("imgs_per_sec", 0.0),
        "unit": "imgs/sec",
        "vs_baseline": head.get("vs_baseline", 0.0),
        "baseline_imgs_per_sec": head.get("baseline_imgs_per_sec", 0.0),
        "baseline_kind": BASELINE_KIND,
        "headline_mode": "steady_state" if "steady_state" in head else "cold",
        "warp_smooth_path": warp_smooth_ok,
        "workloads": results,
    }))


if __name__ == "__main__":
    main()
