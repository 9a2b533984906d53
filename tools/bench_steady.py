"""Cold vs steady-state step time for the sde_supervised workload.

The Pallas warp kernel's candidate loop widens with grid roughness: at
random init the sample grids scatter (~150 px y-span per tile) while in the
real training regime they are smooth. This tool measures both ends: step
time at init ("cold"), then after `--warmup-steps` real training steps on
the synthetic scene ("steady"), plus the mean per-(8,128)-tile y-span of
the scale-0 sample grid so the roughness claim is checkable.

Usage: python tools/bench_steady.py [--warmup-steps 300] [--time-steps 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import build_optimizer
from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import create_train_state
from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
    StepConfig,
    make_train_step,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model
from improving_segmentation_with_selfsupervised_depth_tpu.ops import photometric

H = W = 512

model_cfg = {
    "backbone_name": "resnet101",
    "replace_stride_with_dilation": [False, False, True],
    "segmentation_name": "joint_seg_depth_dec",
    "segmentation_args": {"layers": [9]},
    "depth_args": {"intermediate_aspp": True, "aspp_rates": [6, 12, 18],
                   "num_ch_dec": [64, 128, 128, 256, 256]},
    "frame_ids": [0, -1, 1],
    "num_scales": 4,
}
training_cfg = {
    "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9, "backbone_lr": 1e-3},
    "lr_schedule": {"name": "multi_step", "milestones": [30000], "gamma": 0.1},
    "clip_grad_norm": 10.0,
}


def tile_yspan(state, batch, model, cfg):
    """Mean over (8,128) tiles of (max-min) sample-grid y, scale 0, frame 1."""

    @jax.jit
    def f(state, batch):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False)
        outputs = photometric.generate_images_pred(
            batch, outputs, scales=(0,), frame_ids=cfg.frame_ids,
            min_depth=cfg.min_depth, max_depth=cfg.max_depth)
        grid = outputs[photometric.key_of("sample", 1, 0)]  # (N,H,W,2) in [-1,1]
        # the kernel clamps gather rows to [0, H-1]; the candidate loop walks
        # the clamped span, so measure that
        iy = jnp.clip((grid[..., 1] + 1.0) * 0.5 * (H - 1), 0, H - 1)
        t = iy.reshape(-1, H // 8, 8, W // 128, 128)
        span = jnp.max(t, axis=(2, 4)) - jnp.min(t, axis=(2, 4))
        return jnp.mean(span)

    return float(f(state, batch))


def make_scan_step(step_fn, n):
    """n scan-chained steps as ONE program. Host-looped step calls are NOT
    trustworthy on the tunneled-TPU relay: a controlled A/B (2026-08-19)
    measured the same state at 1081 ms/step scan-chained vs ~294 ms/step by
    python loop (identical or varied rng) — the relay under-reports dependent
    call chains ~3.7x. All ladder numbers from this tool before that date
    carry that distortion (relative A/Bs were device-trace-checked)."""

    def scan_fn(state, batch, ubatch, rng):
        def body(st, i):
            st, metrics = step_fn(st, batch, ubatch, jax.random.fold_in(rng, i))
            return st, metrics["total_loss"]
        state, losses = jax.lax.scan(body, state, jnp.arange(n))
        return state, {"total_loss": losses[-1]}

    return scan_fn


def time_steps(compiled_scan, state, batch, rng, n):
    """One timed remote execution of the n-step scan program."""
    t0 = time.perf_counter()
    state, metrics = compiled_scan(state, batch, None, rng)
    jax.block_until_ready(metrics["total_loss"])
    return (time.perf_counter() - t0) / n, state


def main():
    global BATCH
    ap = argparse.ArgumentParser()
    ap.add_argument("--warmup-steps", type=int, default=300)
    ap.add_argument("--time-steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bf16-photo", action="store_true",
                    help="compute the SSIM/L1 chain in bf16 (amp parity)")
    ap.add_argument("--fused-pred", action="store_true",
                    help="route the per-scale reprojection through the fused "
                         "Pallas SSIM kernel")
    ap.add_argument("--remat-photo", action="store_true",
                    help="jax.checkpoint the photometric loss chain (warp "
                         "outputs stay residuals)")
    ap.add_argument("--rbg", action="store_true",
                    help="A/B: use the rbg PRNG (hardware RNG lowering) for "
                         "the in-step random bits (dropout/jitter/tie-break) "
                         "instead of threefry")
    args = ap.parse_args()
    BATCH = args.batch
    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")

    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(BATCH, H, W, frame_ids=(0, -1, 1), num_scales=4).items()}
    params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(training_cfg, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    cfg = StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                     frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                     photometric_dtype=jnp.bfloat16 if args.bf16_photo else None,
                     fused_pred_loss=args.fused_pred,
                     remat_photometric=args.remat_photo)
    scan = jax.jit(make_scan_step(make_train_step(model, cfg, tx),
                                  args.time_steps),
                   donate_argnums=(0,))
    # process-unique salt: the relay replay cache is cross-process and
    # value-keyed (docs/DESIGN.md) — a re-run replaying the canonical rng
    # sequence reports the previous run's times
    rng = jax.random.PRNGKey((os.getpid() << 16)
                             ^ (int(time.time()) & 0x7FFFFFFF))
    t_compile0 = time.time()
    compiled = scan.lower(state, batch, None, rng).compile()
    print(f"compile {time.time() - t_compile0:.1f}s", flush=True)

    print(f"cold yspan={tile_yspan(state, batch, model, cfg):.1f}", flush=True)
    # one un-timed execution warms program load (and runs time_steps real
    # steps); the second is the timed cold window
    state, _ = compiled(state, batch, None, jax.random.fold_in(rng, 10**6))
    dt, state = time_steps(compiled, state, batch,
                           jax.random.fold_in(rng, 10**6 + 1), args.time_steps)
    print(f"cold step_ms={dt*1e3:.1f} imgs/s={BATCH/dt:.2f}", flush=True)

    t0 = time.time()
    steps = 2 * args.time_steps
    while steps < args.warmup_steps:
        state, metrics = compiled(state, batch, None,
                                  jax.random.fold_in(rng, steps))
        steps += args.time_steps
        if steps % 50 < args.time_steps:
            jax.block_until_ready(metrics["total_loss"])
            print(f"warmup {steps}: loss={float(metrics['total_loss']):.4f} "
                  f"yspan={tile_yspan(state, batch, model, cfg):.1f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    dt, state = time_steps(compiled, state, batch,
                           jax.random.fold_in(rng, 10**6 + 2), args.time_steps)
    print(f"steady step_ms={dt*1e3:.1f} imgs/s={BATCH/dt:.2f}", flush=True)


if __name__ == "__main__":
    main()
