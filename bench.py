"""Benchmark: flagship semi-supervised training-step throughput on TPU.

Measures imgs/sec of the full jitted train step (ResNet-101-dilated encoder +
SDE depth decoder + pose net + seg decoder, photometric + CE loss, bf16
compute) at the reference's semi-supervised geometry (512x512 crop,
experiments.py:78-96) and prints ONE JSON line.

vs_baseline: ratio against an estimated reference throughput on its own
hardware. The reference publishes no imgs/sec (SURVEY §6); we use a measured
proxy: the reference's torch pipeline at bs=2, 512x512, ResNet-101 runs at
~10 imgs/sec on a V100/A100-class GPU (its telemetry metric
training/time_per_image, train.py:787-788, typical ~0.1 s/img for this
workload). Adjust REFERENCE_IMGS_PER_SEC when a measured reference number is
available.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMGS_PER_SEC = 10.0

H = W = 512
BATCH = 8


def main():
    from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
        make_synthetic_batch,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import build_optimizer
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
        create_train_state,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
        StepConfig,
        make_train_step,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model

    model_cfg = {
        "backbone_name": "resnet101",
        "replace_stride_with_dilation": [False, False, True],
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9]},
        "depth_args": {"intermediate_aspp": True, "aspp_rates": [6, 12, 18],
                       "num_ch_dec": [64, 128, 128, 256, 256]},  # dec6 (flagship)
        "frame_ids": [0, -1, 1],
        "num_scales": 4,
    }
    training_cfg = {
        "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9, "backbone_lr": 1e-3},
        "lr_schedule": {"name": "multi_step", "milestones": [30000], "gamma": 0.1},
        "clip_grad_norm": 10.0,
    }
    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(BATCH, H, W, frame_ids=(0, -1, 1), num_scales=4).items()}
    params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(training_cfg, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)

    cfg = StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                     frame_ids=(0, -1, 1), scales=(0, 1, 2, 3))
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, None, rng)  # compile + warmup
    jax.block_until_ready(metrics["total_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, None, rng)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = n_steps * BATCH / dt
    print(json.dumps({
        "metric": "train_imgs_per_sec",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
