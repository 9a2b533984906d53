"""Breakdown bench: time forward / photometric loss / full train step on TPU."""

import time

import jax
import jax.numpy as jnp

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
BATCH = 4

model_cfg = {
    "backbone_name": "resnet101",
    "replace_stride_with_dilation": [False, False, True],
    "segmentation_name": "joint_seg_depth_dec",
    "segmentation_args": {"layers": [9]},
    "depth_args": {"intermediate_aspp": True, "aspp_rates": [6, 12, 18]},
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


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:35s} {dt * 1000:8.1f} ms  {BATCH / dt:7.2f} imgs/s")
    return dt


variables = {"params": state.params, "batch_stats": state.batch_stats}

fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
timeit("forward (eval)", fwd, variables, batch)


@jax.jit
def fwd_loss(v, b):
    out = model.apply(v, b, train=False)
    out = photometric.generate_images_pred(
        b, out, scales=cfg.scales, frame_ids=cfg.frame_ids,
        min_depth=cfg.min_depth, max_depth=cfg.max_depth)
    losses = photometric.compute_losses(
        jax.random.PRNGKey(0), b, out, scales=cfg.scales, frame_ids=cfg.frame_ids,
        disparity_smoothness=cfg.disparity_smoothness)
    return losses["loss"]


timeit("forward + photometric loss", fwd_loss, variables, batch)

step = jax.jit(make_train_step(model, cfg, tx))
s = state


def run_step(s_, b):
    return step(s_, b, None, jax.random.PRNGKey(0))


out_state, m = run_step(s, batch)
jax.block_until_ready(m["total_loss"])
t0 = time.perf_counter()
N = 10
for _ in range(N):
    out_state, m = run_step(out_state, batch)
jax.block_until_ready(m["total_loss"])
dt = (time.perf_counter() - t0) / N
print(f"{'full train step':35s} {dt * 1000:8.1f} ms  {BATCH / dt:7.2f} imgs/s")
