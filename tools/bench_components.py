"""Empirically isolate train-step component costs on TPU."""

import sys
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

H = W = 512
BATCH = 8
MODE = sys.argv[1] if len(sys.argv) > 1 else "full"

seg_on = MODE in ("full", "seg")
mono_on = MODE in ("full", "mono")

model_cfg = {
    "backbone_name": "resnet101",
    "replace_stride_with_dilation": [False, False, True],
    "segmentation_name": "joint_seg_depth_dec" if seg_on else None,
    "segmentation_args": {"layers": [9]},
    "depth_args": {"intermediate_aspp": True, "aspp_rates": [6, 12, 18]},
    "frame_ids": [0, -1, 1] if mono_on else [0],
    "num_scales": 4,
    "disable_monodepth": not mono_on,
    "disable_pose": not mono_on,
}
training_cfg = {
    "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9, "backbone_lr": 1e-3},
    "lr_schedule": {"name": "multi_step", "milestones": [30000], "gamma": 0.1},
    "clip_grad_norm": 10.0,
}

model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
batch = {k: jnp.asarray(v) for k, v in
         make_synthetic_batch(BATCH, H, W,
                              frame_ids=tuple(model_cfg["frame_ids"]),
                              num_scales=4).items()}
params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch)
tx = build_optimizer(training_cfg, model_cfg, params["params"])
state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
cfg = StepConfig(
    monodepth_lambda=1.0 if mono_on else 0.0,
    segmentation_lambda=1.0 if seg_on else 0.0,
    frame_ids=tuple(model_cfg["frame_ids"]),
    scales=(0, 1, 2, 3) if mono_on else (0,),
    disable_monodepth=not mono_on, disable_pose=not mono_on,
)
step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
rng = jax.random.PRNGKey(0)
state, m = step(state, batch, None, rng)
jax.block_until_ready(m["total_loss"])
N = 20
t0 = time.perf_counter()
for _ in range(N):
    state, m = step(state, batch, None, rng)
jax.block_until_ready(m["total_loss"])
dt = (time.perf_counter() - t0) / N
print(f"mode={MODE}: {dt * 1000:.1f} ms/step, {BATCH / dt:.2f} imgs/s", flush=True)
