"""MFU measurement: XLA cost-analysis FLOPs vs measured step time.

Protocol per docs/DESIGN.md measurement caveats: time only the full donated
train step (evolving state defeats the axon relay's execution cache).
"""

import time

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

H = W = 512
BATCH = 8

# v5e peak per chip
PEAK_BF16_FLOPS = 197e12
HBM_GBPS = 819.0

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

# AOT: the compiled executable serves cost analysis AND execution (calling
# the jitted fn after .lower().compile() would trigger a second full compile)
compiled = step.lower(state, batch, None, rng).compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", 0.0)
bytes_acc = ca.get("bytes accessed", 0.0)
print(f"cost_analysis flops: {flops / 1e12:.3f} TFLOP/step "
      f"({flops / BATCH / 1e9:.1f} GFLOP/img)")
print(f"cost_analysis bytes accessed: {bytes_acc / 1e9:.2f} GB/step")

state, m = compiled(state, batch, None, rng)
jax.block_until_ready(m["total_loss"])
n_steps = 10
t0 = time.perf_counter()
for _ in range(n_steps):
    state, m = compiled(state, batch, None, rng)
jax.block_until_ready(m["total_loss"])
dt = (time.perf_counter() - t0) / n_steps

print(f"step time: {dt * 1000:.1f} ms  ({BATCH / dt:.2f} imgs/s)")
print(f"MFU (vs {PEAK_BF16_FLOPS / 1e12:.0f} TF/s bf16): {flops / dt / PEAK_BF16_FLOPS * 100:.2f}%")
print(f"HBM util if bw-bound (vs {HBM_GBPS} GB/s): {bytes_acc / dt / 1e9 / HBM_GBPS * 100:.1f}%")
print(f"ideal compute time: {flops / PEAK_BF16_FLOPS * 1000:.1f} ms; "
      f"ideal bw time: {bytes_acc / 1e9 / HBM_GBPS * 1000:.1f} ms")
