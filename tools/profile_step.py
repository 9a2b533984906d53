"""Capture a jax profiler trace of the train step (if the backend supports it)."""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    # settle the warmup like bench.py: decay only once the scene is fit
    # (~55% of warmup) — decaying earlier freezes residual grid roughness
    # and the trace over-weights the warp kernels (see bench.py's note)
    "lr_schedule": {"name": "multi_step",
                    "milestones": [
                        int(int(os.environ.get("PROFILE_WARMUP", "0") or 300) * 0.55),
                        int(int(os.environ.get("PROFILE_WARMUP", "0") or 300) * 0.9)],
                    "gamma": 0.1},
    "clip_grad_norm": 10.0,
}

model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
batch = {k: jnp.asarray(v) for k, v in
         make_synthetic_batch(BATCH, H, W, frame_ids=(0, -1, 1), num_scales=4).items()}
params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch)
tx = build_optimizer(training_cfg, model_cfg, params["params"])
state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
cfg = StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                 frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                 photometric_dtype=jnp.bfloat16)  # match bench.py (amp parity)
step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
rng = jax.random.PRNGKey(0)
# dump the optimized HLO of the exact profiled program so trace fusion
# names can be joined with module metadata (tools/trace_attrib.py)
hlo_txt = step.lower(state, batch, None, rng).compile().as_text()
with open("/tmp/jaxtrace_hlo.txt", "w") as f:
    f.write(hlo_txt)
print(f"optimized HLO -> /tmp/jaxtrace_hlo.txt ({len(hlo_txt)} bytes)")
state, m = step(state, batch, None, rng)
jax.block_until_ready(m["total_loss"])

# PROFILE_WARMUP=N runs N real training steps first so the trace captures
# the steady-state (smooth-grid) regime instead of the random-init transient
import time as _time

warmup = int(os.environ.get("PROFILE_WARMUP", "0"))
t0 = _time.time()
for i in range(warmup):
    state, m = step(state, batch, None, rng)
if warmup:
    jax.block_until_ready(m["total_loss"])
    print(f"warmup {warmup} steps in {_time.time()-t0:.0f}s")

jax.profiler.start_trace("/tmp/jaxtrace")
for _ in range(3):
    state, m = step(state, batch, None, rng)
jax.block_until_ready(m["total_loss"])
jax.profiler.stop_trace()
print("trace done")

# summarize the trace: top ops by self time
files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
print(files)
if files:
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # find TPU op events (exclude python/host threads)
    from collections import defaultdict

    agg = defaultdict(float)
    for e in events:
        agg[e.get("name", "?")] += e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    total = sum(agg.values())
    for name, dur in top:
        print(f"{dur / 1e3:10.1f} ms  {100 * dur / total:5.1f}%  {name[:110]}")
