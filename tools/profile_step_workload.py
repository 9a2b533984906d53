"""Device-trace any of the three flagship bench workloads (not just the
supervised step that tools/profile_step.py hardwires).

Reuses bench.py's exact workload definitions (`bench._step_cfgs`) so the
traced program is the one the bench times. Usage:

    PROFILE_WARMUP=300 python tools/profile_step_workload.py exp212_pad_online

Trace -> /tmp/jaxtrace_<name>; optimized HLO (for tools/trace_attrib.py)
-> /tmp/jaxtrace_<name>_hlo.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import build_optimizer
from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import create_train_state
from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import make_train_step
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "exp212_pad_online"
    match = [w for w in bench._step_cfgs() if w[0] == name]
    if not match:
        print("unknown workload", name)
        return 2
    _, model_cfg, step_cfg, batch_size, with_ema, _ = match[0]

    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch, ubatch = bench._make_batches(step_cfg, batch_size)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(bench._TRAINING_CFG, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx,
                               with_ema=with_ema)
    step = jax.jit(make_train_step(model, step_cfg, tx), donate_argnums=(0,))

    rng = jax.random.PRNGKey((os.getpid() << 16) ^ (int(time.time()) & 0x7FFFFFFF))
    hlo = step.lower(state, batch, ubatch, rng).compile().as_text()
    hlo_path = f"/tmp/jaxtrace_{name}_hlo.txt"
    with open(hlo_path, "w") as f:
        f.write(hlo)
    print(f"optimized HLO -> {hlo_path} ({len(hlo)} bytes)", flush=True)

    state, m = step(state, batch, ubatch, rng)
    jax.block_until_ready(m["total_loss"])

    warmup = int(os.environ.get("PROFILE_WARMUP", "0"))
    t0 = time.time()
    for i in range(warmup):
        state, m = step(state, batch, ubatch, jax.random.fold_in(rng, i))
        if i % 100 == 99:
            jax.block_until_ready(m["total_loss"])
            print(f"warmup {i + 1}: loss={float(m['total_loss']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    if warmup:
        jax.block_until_ready(m["total_loss"])

    trace_dir = f"/tmp/jaxtrace_{name}"
    jax.profiler.start_trace(trace_dir)
    for i in range(2):
        state, m = step(state, batch, ubatch, jax.random.fold_in(rng, warmup + i))
    jax.block_until_ready(m["total_loss"])
    jax.profiler.stop_trace()
    print(f"trace -> {trace_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
