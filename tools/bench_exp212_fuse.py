"""A/B the fused student forward (StepConfig.fuse_unlabeled_forward).

Measures a bench.py workload with the knob off (incumbent: sequential bs-N
student forwards) vs on (one bs-2N batch-concatenated forward), using the
scan-chained protocol (the only timing shape the relay reports faithfully —
bench.py module docstring). Two workloads have a fusable pair:
  exp212_pad_online   labeled + unlabeled forwards (one photometric chain)
  exp210_depthcomp    labeled + mixed forwards (offline DepthMix)

Shared warm state: warms up with the UNFUSED step so both variants are
timed from the same settled-grid regime; each timing advances the state,
which at settled states is regime-neutral.

Usage: python tools/bench_exp212_fuse.py [--workload exp212_pad_online]
           [--warmup-steps 120] [--windows 2]
"""

import argparse
import dataclasses
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

import bench
from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import build_optimizer
from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import create_train_state
from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
    make_train_step,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="exp212_pad_online",
                    choices=["exp212_pad_online", "exp210_depthcomp"])
    ap.add_argument("--warmup-steps", type=int, default=120)
    ap.add_argument("--windows", type=int, default=2)
    args = ap.parse_args()

    name, model_cfg, step_cfg, batch_size, with_ema, _ = [
        w for w in bench._step_cfgs() if w[0] == args.workload][0]
    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch, ubatch = bench._make_batches(step_cfg, batch_size)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(bench._TRAINING_CFG, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx,
                               with_ema=with_ema)
    rng = jax.random.PRNGKey(42)

    bench._warm_probe()  # pre-compile the sync probe (bench.py r4d hang note)

    variants = {}
    for fuse in (False, True):
        cfg = dataclasses.replace(step_cfg, fuse_unlabeled_forward=fuse)
        scan = bench.make_scan_fn(make_train_step(model, cfg, tx))
        t0 = time.time()
        compiled = (jax.jit(scan, donate_argnums=(0,))
                    .lower(state, batch, ubatch, rng).compile())
        print(f"fuse={fuse}: compiled in {time.time() - t0:.0f}s", flush=True)
        variants[fuse] = compiled

    # settle with the incumbent (advances SCAN_LEN steps per call)
    n_chunks = max(1, args.warmup_steps // bench.SCAN_LEN)
    t0 = time.time()
    for i in range(n_chunks):
        state, m = variants[False](state, batch, ubatch, jax.random.fold_in(rng, 100 + i))
    loss = bench._sync_fetch(m["total_loss"], 600.0)
    print(f"warmup {n_chunks * bench.SCAN_LEN} steps in {time.time() - t0:.0f}s, "
          f"loss={float(loss):.4f}", flush=True)

    for fuse in (False, True):
        times = []
        for w in range(args.windows):
            dt, state = bench._time(variants[fuse], state, batch, ubatch,
                                    jax.random.fold_in(rng, 1000 + w), 300.0)
            if dt is not None:
                times.append(dt)
                print(f"fuse={fuse} window {w}: {dt * 1e3:.1f} ms/step "
                      f"({batch_size / dt:.1f} imgs/s)", flush=True)
            else:
                print(f"fuse={fuse} window {w}: sync wedged", flush=True)
        if times:
            best = min(times)
            print(f"fuse={fuse}: best {best * 1e3:.1f} ms/step "
                  f"= {batch_size / best:.1f} imgs/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
