"""Pre-serialize the bench workloads' programs to bench_artifacts/*.hlo.gz.

Why: the driver's bench run is time-bounded, and on a 1-core host the
client-side *tracing* of the flagship programs costs 3-5 minutes per
workload (round 3's bench died rc=124 with zero workloads recorded).
`jax.export` lets us pay that tracing cost once, here, and commit the
StableHLO; bench.py then deserializes and calls — no flax/optax tracing at
bench time. The same mechanism serves the framework's AOT serving story
(engine/export.py); this tool reuses it for the benchmark programs.

Per workload (definitions imported from bench._step_cfgs so the artifacts
are traced from exactly the programs the bench times):
  <name>.init.hlo.gz    (rng, batch) -> [flat state]   full random init:
                        params + batch_stats + opt_state [+ EMA], one program
  <name>.scan.hlo.gz    ([flat state], batch, ubatch, rng) -> ([flat], metrics)
                        — bench.SCAN_LEN lax.scan-chained train steps in ONE
                        program (the relay-safe timing unit, bench.py
                        docstring; also the warmup unit)
  <name>.yspan.hlo.gz   ([flat state], batch) -> scalar  grid-roughness probe
                        (steady workloads only)

The state crosses the artifact boundary as a FLAT leaf list: jax.export
refuses to serialize unregistered pytree node types (flax TrainState, every
optax state namedtuple), and bench.py only ever threads the state opaquely
between init/step/yspan anyway — the treedef is a trace-time constant baked
in here and never needed at bench time.

MUST run against the TPU backend (the default axon tunnel): the warp
dispatch in ops/resample.py picks the Pallas kernel only when
jax.default_backend() == "tpu", and that choice is baked into the traced
program. Export only traces — nothing heavy executes on the chip.

Usage:  python tools/export_bench_steps.py [workload ...]
        (default: all three; ~4-8 min each on the 1-core host)

Regenerate whenever the model/step/optimizer code or the bench workload
definitions change; bench.py falls back to live tracing if an artifact
fails to deserialize or call, and tests/test_bench_artifacts.py pins the
manifest against the current code's eval_shape signature.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import export as jexport

import bench
from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
    make_train_step,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model


def _spec_tree(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree)


def _dump(name, kind, exp):
    data = exp.serialize()
    path = os.path.join(bench.ART_DIR, f"{name}.{kind}.hlo.gz")
    with gzip.open(path, "wb", compresslevel=6) as f:
        f.write(data)
    print(f"  {name}.{kind}: {len(data) / 1e6:.2f} MB "
          f"({os.path.getsize(path) / 1e6:.2f} MB gz)", flush=True)


def export_workload(name, model_cfg, step_cfg, batch_size, with_ema, steady):
    t0 = time.time()
    print(f"[{name}] tracing ...", flush=True)
    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch, ubatch = bench._make_batches(step_cfg, batch_size)
    batch_spec = _spec_tree(batch)
    ubatch_spec = _spec_tree(ubatch) if ubatch is not None else None
    rng_spec = _spec_tree(jax.random.PRNGKey(0))

    var_spec = jax.eval_shape(
        lambda r, b: model.init({"params": r, "dropout": r}, b),
        rng_spec, batch_spec)
    init_fn, tx = bench.make_init_fn(model, model_cfg, bench._TRAINING_CFG,
                                     with_ema, var_spec["params"])

    # state treedef WITHOUT another full-model trace: params/batch_stats from
    # var_spec, opt_state via a cheap optax eval_shape, EMA = params copy
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
        TrainState,
    )

    state_spec = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32),
        params=var_spec["params"],
        batch_stats=var_spec.get("batch_stats", {}),
        opt_state=jax.eval_shape(tx.init, var_spec["params"]),
        ema_params=var_spec["params"] if with_ema else None,
    )
    flat_spec, treedef = jax.tree_util.tree_flatten(state_spec)

    def init_flat(rng, batch):
        return jax.tree_util.tree_leaves(init_fn(rng, batch))

    exp_init = jexport.export(jax.jit(init_flat))(rng_spec, batch_spec)
    _dump(name, "init", exp_init)
    assert [(v.shape, v.dtype) for v in exp_init.out_avals] == \
           [(v.shape, v.dtype) for v in flat_spec], "state spec mismatch"

    scan_fn = bench.make_scan_fn(make_train_step(model, step_cfg, tx))

    def scan_flat(flat_state, batch, ubatch, rng):
        state = jax.tree_util.tree_unflatten(treedef, flat_state)
        new_state, metrics = scan_fn(state, batch, ubatch, rng)
        return jax.tree_util.tree_leaves(new_state), metrics

    exp_step = jexport.export(jax.jit(scan_flat, donate_argnums=(0,)))(
        flat_spec, batch_spec, ubatch_spec, rng_spec)
    _dump(name, "scan", exp_step)

    if steady:
        yspan_fn = bench.make_yspan_fn(model, step_cfg)

        def yspan_flat(flat_state, batch):
            return yspan_fn(jax.tree_util.tree_unflatten(treedef, flat_state),
                            batch)

        exp_yspan = jexport.export(jax.jit(yspan_flat))(flat_spec, batch_spec)
        _dump(name, "yspan", exp_yspan)
    print(f"[{name}] done in {time.time() - t0:.0f}s", flush=True)
    return {
        "platforms": list(exp_step.platforms),
        "batch_size": batch_size,
        "with_ema": with_ema,
        "steady": steady,
        "n_state_leaves": len(flat_spec),
        "scan_len": bench.SCAN_LEN,
    }


def main():
    assert jax.default_backend() == "tpu", (
        "export must trace against the TPU backend so the Pallas warp path "
        f"is baked in (got {jax.default_backend()!r}); run without "
        "JAX_PLATFORMS=cpu")
    os.makedirs(bench.ART_DIR, exist_ok=True)
    only = set(sys.argv[1:])
    manifest = {"jax_version": jax.__version__, "workloads": {}}
    mpath = os.path.join(bench.ART_DIR, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest.update(json.load(f))
        manifest["jax_version"] = jax.__version__
    for name, model_cfg, step_cfg, batch_size, with_ema, steady in (
            bench._step_cfgs()):
        if only and name not in only:
            continue
        manifest["workloads"][name] = export_workload(
            name, model_cfg, step_cfg, batch_size, with_ema, steady)
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1)
    print(f"manifest -> {mpath}", flush=True)


if __name__ == "__main__":
    main()
