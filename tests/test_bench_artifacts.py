"""Staleness guard for the committed bench artifacts (bench_artifacts/).

bench.py's fast path deserializes pre-traced StableHLO programs
(tools/export_bench_steps.py) instead of tracing the model — so if the
model/step/optimizer code changes shape or signature, the committed
artifacts silently describe an OLD program. This test pins the artifacts'
input/output avals against the CURRENT code's eval_shape, which catches
that drift on the CPU test mesh without executing anything.

(The artifacts themselves are platform="tpu" and never executed here;
deserialization + aval comparison is platform-independent.)
"""

import os

import jax
import pytest

import bench

pytestmark = pytest.mark.skipif(
    not os.path.isdir(bench.ART_DIR),
    reason="bench_artifacts/ not generated",
)


def _flat_avals(tree):
    return [(tuple(x.shape), str(x.dtype))
            for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.parametrize("wl", bench._step_cfgs(),
                         ids=lambda wl: wl[0])
def test_artifact_matches_current_code(wl):
    name, model_cfg, step_cfg, batch_size, with_ema, steady = wl
    import jax.numpy as jnp

    from improving_segmentation_with_selfsupervised_depth_tpu.models import (
        build_model,
    )

    for kind in ("init", "scan") + (("yspan",) if steady else ()):
        path = os.path.join(bench.ART_DIR, f"{name}.{kind}.hlo.gz")
        if not os.path.exists(path):
            pytest.skip(f"{name}.{kind} artifact not generated")

    exp_init = bench._load_exported(name, "init")
    exp_step = bench._load_exported(name, "scan")
    assert "tpu" in exp_init.platforms and "tpu" in exp_step.platforms

    # current code's state signature (abstract trace only)
    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch, ubatch = bench._make_batches(step_cfg, batch_size)
    rng = jax.random.PRNGKey(0)
    var_spec = jax.eval_shape(
        lambda r, b: model.init({"params": r, "dropout": r}, b), rng, batch)
    init_fn, _ = bench.make_init_fn(model, model_cfg, bench._TRAINING_CFG,
                                    with_ema, var_spec["params"])
    state_spec = jax.eval_shape(init_fn, rng, batch)

    # exported init's outputs == current init's flattened state
    assert _flat_avals(exp_init.out_avals) == _flat_avals(state_spec), (
        f"{name}.init artifact is stale — regenerate with "
        "tools/export_bench_steps.py")

    # exported step's inputs == (flat state, batch, ubatch, rng)
    current_in = _flat_avals(
        (jax.tree_util.tree_leaves(state_spec), batch, ubatch, rng))
    assert _flat_avals(exp_step.in_avals) == current_in, (
        f"{name}.scan artifact is stale — regenerate with "
        "tools/export_bench_steps.py")

    # the scan artifact bakes SCAN_LEN in; bench divides by the CURRENT value
    import json

    with open(os.path.join(bench.ART_DIR, "manifest.json")) as f:
        manifest = json.load(f)
    entry = manifest["workloads"].get(name, {})
    if "scan_len" in entry:
        assert entry["scan_len"] == bench.SCAN_LEN, (
            f"{name}.scan was exported with SCAN_LEN={entry['scan_len']} but "
            f"bench.SCAN_LEN={bench.SCAN_LEN} — regenerate artifacts")
