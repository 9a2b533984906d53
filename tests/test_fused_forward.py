"""Fused labeled+unlabeled student forward (StepConfig.fuse_unlabeled_forward).

The fused path concatenates the labeled and unlabeled batches and runs the
encoder/decoders/pose and the whole photometric chain ONCE at 2N
(engine/train_steps.py). Exactness argument: every per-scale photometric loss
is a batch mean, so for equal halves m_labeled + m_unlabeled == 2*m_combined;
the only semantic delta is train-mode BatchNorm seeing joint 2N statistics.

The equivalence test removes that delta by construction: when the unlabeled
images are bit-identical to the labeled ones, the 2N batch is a duplication,
whose BN mean/var equal the per-half statistics — so fused and unfused steps
must agree to float-reassociation noise. Dropout is disabled in the test
model (no ASPP, head_dropout=0) because fused/unfused draw masks over
different batch shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

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

H, W = 64, 96


def _setup(fuse: bool, identical_halves: bool):
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        # no ASPP (it has a fixed 0.5 dropout) and no head dropout: the
        # fused/unfused comparison needs a deterministic train-mode forward
        "segmentation_args": {"layers": [9], "head_dropout": 0.0},
        "depth_args": {},
        "frame_ids": [0, -1, 1],
        "num_scales": 1,
    }
    training_cfg = {"optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9},
                    "lr_schedule": None}
    model = build_model(model_cfg, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(2, H, W, frame_ids=(0, -1, 1), num_scales=1).items()}
    extras = make_synthetic_batch(2, H, W, frame_ids=(0, -1, 1), num_scales=1,
                                  seed=7, with_unlabeled_extras=True)
    if identical_halves:
        ubatch = dict(batch)
        ubatch["onehot_lbl"] = jnp.asarray(extras["onehot_lbl"])
        ubatch["is_labeled"] = jnp.asarray(extras["is_labeled"])
    else:
        ubatch = {k: jnp.asarray(v) for k, v in extras.items()}
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(training_cfg, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx, with_ema=True)
    cfg = StepConfig(
        monodepth_lambda=1.0, segmentation_lambda=1.0,
        frame_ids=(0, -1, 1), scales=(0,),
        unlabeled=True, use_ema=True, mix_mask="depthcomp",
        unlabeled_color_jitter=True, unlabeled_blur=True, mix_use_gt=True,
        depthcomp_margin=0.03, depthcomp_foreground_threshold=0.0,
        depthmix_online_depth=True,
        fuse_unlabeled_forward=fuse,
    )
    return model, tx, state, cfg, batch, ubatch


def test_fused_forward_matches_unfused_on_duplicated_halves():
    model, tx, state, cfg_f, batch, ubatch = _setup(fuse=True, identical_halves=True)
    cfg_u = StepConfig(**{**cfg_f.__dict__, "fuse_unlabeled_forward": False})
    rng = jax.random.PRNGKey(3)

    step_f = jax.jit(make_train_step(model, cfg_f, tx))
    step_u = jax.jit(make_train_step(model, cfg_u, tx))
    state_f, m_f = step_f(state, batch, ubatch, rng)
    state_u, m_u = step_u(state, batch, ubatch, rng)

    # losses agree to reassociation noise (means over 2N vs N reductions)
    for k in ("total_loss", "mono_loss", "segmentation_loss", "unlabeled_loss",
              "mono_total_loss"):
        a, b = float(m_f[k]), float(m_u[k])
        assert np.isfinite(a) and np.isfinite(b), k
        assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), (k, a, b)

    # parameter updates agree: same gradients up to float noise
    fa = np.concatenate([np.asarray(x).ravel()[:16] for x in
                         jax.tree_util.tree_leaves(state_f.params)[:8]])
    ua = np.concatenate([np.asarray(x).ravel()[:16] for x in
                         jax.tree_util.tree_leaves(state_u.params)[:8]])
    np.testing.assert_allclose(fa, ua, rtol=5e-3, atol=5e-6)


def _setup_offline(fuse: bool, identical_halves: bool, mix_mask):
    """exp210-style setup: seg-only model (no monodepth/pose), offline
    pseudo-depth DepthMix — exercises the fused labeled+mixed forward."""
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9], "head_dropout": 0.0},
        "depth_args": {},
        "frame_ids": [0, -1, 1],
        "num_scales": 1,
        "disable_monodepth": True,
        "disable_pose": True,
    }
    training_cfg = {"optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9},
                    "lr_schedule": None}
    model = build_model(model_cfg, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(2, H, W, frame_ids=(0, -1, 1), num_scales=1).items()}
    extras = make_synthetic_batch(2, H, W, frame_ids=(0, -1, 1), num_scales=1,
                                  seed=7, with_unlabeled_extras=True)
    if identical_halves:
        ubatch = dict(batch)
        ubatch["onehot_lbl"] = jnp.asarray(extras["onehot_lbl"])
        ubatch["is_labeled"] = jnp.asarray(extras["is_labeled"])
    else:
        ubatch = {k: jnp.asarray(v) for k, v in extras.items()}
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(training_cfg, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx, with_ema=True)
    cfg = StepConfig(
        monodepth_lambda=0.0, segmentation_lambda=1.0,
        frame_ids=(0, -1, 1), scales=(0,),
        unlabeled=True, use_ema=True, mix_mask=mix_mask,
        # jitter/blur off + mix_mask None make the mixed batch bit-identical
        # to the unlabeled one in the duplication test
        unlabeled_color_jitter=mix_mask is not None,
        unlabeled_blur=mix_mask is not None,
        mix_use_gt=True,
        depthcomp_margin=0.03, depthcomp_foreground_threshold=0.0,
        depthmix_online_depth=False,
        fuse_unlabeled_forward=fuse,
    )
    return model, tx, state, cfg, batch, ubatch


def test_fused_mixed_forward_matches_unfused_on_duplicated_halves():
    """With the unlabeled half a bit-copy of the labeled one, mask=None
    (mix is identity) and jitter/blur off, the fused 2N batch is an exact
    duplication, so per-half BN statistics equal the joint statistics and
    the fused/unfused steps must agree to float-reassociation noise."""
    model, tx, state, cfg_f, batch, ubatch = _setup_offline(
        fuse=True, identical_halves=True, mix_mask=None)
    cfg_u = StepConfig(**{**cfg_f.__dict__, "fuse_unlabeled_forward": False})
    rng = jax.random.PRNGKey(3)

    step_f = jax.jit(make_train_step(model, cfg_f, tx))
    step_u = jax.jit(make_train_step(model, cfg_u, tx))
    state_f, m_f = step_f(state, batch, ubatch, rng)
    state_u, m_u = step_u(state, batch, ubatch, rng)

    for k in ("total_loss", "segmentation_loss", "unlabeled_loss"):
        a, b = float(m_f[k]), float(m_u[k])
        assert np.isfinite(a) and np.isfinite(b), k
        assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), (k, a, b)

    fa = np.concatenate([np.asarray(x).ravel()[:16] for x in
                         jax.tree_util.tree_leaves(state_f.params)[:8]])
    ua = np.concatenate([np.asarray(x).ravel()[:16] for x in
                         jax.tree_util.tree_leaves(state_u.params)[:8]])
    np.testing.assert_allclose(fa, ua, rtol=5e-3, atol=5e-6)


def test_fused_mixed_forward_runs_and_learns_on_distinct_batches():
    model, tx, state, cfg, batch, ubatch = _setup_offline(
        fuse=True, identical_halves=False, mix_mask="depthcomp")
    step = jax.jit(make_train_step(model, cfg, tx))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, metrics = step(state, batch, ubatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["unlabeled_loss"]) >= 0
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(p0, p1)


def test_fused_forward_runs_and_learns_on_distinct_batches():
    model, tx, state, cfg, batch, ubatch = _setup(fuse=True, identical_halves=False)
    step = jax.jit(make_train_step(model, cfg, tx))
    d0 = np.asarray(jax.tree_util.tree_leaves(state.params["depth"])[0])
    state, metrics = step(state, batch, ubatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["mono_total_loss"]) > 0  # both halves contribute
    assert float(metrics["unlabeled_loss"]) >= 0
    d1 = np.asarray(jax.tree_util.tree_leaves(state.params["depth"])[0])
    assert not np.allclose(d0, d1)
