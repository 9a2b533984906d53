"""Optimizer / LR-schedule / EMA parity with the reference's torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import (
    build_lr_factor_fn,
    build_optimizer,
    build_param_labels,
    masked_clip_by_global_norm,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
    ema_model_names,
    update_ema,
)


def _run_jax_sgd(training_cfg, model_cfg, params0, grads, steps):
    tx = build_optimizer(training_cfg, model_cfg, params0)
    state = tx.init(params0)
    p = params0
    import optax

    for i in range(steps):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    return p


def test_sgd_momentum_weight_decay_matches_torch():
    w0 = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    g = np.random.default_rng(1).standard_normal((4, 3)).astype(np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, weight_decay=0.0005)
    for _ in range(5):
        tw.grad = torch.tensor(g)
        opt.step()

    params = {"segmentation": {"w": jnp.asarray(w0)}}
    grads = {"segmentation": {"w": jnp.asarray(g)}}
    cfg = {"optimizer": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                         "weight_decay": 0.0005}, "lr_schedule": None}
    p = _run_jax_sgd(cfg, {}, params, grads, 5)
    np.testing.assert_allclose(np.asarray(p["segmentation"]["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_matches_torch():
    w0 = np.random.default_rng(2).standard_normal((5,)).astype(np.float32)
    g = np.random.default_rng(3).standard_normal((5,)).astype(np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([tw], lr=1e-3)
    for _ in range(4):
        tw.grad = torch.tensor(g)
        opt.step()

    params = {"depth": {"w": jnp.asarray(w0)}}
    grads = {"depth": {"w": jnp.asarray(g)}}
    cfg = {"optimizer": {"name": "adam", "lr": 1e-3}, "lr_schedule": None}
    p = _run_jax_sgd(cfg, {}, params, grads, 4)
    np.testing.assert_allclose(np.asarray(p["depth"]["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_per_group_lrs_and_freezing():
    params = {"encoder": {"w": jnp.ones(3)}, "segmentation": {"w": jnp.ones(3)},
              "pose": {"w": jnp.ones(3)}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    cfg = {"optimizer": {"name": "sgd", "lr": 0.1, "backbone_lr": 0.01,
                         "pose_lr": 0.001}, "lr_schedule": None}
    model_cfg = {"freeze_pose": True}
    p = _run_jax_sgd(cfg, model_cfg, params, grads, 1)
    np.testing.assert_allclose(np.asarray(p["segmentation"]["w"]), 1 - 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["encoder"]["w"]), 1 - 0.01, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["pose"]["w"]), 1.0)  # frozen


def test_labels_pad_split():
    params = {"mtl_decoder": {"depth_dec": {"w": 0}, "seg_dec": {"w": 0},
                              "sa_depth": {"w": 0}, "sa_seg": {"w": 0},
                              "seg_final_head": {"w": 0}},
              "encoder": {"w": 0}}
    labels = build_param_labels(params, {})
    m = labels["mtl_decoder"]
    assert m["depth_dec"]["w"] == "depth" and m["sa_seg"]["w"] == "depth"
    assert m["seg_dec"]["w"] == "segmentation" and m["sa_depth"]["w"] == "segmentation"
    assert m["seg_final_head"]["w"] == "segmentation"
    assert labels["encoder"]["w"] == "encoder"


def test_lr_schedules_match_torch():
    # step_lr
    f = build_lr_factor_fn({"name": "step_lr", "step_size": 10, "gamma": 0.1})
    assert float(f(9)) == 1.0
    np.testing.assert_allclose(float(f(10)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(f(25)), 0.01, rtol=1e-6)
    # multi_step
    f = build_lr_factor_fn({"name": "multi_step", "milestones": [3, 5], "gamma": 0.5})
    assert float(f(2)) == 1.0
    np.testing.assert_allclose(float(f(3)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(f(5)), 0.25, rtol=1e-6)
    # poly_lr_2 (reference schedulers.py:51-55)
    f = build_lr_factor_fn({"name": "poly_lr_2", "power": 0.9, "max_iter": 100})
    np.testing.assert_allclose(float(f(50)), max(1e-6, 0.5**0.9), rtol=1e-5)
    # exp
    f = build_lr_factor_fn({"name": "exp_lr", "gamma": 0.9})
    np.testing.assert_allclose(float(f(3)), 0.9**3, rtol=1e-5)
    # warmup (reference WarmUpLR, schedulers.py:83-108)
    f = build_lr_factor_fn({"name": "constant_lr", "warmup_iters": 10,
                            "warmup_factor": 0.2, "warmup_mode": "linear"})
    np.testing.assert_allclose(float(f(0)), 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(f(5)), 0.2 * 0.5 + 0.5, rtol=1e-6)
    assert float(f(10)) == 1.0


def test_masked_clip_by_global_norm():
    mask = {"a": True, "b": False}
    updates = {"a": jnp.ones(4) * 10.0, "b": jnp.ones(4) * 10.0}
    clip = masked_clip_by_global_norm(1.0, mask)
    new, _ = clip.update(updates, clip.init(updates))
    # masked part scaled to norm 1; unmasked untouched
    np.testing.assert_allclose(float(jnp.linalg.norm(new["a"])), 1.0, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(new["b"]), np.asarray(updates["b"]))


def test_ema_formula_and_masking():
    ema = {"encoder": {"w": jnp.zeros(3)}, "segmentation": {"w": jnp.zeros(3)}}
    params = {"encoder": {"w": jnp.ones(3)}, "segmentation": {"w": jnp.ones(3)}}
    # step 0: alpha = min(1 - 1/1, 0.99) = 0 -> ema = params
    out = update_ema(ema, params, jnp.asarray(0), 0.99, names=("encoder",))
    np.testing.assert_allclose(np.asarray(out["encoder"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["segmentation"]["w"]), 0.0)  # masked out
    # large step: alpha = 0.99
    out = update_ema(ema, params, jnp.asarray(10_000), 0.99, names=None)
    np.testing.assert_allclose(np.asarray(out["encoder"]["w"]), 0.01, rtol=1e-5)


def test_ema_model_names_variants():
    assert ema_model_names({}, {"segmentation_name": "mtl_pad"}) == (
        "depth", "encoder", "mtl_decoder")
    assert ema_model_names({"save_monodepth_ema": True},
                           {"freeze_backbone": True}) == ("depth", "pose", "pose_encoder")
    assert ema_model_names({"save_monodepth_ema": True}, {}) == (
        "depth", "pose", "pose_encoder", "encoder")
    assert ema_model_names({}, {}) is None


def test_asgd_matches_torch():
    # torch.optim.ASGD live-iterate parity (reference utils/optimizers.py:7-29
    # maps "asgd" to torch ASGD); the averaged iterate ax is never consumed by
    # the reference so only the live params must match.
    w0 = np.random.default_rng(4).standard_normal((6,)).astype(np.float32)
    g = np.random.default_rng(5).standard_normal((6,)).astype(np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.ASGD([tw], lr=0.05, lambd=1e-2, alpha=0.75,
                           weight_decay=0.001)
    for _ in range(6):
        tw.grad = torch.tensor(g)
        opt.step()

    params = {"depth": {"w": jnp.asarray(w0)}}
    grads = {"depth": {"w": jnp.asarray(g)}}
    cfg = {"optimizer": {"name": "asgd", "lr": 0.05, "lambd": 1e-2,
                         "alpha": 0.75, "weight_decay": 0.001},
           "lr_schedule": None}
    p = _run_jax_sgd(cfg, {}, params, grads, 6)
    np.testing.assert_allclose(np.asarray(p["depth"]["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_asgd_multi_group_with_schedule_matches_torch():
    """ASGD eta must track each param group's own scheduled lr (torch
    recomputes eta from group['lr'] every step) — covers backbone_lr plus a
    step_lr schedule, the combination the round-2 advisor flagged."""
    rng = np.random.default_rng(6)
    w_enc = rng.standard_normal((5,)).astype(np.float32)
    w_seg = rng.standard_normal((5,)).astype(np.float32)
    g_enc = rng.standard_normal((5,)).astype(np.float32)
    g_seg = rng.standard_normal((5,)).astype(np.float32)

    t_enc = torch.tensor(w_enc, requires_grad=True)
    t_seg = torch.tensor(w_seg, requires_grad=True)
    opt = torch.optim.ASGD(
        [{"params": [t_enc], "lr": 0.005}, {"params": [t_seg], "lr": 0.05}],
        lr=0.05, lambd=1e-2, alpha=0.75)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.5)
    for _ in range(6):
        t_enc.grad = torch.tensor(g_enc)
        t_seg.grad = torch.tensor(g_seg)
        opt.step()
        sched.step()

    params = {"encoder": {"w": jnp.asarray(w_enc)},
              "segmentation": {"w": jnp.asarray(w_seg)}}
    grads = {"encoder": {"w": jnp.asarray(g_enc)},
             "segmentation": {"w": jnp.asarray(g_seg)}}
    cfg = {"optimizer": {"name": "asgd", "lr": 0.05, "backbone_lr": 0.005,
                         "lambd": 1e-2, "alpha": 0.75},
           "lr_schedule": {"name": "step_lr", "step_size": 2, "gamma": 0.5}}
    p = _run_jax_sgd(cfg, {}, params, grads, 6)
    np.testing.assert_allclose(np.asarray(p["encoder"]["w"]),
                               t_enc.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["segmentation"]["w"]),
                               t_seg.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_plateau_lr_scale_composes_with_momentum_like_torch():
    """The trainer applies the plateau controller as a post-`tx.update`
    multiplier (train_steps.py lr_scale), NOT by rescaling optimizer state.
    That is exactly torch's ReduceLROnPlateau+SGD semantics: reducing lr
    scales future steps only, while the momentum buffer keeps accumulating
    raw gradients. Pin the COMBINED trajectory against torch driving a real
    ReduceLROnPlateau (reference train.py lr_scheduler usage)."""
    import optax

    rng = np.random.default_rng(7)
    w0 = rng.standard_normal((6,)).astype(np.float32)
    gs = [rng.standard_normal((6,)).astype(np.float32) for _ in range(8)]
    # metric plateaus after step 1 -> with patience=1 torch reduces lr at
    # the 3rd bad epoch; feed the same metric stream to both sides.
    metrics = [0.9, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([tw], lr=0.02, momentum=0.9, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=1)
    for g, m in zip(gs, metrics):
        tw.grad = torch.tensor(g)
        opt.step()
        sched.step(m)

    params = {"segmentation": {"w": jnp.asarray(w0)}}
    cfg = {"optimizer": {"name": "sgd", "lr": 0.02, "momentum": 0.9,
                         "weight_decay": 1e-4}, "lr_schedule": None}
    tx = build_optimizer(cfg, {}, params)
    state = tx.init(params)
    p = params
    # host-side plateau controller mirroring Trainer._plateau_step (mode=min)
    lr_scale, best, count, patience, factor = 1.0, float("inf"), 0, 1, 0.1
    for g, m in zip(gs, metrics):
        grads = {"segmentation": {"w": jnp.asarray(g)}}
        updates, state = tx.update(grads, state, p)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        p = optax.apply_updates(p, updates)
        if m < best:
            best, count = m, 0
        else:
            count += 1
            if count > patience:
                lr_scale, count = lr_scale * factor, 0

    np.testing.assert_allclose(np.asarray(p["segmentation"]["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
