"""Training-dynamics parity: N optimizer steps in torch vs this framework.

Per-op and full-model logits parity are pinned elsewhere
(tests/test_torch_interop.py, tests/test_full_model_interop.py); this file
guards what those cannot: the *interaction* of optimizer (SGD momentum +
coupled weight decay + per-group lr), train-mode BatchNorm (batch stats in
the forward, running-stat EMA with torch momentum 0.1), the CE loss with
ignore_index, and the mean-teacher EMA ramp — i.e. the training dynamics
the reference runs in train.py:442-549 — by training the SAME initial
weights on the SAME data stream in both frameworks and pinning the loss
trajectories against each other.

Tolerance justification: both sides run f32 on CPU, so single-step
differences come only from op-order rounding (~1e-6 relative). Training on
a fixed 2-batch cycle amplifies rounding through the recurrence
(params -> grads -> params), and empirically the trajectories stay within
~1e-4 absolute for tens of steps, drifting to O(1e-3) by step 120 — still
two orders of magnitude below any per-step loss *change* (the descent moves
~5e-3/step here). The bands below (5e-4 early / 2e-2 late / 5e-3 on the
trailing mean) fail on any semantic mismatch: wrong weight-decay coupling
(torch couples L2 into the grad BEFORE momentum) shifts the trajectory by
>0.1 within 50 steps, a BN-momentum mismatch (0.9 vs 0.1 convention) by
>0.05, and a missing per-group backbone lr by >0.2.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.engine.full_model_interop import (
    convert_full_model,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import (
    build_optimizer,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
    TrainState,
    init_ema_params,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
    StepConfig,
    make_train_step,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model

from tests.test_full_model_interop import _decoder_modules
from tests.test_torch_interop import TBasic, TResNet

N_STEPS = 120
LR, BACKBONE_LR, MOMENTUM, WD = 1e-2, 1e-3, 0.9, 5e-4
EMA_ALPHA = 0.99
H, W, BS, NCLS = 64, 96, 2, 19
IGNORE = 250


class _TorchJoint(nn.Module):
    """Reference-layout seg-only joint model (encoder + unet decoder +
    project/head/classifier), the same wiring test_full_model_interop pins
    for logits parity — here run in TRAIN mode."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(7)
        self.enc = TResNet(TBasic, (2, 2, 2, 2))
        self.unet_mods, self.unet_fwd = _decoder_modules(seed=9)
        torch.manual_seed(10)
        self.project = nn.Conv2d(16, 64, 1, bias=False)
        self.head_conv = nn.Conv2d(64, 64, 3, 1, 1, bias=False)
        self.head_bn = nn.BatchNorm2d(64)
        self.classifier = nn.Conv2d(64, NCLS, 1)

    def forward(self, x):
        feats = self.enc(x)
        _, unet_outs = self.unet_fwd(feats)
        h = torch.relu(self.head_bn(self.head_conv(self.project(unet_outs[0]))))
        return self.classifier(h)

    def state_dict_reference_layout(self):
        sd = {}
        sd.update({f"models.encoder.encoder.{k}": v
                   for k, v in self.enc.state_dict().items()})
        sd.update({f"models.segmentation.unet_dec.decoder.{n}.{k}": v
                   for n, m in enumerate(self.unet_mods)
                   for k, v in m.state_dict().items()})
        sd["models.segmentation.project.seg9.0.weight"] = self.project.weight.data
        sd["models.segmentation.head.1.weight"] = self.head_conv.weight.data
        sd.update({f"models.segmentation.head.2.{k}": v
                   for k, v in self.head_bn.state_dict().items()
                   if "num_batches" not in k})
        sd["models.segmentation.head.5.weight"] = self.classifier.weight.data
        sd["models.segmentation.head.5.bias"] = self.classifier.bias.data
        return sd


def _data_cycle():
    rng = np.random.default_rng(3)
    batches = []
    for _ in range(2):
        img = rng.uniform(0, 1, (BS, 3, H, W)).astype(np.float32)
        lbl = rng.integers(0, NCLS, (BS, H, W)).astype(np.int64)
        lbl[rng.uniform(size=lbl.shape) < 0.1] = IGNORE  # ignore_index pixels
        batches.append((img, lbl))
    return batches


def _ema_summary(tree_abs_sums):
    """Layout-invariant scalar per top-level module: sum|x| is unchanged by
    the OIHW<->HWIO transposes the conversion applies."""
    return {k: float(v) for k, v in tree_abs_sums.items()}


def _torch_run(model, batches):
    model.train()
    enc_params = list(model.enc.parameters())
    enc_ids = {id(p) for p in enc_params}
    rest = [p for p in model.parameters() if id(p) not in enc_ids]
    opt = torch.optim.SGD(
        [{"params": enc_params, "lr": BACKBONE_LR},
         {"params": rest, "lr": LR}],
        momentum=MOMENTUM, weight_decay=WD)
    ema = {n: p.detach().clone() for n, p in model.named_parameters()}
    losses = []
    for step in range(N_STEPS):
        img, lbl = batches[step % len(batches)]
        logits = model(torch.from_numpy(img))
        loss = F.cross_entropy(logits, torch.from_numpy(lbl),
                               ignore_index=IGNORE)
        opt.zero_grad()
        loss.backward()
        opt.step()
        # mean-teacher EMA ramp (reference train.py:346-358), applied to the
        # post-step params like engine/train_steps.py does
        alpha = min(1.0 - 1.0 / (step + 1.0), EMA_ALPHA)
        with torch.no_grad():
            for n, p in model.named_parameters():
                ema[n].mul_(alpha).add_(p, alpha=1.0 - alpha)
        losses.append(float(loss))
    ema_sums = {}
    for n, t in ema.items():
        top = ("encoder" if n.startswith("enc.") else "segmentation")
        ema_sums[top] = ema_sums.get(top, 0.0) + float(t.abs().sum())
    return np.asarray(losses), ema_sums


def _jax_run(tmodel, batches):
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9], "head_inter": True,
                              "output_stride": 1, "head_dropout": 0.0},
        "depth_args": {},
        "frame_ids": [0],
        "num_scales": 4,
        "disable_pose": True,
        "disable_monodepth": True,
    }
    model = build_model(model_cfg, n_classes=NCLS)
    params, stats = convert_full_model(tmodel.state_dict_reference_layout(),
                                       model_cfg)
    training_cfg = {
        "optimizer": {"name": "sgd", "lr": LR, "backbone_lr": BACKBONE_LR,
                      "momentum": MOMENTUM, "weight_decay": WD},
        "lr_schedule": {"name": "multi_step", "milestones": [10 ** 6],
                        "gamma": 0.1},
    }
    tx = build_optimizer(training_cfg, model_cfg, params)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params),
                       ema_params=init_ema_params(params))
    cfg = StepConfig(segmentation_lambda=1.0, monodepth_lambda=0.0,
                     disable_monodepth=True, disable_pose=True,
                     frame_ids=(0,), use_ema=True, ema_alpha=EMA_ALPHA,
                     num_classes=NCLS)
    step_fn = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    jb = [{"color_aug_0_0": jnp.asarray(img.transpose(0, 2, 3, 1)),
           "lbl": jnp.asarray(lbl.astype(np.int32))} for img, lbl in batches]
    rng = jax.random.PRNGKey(0)  # dropout rate is 0: rng value is inert
    losses = []
    for step in range(N_STEPS):
        state, metrics = step_fn(state, jb[step % len(jb)], None, rng)
        losses.append(float(metrics["segmentation_loss"]))
    ema_sums = {
        k: float(sum(jnp.sum(jnp.abs(l))
                     for l in jax.tree_util.tree_leaves(v)))
        for k, v in state.ema_params.items()
    }
    return np.asarray(losses), ema_sums


def test_seg_supervised_training_dynamics_match_torch():
    batches = _data_cycle()
    tmodel = _TorchJoint()
    jax_losses, jax_ema = _jax_run(tmodel, batches)  # reads init BEFORE torch trains
    torch_losses, torch_ema = _torch_run(tmodel, batches)

    d = np.abs(jax_losses - torch_losses)
    # early trajectory: rounding only
    assert d[:20].max() < 5e-4, f"early divergence {d[:20].max():.2e}"
    # full trajectory: bounded accumulated drift
    assert d.max() < 2e-2, f"trajectory drift {d.max():.2e} at {d.argmax()}"
    # converged regime agrees in the mean
    assert abs(jax_losses[-10:].mean() - torch_losses[-10:].mean()) < 5e-3
    # training made progress in both (guards against comparing two broken
    # loops that both flatline)
    assert torch_losses[-1] < torch_losses[0] - 0.2
    # the EMA teacher trees agree through the whole ramp (layout-invariant
    # sum|x| per top-level module)
    for k in ("encoder", "segmentation"):
        np.testing.assert_allclose(jax_ema[k], torch_ema[k], rtol=1e-4,
                                   err_msg=f"ema[{k}]")
