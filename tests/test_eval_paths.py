"""Eval-step path coverage: pose-free depth validation (exp-211 shape) and
berhu-vs-pseudo-depth validation loss."""

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
    make_eval_step,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model


def test_eval_step_posefree_depth_and_berhu():
    """disable_pose + monodepth: eval uses predict_test_disp +
    generate_depth_test_pred (reference train.py:862-865) and the
    pseudo-depth berhu (870-878)."""
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [8], "head_inter": True, "output_stride": 2},
        "depth_args": {},
        "disable_monodepth": False,
        "disable_pose": True,
        "frame_ids": [0],
        "num_scales": 1,
    }
    model = build_model(model_cfg, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(2, 64, 96, frame_ids=(0,), num_scales=1).items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch)
    tx = build_optimizer({"optimizer": {"name": "adam", "lr": 1e-4},
                          "lr_schedule": None}, model_cfg, params["params"])
    state = create_train_state(model, rng, batch, tx)
    cfg = StepConfig(
        segmentation_lambda=1.0, monodepth_lambda=0.0, pseudo_depth_lambda=1.0,
        disable_monodepth=False, disable_pose=True,
        frame_ids=(0,), scales=(0,), has_depth_teacher=True,
        test_min_depth=1e-3, test_max_depth=80.0,
    )
    ev = jax.jit(make_eval_step(model, cfg))
    metrics, conf, aux = ev(state, batch, rng)
    assert float(metrics["monodepth_loss"]) == 0.0  # pose-free: no photometric
    assert np.isfinite(float(metrics["pseudo_depth_loss"]))
    assert float(metrics["pseudo_depth_loss"]) > 0.0
    assert np.isfinite(float(metrics["segmentation_loss"]))
    assert "disp_0" in aux
    assert conf.shape == (19, 19)

    # depth eval metrics are wired into validation (the reference declares the
    # names at loss/monodepth_loss.py:35-36 but never computes them)
    names = ("abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3")
    for n in names:
        assert np.isfinite(float(metrics[f"depth/{n}"])), n
    assert 0.0 <= float(metrics["depth/a1"]) <= 1.0

    # a perfect prediction scores zero error: feed the model's own depth
    # back as depth_gt
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.geometry import (
        disp_to_depth,
    )

    _, pred_depth = disp_to_depth(
        jnp.asarray(aux["disp_0"], jnp.float32), 1e-3, 80.0)
    batch_gt = dict(batch)
    batch_gt["depth_gt"] = pred_depth
    metrics2, _, _ = ev(state, batch_gt, rng)
    assert float(metrics2["depth/abs_rel"]) < 1e-5
    assert float(metrics2["depth/a1"]) > 0.999
