"""AOT serving export: serialize the pose-free forward, reload, run, parity."""

import numpy as np

import jax
import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.export import (
    export_inference,
    load_exported,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model

MODEL_CFG = {
    "backbone_name": "resnet18",
    "segmentation_name": "joint_seg_depth_dec",
    "segmentation_args": {"layers": [9]},
    "depth_args": {"intermediate_aspp": True, "aspp_rates": [1, 2]},
    "disable_pose": True,
    "frame_ids": [0, -1, 1],
    "num_scales": 4,
}


def test_export_roundtrip(tmp_path):
    H = W = 64
    model = build_model(MODEL_CFG, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(1, H, W, frame_ids=(0, -1, 1),
                                  num_scales=4).items()}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, batch)

    data = export_inference(model, variables, H, W, batch_size=1)
    path = tmp_path / "model.hlo"
    path.write_bytes(data)

    serve = load_exported(str(path))
    img = batch["color_aug_0_0"]
    out = serve(img)
    assert set(out) >= {"semantics", "disp_0"}
    ref = model.apply(variables, {"color_aug_0_0": img}, train=False,
                      use_pose=False)
    np.testing.assert_allclose(np.asarray(out["semantics"]),
                               np.asarray(ref["semantics"]),
                               rtol=1e-3, atol=1e-3)  # jit reassociation noise
    np.testing.assert_allclose(np.asarray(out["disp_0"]),
                               np.asarray(ref["disp_0"]), atol=1e-4)


def test_export_cli_end_to_end(tmp_path):
    """Drive cli/export_cli.py against a hand-built run dir (cfg.yml +
    best_model.msgpack) and reload the artifact."""
    import optax
    import yaml

    from improving_segmentation_with_selfsupervised_depth_tpu.cli import export_cli
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.checkpoints import (
        save_resume,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
        create_train_state,
    )

    H = W = 64
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    cfg = {"model": dict(MODEL_CFG), "data": {"n_classes": 19},
           "training": {}, "machine": "ws"}
    with open(run_dir / "cfg.yml", "w") as f:
        yaml.safe_dump(cfg, f)

    model = build_model(MODEL_CFG, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(1, H, W, frame_ids=(0, -1, 1),
                                  num_scales=4).items()}
    state = create_train_state(model, jax.random.PRNGKey(1), batch,
                               optax.identity())
    save_resume(str(run_dir), state, 0.0)

    out_path = tmp_path / "model.hlo"
    export_cli.main(["--model", str(run_dir), "--out", str(out_path),
                     "--height", str(H), "--width", str(W)])
    serve = load_exported(str(out_path))
    out = serve(jnp.zeros((1, H, W, 3), jnp.float32))
    assert out["semantics"].shape == (1, H, W, 19)


def test_export_symbolic_batch(tmp_path):
    """batch_size=None bakes a symbolic batch dim: one artifact serves
    any batch size."""
    H = W = 64
    model = build_model(MODEL_CFG, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(1, H, W, frame_ids=(0, -1, 1),
                                  num_scales=4).items()}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, batch)
    data = export_inference(model, variables, H, W, batch_size=None)
    serve = load_exported(data)
    for n in (1, 3):
        out = serve(jnp.zeros((n, H, W, 3), jnp.float32))
        assert out["semantics"].shape == (n, H, W, 19)
