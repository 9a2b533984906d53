"""Experiment generator + runner + label-selection integration tests."""

import os

import numpy as np
import pytest
import yaml

from improving_segmentation_with_selfsupervised_depth_tpu.config.experiments import (
    generate_experiment_cfgs,
)
from improving_segmentation_with_selfsupervised_depth_tpu.config.grid import (
    expand_grid,
    grid_search,
)

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "cityscapes_joint.yml")


@pytest.fixture(scope="module")
def base_cfg():
    with open(CFG_PATH) as fp:
        return yaml.safe_load(fp)


def test_expand_grid_product():
    cfg = {"a": grid_search([1, 2]), "b": {"c": grid_search(["x", "y"])}, "d": 3}
    out = expand_grid(cfg)
    assert len(out) == 4
    assert {(c["a"], c["b"]["c"]) for c in out} == {(1, "x"), (1, "y"), (2, "x"), (2, "y")}
    assert all(c["d"] == 3 for c in out)


def test_generate_exp210_cfgs(base_cfg):
    cfgs = generate_experiment_cfgs(base_cfg, 210)
    # 4 non-preselected variants (the preselected one needs stored tables)
    # preselected variant raises without tables -> generator may include it only
    # if tables exist; at minimum the 4 standard variants must be present
    names = [c["model"]["variant"] for c in cfgs]
    assert "scratch" in names and "transfer" in names
    assert any("classmix" in n for n in names)
    assert any("dcompgt" in n for n in names)
    tr = next(c for c in cfgs if c["model"]["variant"] == "transfer")
    assert tr["model"]["depth_pretraining"].startswith("mono_cityscapes")
    assert tr["training"]["optimizer"]["lr"] == 1e-2
    assert tr["training"]["optimizer"]["backbone_lr"] == 1e-3
    assert tr["training"]["clip_grad_norm"] == 10
    assert tr["data"]["restrict_to_subset"]["n_subset"] == 372
    assert tr["training"]["train_iters"] == 40000
    assert tr["training"]["lr_schedule"]["step_size"] == 30000
    dc = next(c for c in cfgs if "dcompgt" in c["model"]["variant"]
              and "sel" not in c["model"]["variant"])
    u = dc["training"]["unlabeled_segmentation"]
    assert u["mix_mask"] == "depthcomp" and u["mix_use_gt"]
    assert u["depthcomp_margin"] == 0.03


def test_generate_exp211_cfgs(base_cfg):
    cfgs = generate_experiment_cfgs(base_cfg, 211)
    assert len(cfgs) == 3  # three seeds
    c = cfgs[0]
    assert c["main"] == "label_selection"
    ls = c["label_selection"]
    assert ls["choice"] == "ifp"
    assert ls["label_steps"] == [25, 50, 100, 200, 372, 744]
    assert ls["bias_weight"] == 1000
    assert ls["depth_error_types"] == "abs_log"
    assert c["model"]["backbone_name"] == "resnet50"
    assert c["training"]["pseudo_depth_lambda"] == 1
    assert c["data"]["depth_teacher"].startswith("mono_cityscapes")
    assert c["model"]["depth_args"]["batch_norm"] is True  # dec 9


def test_generate_exp212_cfgs(base_cfg):
    cfgs = generate_experiment_cfgs(base_cfg, 212)
    c = cfgs[0]
    assert c["model"]["segmentation_name"] == "mtl_pad"
    assert c["model"]["segmentation_args"]["distillation_layer"] == 7
    assert c["training"]["unlabeled_segmentation"]["depthmix_online_depth"]
    assert c["training"]["optimizer"]["pose_lr"] == 1e-6


def _synth_base(tmp_path):
    return {
        "seed": 42,
        "model": {
            "arch": "joint_segmentation_depth",
            "backbone_name": "resnet18",
            "segmentation_name": "joint_seg_depth_dec",
            "segmentation_args": {"layers": [8], "head_inter": True, "output_stride": 2},
            "depth_args": {},
            "disable_monodepth": False,
            "disable_pose": True,
            "backbone_pretraining": "none",
            "depth_pretraining": "none",
        },
        "monodepth_options": {"frame_ids": [0, -1, 1], "num_scales": 1,
                              "height": 64, "width": 96},
        "data": {"dataset": "synthetic", "n_samples": 8, "img_size": (64, 96),
                 "n_workers": 2, "augmentations": {}},
        "training": {
            "log_path": str(tmp_path / "ls"),
            "train_iters": 2, "batch_size": 2, "val_batch_size": 2,
            "print_interval": 1, "val_interval": {"0": 1},
            "optimizer": {"name": "adam", "lr": 1e-4},
            "lr_schedule": {"name": "poly_lr_2", "power": 0.9, "max_iter": 2},
            "segmentation_lambda": 1.0, "monodepth_lambda": 0.0,
            "pseudo_depth_lambda": 1.0, "save_model": True,
            "monodepth_loss": {"min_depth": 0.1, "max_depth": 100,
                               "test_min_depth": 1e-3, "test_max_depth": 80,
                               "disparity_smoothness": 1e-3},
        },
        "label_selection": {
            "choice": "ifp",
            "label_steps": [2, 4],
            "train_iters": [2, 2],
            "train_from_scratch": True,
            "last_from_scratch": True,
            "selection_tasks": "depth",
            "last_segmentation_only": True,
            "last_depth_only": False,
            "initial_samples": "random",
            "preselection_multiplier": None,
            "depth_ifp_weight": 1,
            "bias_weight": 0,
            "ifp_args": {"p": 2, "pool": "avg", "h": 2, "m": "logdepth", "norm": True},
            "depth_lambda": 1,
            "entropy_lambda": 0,
            "depth_error_types": "abs_log",
            "remove_models": True,
        },
    }


def test_label_selection_end_to_end_synthetic(tmp_path):
    cfg = _synth_base(tmp_path)
    from improving_segmentation_with_selfsupervised_depth_tpu.label_selection import (
        label_selection_main,
    )

    label_selection_main(cfg)
    # subset jsons were written per round
    base = cfg["training"]["log_path"]
    found = []
    for root, _, files in os.walk(os.path.dirname(base)):
        found.extend(f for f in files if f.endswith("_subset.json"))
    assert any("nlabels2" in f for f in found)
    assert any("nlabels4" in f for f in found)


def test_ifp_scoring_functions():
    from improving_segmentation_with_selfsupervised_depth_tpu.label_selection.scoring import (
        calc_feature_distance,
        iterative_farthest_point,
    )

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((6, 2, 4, 3)).astype(np.float32)
    dist = calc_feature_distance(feats, None, 0, p=2, normalize_features=True)
    assert dist.shape == (6, 6)
    assert np.allclose(np.diag(dist), 0)
    assert np.all(dist >= 0)
    fd = {"distances": dist,
          "dist_i_to_img_idx": {i: i * 10 for i in range(6)},
          "img_idx_to_dist_i": {i * 10: i for i in range(6)}}
    new, dists = iterative_farthest_point([0], fd, 3)
    assert len(new) == 3 and len(set(new)) == 3
    assert all(n % 10 == 0 for n in new)
    # greedy max-min: first pick is the sample farthest from idx 0
    assert new[0] == int(np.argmax(dist[0])) * 10
