"""Label-selection driver: the iterative annotate-train loop.

Re-design of reference label_selection.py:26-337 for the functional stack: a
fresh Trainer (model/optimizer state) is built per round from the mutated
config; the training step stays pure, no object surgery.
"""

from __future__ import annotations

import json
import os
from copy import deepcopy
from datetime import datetime
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..config import MachineConfig, expand_cfg_vars
from ..engine.depth_estimator import decoder_variant
from ..engine.trainer import Trainer
from ..models import build_model
from ..engine.checkpoints import apply_pretraining
from ..ops.losses import pixel_wise_entropy
from ..ops.photometric import key_of
from ..utils import np_local_seed
from .scoring import (
    calc_feature_distance,
    extract_depth_features,
    iterative_farthest_point,
    masked_depth_error,
)


def get_n_total(cfg) -> int:
    """reference label_selection.py:651-659 (+ synthetic for tests)."""
    dataset = cfg["data"]["dataset"]
    if dataset == "synthetic":
        return cfg["data"].get("n_samples", 16)
    return {"cityscapes": 2975, "camvid": 367, "mapillary": 18000}[dataset]


def _build_trainer(cfg, experiment_name: str) -> Trainer:
    """reference build_trainer (148-173): per-round Trainer with its own
    log subdir."""
    cfg = deepcopy(cfg)
    run_id = experiment_name + "_" + datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    base_log_dir = cfg["training"]["log_path"]
    log_dir = os.path.join(base_log_dir, experiment_name)
    os.makedirs(log_dir, exist_ok=True)
    cfg["training"]["log_path"] = log_dir
    with open(os.path.join(log_dir, "cfg.yml"), "w") as fp:
        yaml.safe_dump(cfg, fp)
    return Trainer(cfg, run_id=run_id)


def build_depth_teacher(cfg):
    """Frozen SDE depth model for diversity features (reference 317-337).
    Returns (model, variables) or None when no teacher is configured."""
    cfg = deepcopy(cfg)
    cfg["model"]["arch"] = "joint_segmentation_depth"
    cfg["model"].update(cfg.get("monodepth_options", {}))
    cfg["model"]["segmentation_name"] = None
    cfg["model"]["disable_monodepth"] = False
    cfg["model"]["disable_pose"] = True
    if cfg["data"].get("depth_teacher") is not None:
        cfg["model"]["backbone_name"] = "resnet101"
        cfg, _ = decoder_variant(cfg, 6, (512, 512))
        cfg["model"]["depth_pretraining"] = cfg["data"]["depth_teacher"]
        cfg["model"]["backbone_pretraining"] = cfg["data"]["depth_teacher"]

    model = build_model(cfg["model"], cfg["data"].get("n_classes", 19))
    return model, cfg


def acquire_scores(base_cfg, samples_to_score, all_samples, model_file,
                   depth_ifp_w: float = 0, verbose: bool = False):
    """Score candidate samples (reference acquire_scores, 347-571).

    Returns (scores, feature_distances_dict)."""
    calc_depth_distances = depth_ifp_w > 0
    ls = base_cfg["label_selection"]
    depth_lambda = ls["depth_lambda"]
    entropy_lambda = ls["entropy_lambda"]
    dist_bias_weight = ls["bias_weight"]
    ifp_args = ls["ifp_args"]
    error_types = ls.get("depth_error_types", "abs")
    if not isinstance(error_types, list):
        error_types = [error_types]

    cfg = deepcopy(base_cfg)
    cfg["data"]["augmentations"] = {}
    cfg.get("monodepth_options", {}).pop("crop_h", None)
    cfg.get("monodepth_options", {}).pop("crop_w", None)
    cfg["data"].pop("crop_h", None)
    cfg["data"].pop("crop_w", None)
    cfg["training"]["batch_size"] = 1
    cfg["training"]["val_batch_size"] = 1
    restrict = all_samples if calc_depth_distances else samples_to_score
    cfg["data"]["restrict_to_subset"] = {
        "mode": "fixed", "n_subset": len(restrict), "subset": list(restrict)}
    cfg["training"]["resume"] = None  # model-only load below
    cfg["training"]["unlabeled_segmentation"] = None

    trainer = _build_trainer(cfg, "label_selection_scoring")
    if model_file is not None:
        from ..engine.checkpoints import load_resume as _load

        trainer.state, _, _ = _load(model_file, trainer.state, load_model_only=True)
    samples_set = set(int(s) for s in samples_to_score)

    teacher_model = None
    teacher_vars = None
    needs_teacher = calc_depth_distances and ifp_args.get("m") in ("aspp", "u4", "u3", "bn")

    model = trainer.model
    state = trainer.state

    @jax.jit
    def score_step(variables, batch):
        outputs = model.apply(variables, batch, train=False)
        out = {}
        if "semantics" in outputs:
            ent = pixel_wise_entropy(outputs["semantics"])
            out["entropy_map"] = ent[0]
            out["entropy_mean"] = jnp.mean(ent[0])
        disp_pred = outputs["disp_0"][0, :, :, 0]
        disp_pseudo = batch["pseudo_depth"][0, :, :, 0]
        maps, errs = [], []
        for et in error_types:
            m, e = masked_depth_error(disp_pred, disp_pseudo, et)
            maps.append(m)
            errs.append(e)
        out["depth_error_maps"] = jnp.stack(maps)
        out["depth_errors"] = jnp.stack(errs)
        out["disp_pred"] = disp_pred
        return out

    scores: List[Dict[str, Any]] = []
    all_depth_features: List[np.ndarray] = []
    dist_i_to_img_idx: Dict[int, int] = {}
    img_idx_to_dist_i: Dict[int, int] = {}
    dist_bias: List[float] = []

    teacher_step = None
    if needs_teacher:
        teacher_model, teacher_cfg = build_depth_teacher(cfg)

        def make_teacher_step(tm):
            @jax.jit
            def tstep(variables, batch):
                return tm.apply(variables, batch, train=False)
            return tstep

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    for batch in trainer.train_loader_sequential():
        b = {k: jnp.asarray(v) for k, v in batch.items() if k != "filename"}
        idx = int(np.asarray(batch["idx"])[0])

        if calc_depth_distances:
            if needs_teacher and teacher_vars is None:
                rng = jax.random.PRNGKey(0)
                tvars = teacher_model.init({"params": rng, "dropout": rng}, b)
                tparams, tbs = tvars["params"], tvars.get("batch_stats", {})
                tparams, tbs = apply_pretraining(
                    teacher_cfg["model"], tparams, tbs,
                    getattr(MachineConfig, "DOWNLOAD_MODEL_DIR", None))
                teacher_vars = {"params": tparams, "batch_stats": tbs}
                teacher_step = make_teacher_step(teacher_model)
            t_out = teacher_step(teacher_vars, b) if needs_teacher else None
            feats = extract_depth_features(
                t_out if t_out is not None else {},
                b.get("pseudo_depth"), ifp_args)
            dist_i_to_img_idx[len(all_depth_features)] = idx
            img_idx_to_dist_i[idx] = len(all_depth_features)
            all_depth_features.append(np.asarray(feats[0]))
            if not verbose and dist_bias_weight == 0:
                scores.append({"idx": idx, "label_criterion": [0],
                               "depth_error": [0], "entropy_mean": 0})
                continue

        if idx not in samples_set:
            dist_bias.append(0.0)
            continue

        out = score_step(variables, b)
        depth_errors = [float(e) for e in np.asarray(out["depth_errors"])]
        entropy_mean = float(out.get("entropy_mean", 0.0))

        if isinstance(depth_lambda, list):
            label_criterion = [dl * depth_errors[0] + el * entropy_mean
                               for dl, el in zip(depth_lambda, entropy_lambda)]
        elif len(error_types) > 1:
            label_criterion = [depth_lambda * de + entropy_lambda * entropy_mean
                               for de in depth_errors]
        else:
            label_criterion = [depth_lambda * depth_errors[0]
                               + entropy_lambda * entropy_mean]
        if dist_bias_weight > 0:
            assert len(label_criterion) == 1
            dist_bias.append(dist_bias_weight * label_criterion[0])

        rec = {
            "idx": idx,
            "label_criterion": label_criterion,
            "depth_error": depth_errors,
            "entropy_mean": entropy_mean,
        }
        if verbose:
            rec.update({
                "image": np.asarray(b[key_of("color_aug", 0, 0)][0]),
                "segmentation_entropy": np.asarray(out.get("entropy_map", 0)),
                "disparity": np.log(np.clip(1 / np.asarray(out["disp_pred"]), 0.1, 80)),
                "teacher_depth": np.log(np.clip(
                    1 / np.asarray(b["pseudo_depth"][0, :, :, 0]), 0.1, 80)),
                "depth_error_map": np.asarray(out["depth_error_maps"]),
                "segmentation_gt": np.asarray(batch.get("lbl", [0]))[0],
            })
        scores.append(rec)

    feature_distances = 0
    if calc_depth_distances:
        feats = np.stack(all_depth_features)
        bias = np.asarray(dist_bias, np.float32) if dist_bias_weight > 0 else None
        feature_distances = depth_ifp_w * calc_feature_distance(
            feats, bias, dist_bias_weight, p=ifp_args.get("p", 2),
            normalize_features=ifp_args.get("norm", False),
            patch_wise=ifp_args.get("pw", False))

    return scores, {"distances": feature_distances,
                    "dist_i_to_img_idx": dist_i_to_img_idx,
                    "img_idx_to_dist_i": img_idx_to_dist_i}


def choose_samples_from_scores(scores, n_to_add):
    """Top-k by combined score, round-robin over criteria when several
    (reference 196-221)."""
    if len(scores[0]["label_criterion"]) > 1:
        n_criteria = len(scores[0]["label_criterion"])
        n_per = n_to_add // n_criteria
        assert n_criteria * n_per == n_to_add
        chosen, chosen_scores = [], []
        for i in range(n_criteria):
            for s in sorted(scores, key=lambda k: k["label_criterion"][i], reverse=True):
                if s["idx"] not in chosen:
                    s = dict(s)
                    s["used_label_criterion"] = f"C{i}_{s['label_criterion'][i]:.4f}"
                    chosen.append(s["idx"])
                    chosen_scores.append(s)
                if len(chosen) >= (i + 1) * n_per:
                    break
        return chosen, chosen_scores
    ranked = sorted(scores, key=lambda k: k["label_criterion"][0], reverse=True)
    chosen_scores = [dict(s) for s in ranked[:n_to_add]]
    for s in chosen_scores:
        s["used_label_criterion"] = f"{s['label_criterion'][0]:.4f}"
    return [s["idx"] for s in chosen_scores], chosen_scores


def choose_samples_from_ifp(initial_samples, scores, feature_distances, n_to_add,
                            preselection_multiplier):
    """IFP with optional top-score preselection (reference 224-252)."""
    assert len(scores[0]["label_criterion"]) == 1
    preselected = None
    if preselection_multiplier is not None:
        assert preselection_multiplier > 0
        ranked = sorted(scores, key=lambda k: k["label_criterion"][0], reverse=True)
        preselected = [s["idx"] for s in ranked[: int(preselection_multiplier * n_to_add)]]
    idxs, dists = iterative_farthest_point(initial_samples, feature_distances,
                                           n_to_add, preselected)
    chosen, chosen_scores = [], []
    by_idx = {s["idx"]: s for s in scores}
    for i, dist in zip(idxs, dists):
        if preselected is not None:
            assert i in preselected
        s = dict(by_idx[i])
        s.update({"label_criterion": dist, "used_label_criterion": f"{dist:.4f}",
                  "iterative_farthest_distance": dist})
        chosen.append(i)
        chosen_scores.append(s)
    assert len(chosen_scores) == n_to_add
    return chosen, chosen_scores


def choose_initial_samples(cfg, n, mode):
    """reference 176-193."""
    if mode == "random":
        with np_local_seed(cfg["seed"]):
            p = np.random.permutation(get_n_total(cfg))
        return p[:n].tolist()
    if mode == "ifp":
        with np_local_seed(cfg["seed"]):
            p = np.random.permutation(get_n_total(cfg))
        seed_sample = p[:1].tolist()
        ifp_cfg = deepcopy(cfg)
        ifp_cfg["label_selection"].update(
            {"preselection_multiplier": None, "bias_weight": 0})
        return choose_new_samples(ifp_cfg, None, seed_sample, n, "ifp", debug=False)
    raise NotImplementedError(mode)


def choose_new_samples(cfg, model_file, current_samples, n_new_subset, choice,
                       debug: bool = False):
    """reference 255-314 (debug panel dumping optional)."""
    n_to_add = n_new_subset - len(current_samples)
    assert n_to_add > 0
    n_all = cfg["label_selection"].get("n_random_choice_all", get_n_total(cfg))
    preselection_multiplier = cfg["label_selection"]["preselection_multiplier"]
    with np_local_seed(cfg["seed"]):
        all_samples = np.random.permutation(np.arange(get_n_total(cfg)))[:n_all].tolist()
    unlabeled = [v for v in all_samples if v not in current_samples]

    if choice == "ifp":
        scores, feat_dists = acquire_scores(
            cfg, unlabeled, all_samples, model_file,
            depth_ifp_w=cfg["label_selection"]["depth_ifp_weight"])
        if preselection_multiplier is not None:
            assert sum(v for k, v in cfg["label_selection"].items()
                       if "lambda" in k) != 0
        chosen, _ = choose_samples_from_ifp(current_samples, scores, feat_dists,
                                            n_to_add, preselection_multiplier)
    elif choice == "score":
        lambdas = sum(v for k, v in cfg["label_selection"].items()
                      if "lambda" in k and not isinstance(v, list))
        if not isinstance(cfg["label_selection"]["entropy_lambda"], list) and lambdas == 0:
            chosen = unlabeled[:n_to_add]
        else:
            scores, _ = acquire_scores(cfg, unlabeled, all_samples, model_file)
            chosen, _ = choose_samples_from_scores(scores, n_to_add)
    else:
        raise NotImplementedError(choice)

    new_subset = list(current_samples) + list(chosen)
    assert len(new_subset) == n_new_subset
    assert len(new_subset) == len(set(new_subset)), "Subset contains duplicates"
    if debug:
        _dump_debug_panels(cfg, chosen, all_samples, model_file, n_new_subset)
    return new_subset


def _dump_debug_panels(cfg, chosen, all_samples, model_file, n_new_subset):
    """3x3 matplotlib panels of the newly chosen samples (reference 288-312)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except Exception:
        return
    logs, _ = acquire_scores(cfg, chosen, all_samples, model_file, verbose=True)
    log_dir = os.path.join(cfg["training"]["log_path"], f"new_labels_{n_new_subset}")
    os.makedirs(log_dir, exist_ok=True)
    from ..data.cityscapes import decode_segmap_tocolor

    for i, log in enumerate(logs):
        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        axs[0][0].imshow(log["image"])
        axs[0][1].imshow(log["disparity"], cmap="plasma_r")
        axs[0][2].imshow(log["teacher_depth"], cmap="plasma_r")
        axs[1][0].imshow(log["depth_error_map"][0], cmap="plasma")
        if np.ndim(log.get("segmentation_entropy", 0)):
            axs[1][1].imshow(log["segmentation_entropy"], cmap="viridis")
        if np.ndim(log.get("segmentation_gt", 0)):
            axs[1][2].imshow(decode_segmap_tocolor(log["segmentation_gt"]))
        for ax in axs.flat:
            ax.axis("off")
        plt.savefig(os.path.join(log_dir, f"new_label_{i}.jpg"))
        plt.close(fig)


def train_on_subset(base_cfg, labeled_samples, train_iters, model_file=None):
    """Train a fresh model on a fixed subset, save its checkpoint
    (reference 119-142)."""
    base_log_dir = base_cfg["training"]["log_path"]
    cfg = deepcopy(base_cfg)
    cfg["data"]["restrict_to_subset"] = {
        "mode": "fixed", "n_subset": len(labeled_samples),
        "subset": [int(s) for s in labeled_samples]}
    cfg["training"]["train_iters"] = int(train_iters)
    if cfg["training"].get("lr_schedule") and "max_iter" in cfg["training"]["lr_schedule"]:
        cfg["training"]["lr_schedule"]["max_iter"] = int(train_iters)
    if model_file is not None:
        cfg["training"]["resume"] = model_file
    cfg["training"]["save_model"] = True

    experiment_name = f"nlabels{len(labeled_samples)}"
    with open(os.path.join(base_log_dir, f"{experiment_name}_subset.json"), "w") as fp:
        json.dump([int(s) for s in labeled_samples], fp)
    trainer = _build_trainer(cfg, experiment_name)
    last_step = trainer.train()
    return trainer.save_resume(last_step)


def label_selection_main(cfg: Dict[str, Any]) -> None:
    """reference label_selection_main (26-116)."""
    MachineConfig(cfg.get("machine", "ws"))
    run_id = datetime.now().strftime("%Y-%m-%d_%H-%M-%S-%f")
    cfg.setdefault("name", "test" + run_id)
    expand_cfg_vars(cfg)
    cfg["training"]["log_path"] = os.path.join(
        cfg["training"]["log_path"], cfg["name"])
    log_dir = cfg["training"]["log_path"]
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "cfg.yml"), "w") as fp:
        yaml.safe_dump(cfg, fp)

    ls = cfg["label_selection"]
    remove_models = ls.get("remove_models", True)
    train_from_scratch = ls["train_from_scratch"]
    last_from_scratch = ls.get("last_from_scratch", train_from_scratch)
    label_steps = list(ls["label_steps"])
    iters_per_step = [int(v) for v in ls["train_iters"]]
    tasks = ls["selection_tasks"]
    choice = ls["choice"]
    initial = ls["initial_samples"]
    assert choice in ("score", "ifp", "random")
    assert initial in ("random", "ifp")
    assert tasks in ("depth", "seg", "seg+depth")

    if train_from_scratch:
        iters_until_step = iters_per_step
    else:
        iters_until_step = [sum(iters_per_step[: i + 1]) for i in range(len(iters_per_step))]
    if choice in ("ifp", "random"):
        assert last_from_scratch or train_from_scratch
        if sum(v for k, v in ls.items() if "lambda" in k) == 0:
            label_steps = [label_steps[-1]]
            iters_until_step = [iters_until_step[-1]]

    resume_step, resume_file = ls.get("resume", (-1, ""))
    assert len(label_steps) == len(iters_until_step)

    model_file = None
    labeled_samples: List[int] = []
    if resume_file:
        model_file = resume_file
        with open(f"{os.path.dirname(resume_file)}_subset.json") as fp:
            labeled_samples = json.load(fp)

    for i, (n_new_subset, train_iters) in enumerate(zip(label_steps, iters_until_step)):
        is_last = i == len(label_steps) - 1
        if i < resume_step:
            continue
        if i == 0:
            labeled_samples = choose_initial_samples(cfg, n_new_subset, mode=initial)
        else:
            labeled_samples = choose_new_samples(cfg, model_file, labeled_samples,
                                                 n_new_subset, choice)
        if train_iters == 0:
            continue
        current = deepcopy(cfg)
        old_model_file = model_file
        model_to_continue = old_model_file
        if not is_last:
            current["training"]["val_interval"] = {"0": 4000}
        if train_from_scratch or (is_last and last_from_scratch):
            model_to_continue = None
        if tasks == "depth" and not is_last:
            current["training"]["segmentation_lambda"] = 0
        if tasks == "seg" and not is_last:
            current["training"]["pseudo_depth_lambda"] = 0
            current["training"]["monodepth_lambda"] = 0
        if is_last and ls.get("last_segmentation_only", False):
            current["training"]["pseudo_depth_lambda"] = 0
            current["training"]["monodepth_lambda"] = 0
        if is_last and ls.get("last_depth_only", False):
            current["training"]["segmentation_lambda"] = 0
        model_file = train_on_subset(current, labeled_samples, train_iters,
                                     model_to_continue)
        if remove_models and old_model_file and old_model_file != resume_file:
            os.remove(old_model_file)
    if remove_models and model_file and model_file != resume_file:
        os.remove(model_file)
