"""Benchmark: train-step throughput + MFU on TPU for the flagship workloads.

Workloads (reference counterparts in parentheses):
  sde_supervised     joint SDE + seg supervised step (train.py:442-549 with
                     monodepth + CE active) — the headline `value`, same
                     workload as round-1/2 benches
  exp210_depthcomp   semi-supervised mean-teacher DepthMix step: teacher fwd +
                     depthcomp mix + student fwd + labeled CE
                     (train.py:653-746)
  exp212_pad_online  PAD multi-task online-DepthMix step: 3 student forwards +
                     photometric loss (train.py:679-698)

Measurement modes: monodepth workloads are timed twice —
  cold          at random init, where the predicted depth is spatially rough
                and the Pallas warp kernel's candidate loop is at its widest
  steady_state  after a few hundred real training steps on the synthetic
                scene with a settling LR schedule, the regime every real
                training run spends >99% of its iterations in (the grids are
                smooth; `grid_yspan_px` — mean per-(8,128)-tile span of
                clamped sample rows — is reported so the claim is checkable)
The headline `value`/`vs_baseline` use steady_state, matching the
reference's own steady-state `time_per_image` telemetry (train.py:787-788).

Timing protocol: every number is measured by a SCAN-CHAINED program — a
single executable running SCAN_LEN train steps under `lax.scan` with the
state as carry and a per-iteration `fold_in` rng — so one remote execution
covers the whole timed window. Host-side python loops over the step
executable are NOT trusted on the tunneled-TPU relay: a controlled A/B
(2026-08-19, this host) measured the same rough-grid state at 1081 ms/step
by scan chain vs ~294 ms/step by async python loop (identical OR varied rng,
final-value block) — the relay under-reports dependent call chains by ~3.7x.
Device-trace profiles (docs/profile_r03.md) corroborate the scan numbers.
Rounds 1-3 recorded loop-protocol throughputs; their RELATIVE ladder
decisions were device-trace-checked, but absolute imgs/s from those rounds
are not comparable to these.

Batch sizes are throughput-optimal for the 16 GB v5e chip (bs8 / bs4+remat),
NOT the reference experiment definitions (bs2, experiments.py:142-149) —
imgs/sec and MFU are the quantities compared, and the derived baseline is
normalized per image.

Prints ONE JSON line; `vs_baseline` derivation lives in BASELINE.md
(reference eager-torch pipeline on its single GPU, estimated at 12% MFU of
A100 bf16 peak over the same TFLOP/img -> ~30 imgs/sec proxy; the JSON
carries `baseline_kind` so the ratio is self-describing).

Deadline safety: the driver bounds this process with its own timeout (the
round-3 bench died rc=124 with no JSON line). Three layers of defense:
  1. Pre-serialized programs. `bench_artifacts/*.hlo.gz` (committed; made by
     tools/export_bench_steps.py) hold the init/step/yspan programs of every
     workload as StableHLO, so the bench does ZERO model tracing — on the
     1-core host, client-side tracing alone costs 3-5 min per workload
     (round 3's stderr trace: 309 s init + 172 s step lowering for
     sde_supervised). With artifacts, per-workload setup is deserialize
     (~1 s) + a persistent-cache-served compile.
  2. A watchdog thread snapshots results as each workload/mode completes
     and, at BENCH_DEADLINE_S (default 440 s), prints whatever has been
     measured so far as the one JSON line (`partial: true`) and exits 0 —
     a timed-out bench degrades to fewer workloads instead of to nothing.
  3. Time-bounded warmups and per-workload skip guards.
Compiles are AOT and served by the persistent cache (.jax_cache), so a
re-run after a warming run is dominated by step execution, not compilation.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

A100_PEAK = 312e12          # A100 bf16 dense peak
REF_ASSUMED_MFU = 0.12      # see BASELINE.md for the derivation + sensitivity
BASELINE_KIND = "derived_proxy_12pct_a100_mfu"
V5E_PEAK = 197e12           # v5e bf16 peak per chip

# The reference's FLOPs per image for each workload — XLA cost analysis of the
# round-2 program, whose compute graph matches the reference's model math
# 1:1 (materialized upsamples, unfused 3x3 convs). FROZEN so that our own
# FLOP-reducing rewrites (e.g. the phase-decomposed upsample-conv) don't move
# the baseline: the reference still executes its unfused math, so the proxy
# `A100_PEAK * MFU / tflop_per_img` must use ITS per-image work, not ours.
# MFU in the per-mode stats still uses the LIVE cost analysis (our program's
# actual FLOPs on this chip).
REF_TFLOP_PER_IMG = {
    "sde_supervised": 9.797 / 8,     # BENCH_r02 sde_supervised
    "exp210_depthcomp": 14.05 / 8,   # BENCH_r02 exp210_depthcomp
    "exp212_pad_online": 15.258 / 4, # BENCH_r02 exp212_pad_online
}

H = W = 512
SCAN_LEN = 10  # train steps per scan-chained program execution
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 440))
MIN_WARMUP = int(os.environ.get("BENCH_MIN_WARMUP", 250))
MAX_WARMUP = int(os.environ.get("BENCH_MAX_WARMUP", 600))
ART_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_artifacts")
_T0 = time.time()

_LOCK = threading.Lock()
_RESULTS: dict = {}       # workload name -> result dict, filled incrementally
_META: dict = {"warp_smooth_path": None}


def _left() -> float:
    return DEADLINE_S - (time.time() - _T0)


def _log(msg: str) -> None:
    # progress to stderr: the one stdout line stays machine-parseable and a
    # timed-out run's tail says exactly which stage ate the budget
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _emit_line(partial: bool, note: str | None = None) -> str:
    with _LOCK:
        results = json.loads(json.dumps(_RESULTS))  # snapshot
    head = results.get("sde_supervised", {})
    head_stats = head.get("steady_state") or head.get("cold", {})
    line = {
        "metric": "train_imgs_per_sec",
        "value": head_stats.get("imgs_per_sec", 0.0),
        "unit": "imgs/sec",
        "vs_baseline": head.get("vs_baseline", 0.0),
        "baseline_imgs_per_sec": head.get("baseline_imgs_per_sec", 0.0),
        "baseline_kind": BASELINE_KIND,
        "headline_mode": "steady_state" if "steady_state" in head else "cold",
        "warp_smooth_path": _META["warp_smooth_path"],
        "workloads": results,
    }
    if partial:
        line["partial"] = True
    if note:
        line["note"] = note
    return json.dumps(line)


def _watchdog():
    # runs on its own thread: fires even if the main thread is blocked
    # inside a compile RPC to the remote TPU
    print(_emit_line(partial=True,
                     note=f"deadline {DEADLINE_S:.0f}s hit; later "
                          "workloads/modes skipped"), flush=True)
    os._exit(0)


def _model_cfg(pad: bool = False):
    cfg = {
        "backbone_name": "resnet101",
        "replace_stride_with_dilation": [False, False, True],
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9]},
        "depth_args": {"intermediate_aspp": True, "aspp_rates": [6, 12, 18],
                       "num_ch_dec": [64, 128, 128, 256, 256]},  # dec6 flagship
        "frame_ids": [0, -1, 1],
        "num_scales": 4,
    }
    if pad:
        cfg["segmentation_name"] = "mtl_pad"
        cfg["segmentation_args"] = {"final_layer": 9, "distillation_layer": 7,
                                    "side_output": True}
        # encoder remat no longer needed: the phase-packed stage 0 removed
        # the full-res C=64 residuals and the 3-forward PAD step fits 16G
        # without it (measured ~3% faster; flip back via cfg["remat"]=True)
    return cfg


# the multi_step decay only matters for the steady_state warmup: by the end
# of warmup the lr has annealed and the depth/pose have settled into the
# smooth-grid regime real training lives in; the schedule costs nothing in
# the timed step (one multiply inside the compiled program). Decaying too
# early freezes whatever roughness the oscillating high-lr phase happened to
# be at (observed: yspan 133 with milestones at 50%/83%), so the first decay
# waits until the scene is fit (~55%), then a long 0.1x phase settles it.
_TRAINING_CFG = {
    "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9, "backbone_lr": 1e-3},
    "lr_schedule": {"name": "multi_step",
                    # 247/405: EXACTLY the round-3 values (450*0.55/450*0.9).
                    # The milestones are baked into the compiled step as
                    # constants, so keeping them bit-identical preserves the
                    # persistent-cache key of the warmed train-step
                    # executable — a cache miss costs a ~7-10 min compile
                    # through the remote-TPU tunnel, which alone blows the
                    # driver's timeout.
                    "milestones": [247, 405],
                    "gamma": 0.1},
    "clip_grad_norm": 10.0,
}


def _step_cfgs():
    """The three flagship workload definitions, shared with
    tools/export_bench_steps.py so the committed artifacts are traced from
    exactly the programs the bench times.

    Returns [(name, model_cfg, step_cfg, batch_size, with_ema, steady)].
    """
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
        StepConfig,
    )

    sde = StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                     frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                     photometric_dtype=jnp.bfloat16)  # amp: true parity

    # exp-210 transfer_dcompgt: seg-only model (SDE-pretrained), offline
    # pseudo-depth drives the depthcomp mask (config/experiments.py:110-143).
    # No monodepth -> no warp -> no cold/steady distinction.
    cfg210 = _model_cfg()
    cfg210["disable_monodepth"] = True
    cfg210["disable_pose"] = True
    s210 = StepConfig(monodepth_lambda=0.0, segmentation_lambda=1.0,
                      frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                      unlabeled=True, use_ema=True, mix_mask="depthcomp",
                      unlabeled_color_jitter=True, unlabeled_blur=True,
                      mix_use_gt=True, depthcomp_margin=0.03,
                      depthcomp_foreground_threshold=0.0)

    # exp-212 pad_transfer_dcompgt: PAD decoder + online-depth DepthMix
    # (config/experiments.py:259-300); bs4, no remat (see _model_cfg note)
    s212 = StepConfig(monodepth_lambda=1.0, segmentation_lambda=1.0,
                      frame_ids=(0, -1, 1), scales=(0, 1, 2, 3),
                      unlabeled=True, use_ema=True, mix_mask="depthcomp",
                      unlabeled_color_jitter=True, unlabeled_blur=True,
                      mix_use_gt=True, depthcomp_margin=0.03,
                      depthcomp_foreground_threshold=0.0,
                      depthmix_online_depth=True,
                      photometric_dtype=jnp.bfloat16)  # amp: true parity

    return [
        ("sde_supervised", _model_cfg(), sde, 8, False, True),
        ("exp210_depthcomp", cfg210, s210, 8, True, False),
        ("exp212_pad_online", _model_cfg(pad=True), s212, 4, True, True),
    ]


def _make_batches(step_cfg, batch_size):
    from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
        make_synthetic_batch,
    )

    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(batch_size, H, W, frame_ids=(0, -1, 1),
                                  num_scales=4).items()}
    ubatch = None
    if step_cfg.unlabeled:
        ubatch = {k: jnp.asarray(v) for k, v in
                  make_synthetic_batch(batch_size, H, W, frame_ids=(0, -1, 1),
                                       num_scales=4, with_unlabeled_extras=True,
                                       seed=7).items()}
    return batch, ubatch


def make_scan_fn(step_fn):
    """SCAN_LEN chained train steps as ONE program: (state, batch, ubatch,
    rng) -> (state, last_metrics). The state is the scan carry, each
    iteration folds its index into `rng` — the only timing shape the
    tunneled-TPU relay reports faithfully (see module docstring). Shared
    with tools/export_bench_steps.py."""

    def scan_fn(state, batch, ubatch, rng):
        def body(st, i):
            st, metrics = step_fn(st, batch, ubatch, jax.random.fold_in(rng, i))
            return st, metrics["total_loss"]
        state, losses = jax.lax.scan(body, state, jnp.arange(SCAN_LEN))
        return state, {"total_loss": losses[-1]}

    return scan_fn


def make_yspan_fn(model, step_cfg):
    """Mean per-(8,128)-tile span of clamped sample-grid rows (scale 0,
    frame +1) — the quantity the warp kernel's candidate loop scales with.
    Shared with tools/export_bench_steps.py (exported per steady workload)."""
    from improving_segmentation_with_selfsupervised_depth_tpu.ops import photometric

    def f(state, batch):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False)
        outputs = photometric.generate_images_pred(
            batch, outputs, scales=(0,), frame_ids=step_cfg.frame_ids,
            min_depth=step_cfg.min_depth, max_depth=step_cfg.max_depth)
        grid = outputs[photometric.key_of("sample", 1, 0)]
        iy = jnp.clip((grid[..., 1] + 1.0) * 0.5 * (H - 1), 0, H - 1)
        t = iy.reshape(-1, H // 8, 8, W // 128, 128)
        return jnp.mean(jnp.max(t, axis=(2, 4)) - jnp.min(t, axis=(2, 4)))

    return f


def make_init_fn(model, model_cfg, training_cfg, with_ema, params_spec):
    """One jitted program for the whole TrainState: params + batch_stats +
    opt_state + EMA. Round 3's bench ran `model.init` TWICE (once directly,
    once inside create_train_state) and then built opt/EMA state eagerly
    op-by-op through the TPU tunnel — 309 s of the deadline on the 1-core
    host. `params_spec` (from eval_shape or a concrete tree) feeds the
    optimizer's param-group labeling, which only reads tree structure.

    Returns (init_fn(rng, batch) -> TrainState, tx). Shared with
    tools/export_bench_steps.py.
    """
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import (
        build_optimizer,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
        TrainState,
        init_ema_params,
    )

    tx = build_optimizer(training_cfg, model_cfg, params_spec)

    def init_fn(rng, batch):
        variables = model.init({"params": rng, "dropout": rng}, batch)
        params = variables["params"]
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema_params=init_ema_params(params) if with_ema else None,
        )

    return init_fn, tx


def _load_exported(name, kind):
    from jax import export as jexport

    path = os.path.join(ART_DIR, f"{name}.{kind}.hlo.gz")
    with gzip.open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def _build_from_artifacts(name, step_cfg, batch_size, steady):
    """Deserialize the committed StableHLO programs — no model tracing."""
    batch, ubatch = _make_batches(step_cfg, batch_size)
    exp_init = _load_exported(name, "init")
    exp_scan = _load_exported(name, "scan")
    yspan = None
    if steady:
        yspan = jax.jit(_load_exported(name, "yspan").call)
    _log(f"{name}: artifacts deserialized; running init")
    state = jax.jit(exp_init.call)(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    return exp_scan.call, state, batch, ubatch, yspan


def _build_live(model_cfg, step_cfg, batch_size, with_ema, steady):
    """Fallback: trace the model here (3-5 min/workload on the 1-core host)."""
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
        make_train_step,
    )
    from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model

    model = build_model(model_cfg, n_classes=19, dtype=jnp.bfloat16)
    batch, ubatch = _make_batches(step_cfg, batch_size)
    rng = jax.random.PRNGKey(0)
    var_spec = jax.eval_shape(
        lambda r, b: model.init({"params": r, "dropout": r}, b), rng, batch)
    init_fn, tx = make_init_fn(model, model_cfg, _TRAINING_CFG, with_ema,
                               var_spec["params"])
    _log("live build: init program compile")
    state = jax.jit(init_fn)(rng, batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    scan_fn = make_scan_fn(make_train_step(model, step_cfg, tx))
    yspan = jax.jit(make_yspan_fn(model, step_cfg)) if steady else None
    return scan_fn, state, batch, ubatch, yspan


def _time(compiled, state, batch, ubatch, rng):
    """One timed remote execution = SCAN_LEN chained steps (see module
    docstring: python-looped step calls are NOT trusted on the relay).

    The input state is blocked on BEFORE the clock starts: issuing the timed
    call while a previous execution is still in flight made the relay report
    the call as done in ~7 ms (observed 2026-08-19 — the cold window right
    after an un-blocked program-warm call)."""
    jax.block_until_ready(jax.tree_util.tree_leaves(state))
    t0 = time.perf_counter()
    state, metrics = compiled(state, batch, ubatch, rng)
    jax.block_until_ready(metrics["total_loss"])
    return (time.perf_counter() - t0) / SCAN_LEN, state


def _warm_path(name):
    return os.path.join(ART_DIR, f"{name}.warm.npz")


def _load_warm_state(name, state_like):
    """Load a locally persisted settled TrainState (same leaf structure as
    `state_like`) written by a previous bench run on this machine. Returns
    (state, warmup_steps) or (None, 0). The file is machine-local
    (gitignored): on a fresh clone the bench warms up from scratch."""
    import numpy as np

    path = _warm_path(name)
    if not os.path.exists(path):
        return None, 0
    try:
        leaves, treedef = jax.tree_util.tree_flatten(state_like)
        with np.load(path) as z:
            steps = int(z["__steps__"])
            loaded = [z[f"a{i}"] for i in range(len(leaves))]
        if any(l.shape != tuple(jnp.shape(c)) for l, c in zip(loaded, leaves)):
            raise ValueError("stale warm state: leaf shape mismatch")
        loaded = [jnp.asarray(l, jnp.result_type(c))
                  for l, c in zip(loaded, leaves)]
        return jax.tree_util.tree_unflatten(treedef, loaded), steps
    except Exception as e:
        _log(f"{name}: warm state unusable ({type(e).__name__}: {e})")
        return None, 0


def _save_warm_state(name, state, steps):
    import numpy as np

    if _left() < 40:
        return
    try:
        leaves = jax.tree_util.tree_leaves(state)
        arrs = {f"a{i}": np.asarray(l) for i, l in enumerate(leaves)}
        arrs["__steps__"] = np.asarray(steps)
        np.savez(_warm_path(name), **arrs)
        _log(f"{name}: warm state persisted ({steps} steps)")
    except Exception as e:
        _log(f"{name}: warm-state save failed ({type(e).__name__}: {e})")


def _finalize(name):
    """Attach the per-workload baseline proxy + vs_baseline in place, so a
    watchdog snapshot taken at any moment is self-consistent."""
    r = _RESULTS.get(name)
    if not r or "tflop_per_step" not in r:
        return
    proxy = A100_PEAK * REF_ASSUMED_MFU / (REF_TFLOP_PER_IMG[name] * 1e12)
    with _LOCK:
        r["baseline_imgs_per_sec"] = round(proxy, 2)
        for mode in ("cold", "steady_state"):
            if mode in r:
                r[mode]["vs_baseline"] = round(r[mode]["imgs_per_sec"] / proxy, 3)
        # headline per workload: the training regime (steady when measured)
        r["vs_baseline"] = (r.get("steady_state") or r["cold"])["vs_baseline"]


def bench_workload(name, model_cfg, step_cfg, batch_size, with_ema=False,
                   steady=False, reserve_s=60.0):
    """Measure one workload; mutates _RESULTS[name] incrementally.

    `reserve_s`: stop this workload's steady warmup when less than this many
    seconds remain before the deadline, leaving room for later workloads.
    """
    if _left() < 45:
        _RESULTS[name] = {"skipped": f"deadline {DEADLINE_S:.0f}s near"}
        return
    built = None
    if (_META["warp_smooth_path"] is not False
            and os.environ.get("BENCH_NO_ARTIFACTS", "") == ""
            and jax.default_backend() == "tpu"):
        try:
            _log(f"{name}: loading pre-serialized programs")
            built = _build_from_artifacts(name, step_cfg, batch_size, steady)
        except Exception as e:  # missing/stale artifact -> trace live
            _log(f"{name}: artifact path unavailable ({type(e).__name__}: "
                 f"{e}); tracing live")
    if built is None:
        _log(f"{name}: live build (init + optimizer)")
        built = _build_live(model_cfg, step_cfg, batch_size, with_ema, steady)
    scan_fn, state, batch, ubatch, yspan = built
    # process-unique rng salt: the relay caches executions ACROSS PROCESSES
    # keyed on (program, input values) — a bench re-run that replays the
    # canonical PRNGKey(0) sequence gets last run's results replayed at
    # ~0.7 ms/step (observed 2026-08-19: sde cold replayed, exp210/212 cold
    # real on their first-ever execution). Init stays deterministic
    # (PRNGKey(0)); every timed/warmup execution is salted fresh.
    rng = jax.random.PRNGKey((os.getpid() << 16) ^ (int(time.time()) & 0x7FFFFFFF))

    # AOT: one compile serves cost analysis AND execution
    _log(f"{name}: lower + compile {SCAN_LEN}-step scan program")
    compiled = jax.jit(scan_fn, donate_argnums=(0,)).lower(
        state, batch, ubatch, rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    # XLA cost analysis counts a While (lax.scan) body ONCE, not trip-count
    # times — verified against the round-2 single-step program's 10.109
    # TFLOP/step (the scan program reports the same value), so no /SCAN_LEN
    flops = float(ca.get("flops", 0.0))

    def stats(dt):
        return {
            "imgs_per_sec": round(batch_size / dt, 3),   # labeled imgs, like
            # the reference's training/time_per_image telemetry
            # (train.py:787-788)
            "step_ms": round(dt * 1e3, 1),
            "mfu_pct": round(100.0 * flops / dt / V5E_PEAK, 2),
        }

    # first scan execution warms program load (and advances 10 real steps);
    # the second is the timed cold window
    _log(f"{name}: compiled; warming program + timing cold")
    state, _ = compiled(state, batch, ubatch, jax.random.fold_in(rng, 10**6))
    dt_cold, state = _time(compiled, state, batch, ubatch,
                           jax.random.fold_in(rng, 10**6 + 1))
    res = {
        "batch_size": batch_size,
        "tflop_per_step": round(flops / 1e12, 3),
        "cold": stats(dt_cold),
    }
    with _LOCK:
        _RESULTS[name] = res
    _finalize(name)
    if steady and _left() > reserve_s:
        res["cold"]["grid_yspan_px"] = round(float(yspan(state, batch)), 1)
        # warm-state fast path: a locally persisted settled state (written by
        # a previous bench run on this machine, gitignored) skips the warmup
        warm, steps_done = _load_warm_state(name, state)
        if warm is not None:
            state, yv = warm, round(float(yspan(warm, batch)), 1)
            _log(f"{name}: loaded warm state ({steps_done} steps, yspan {yv})")
        else:
            _log(f"{name}: cold done; steady warmup")
            steps_done = 2 * SCAN_LEN  # the program-warm + cold windows above
            yv = None
        if yv is None or yv > 25:
            # time-bounded warmup in SCAN_LEN-step chunks until the grid has
            # settled (yspan <= 25 — tools/bench_steady.py ladders show yspan
            # ~60 still costs ~10% step time) or the budget is out. A loaded
            # but not-yet-settled warm state resumes here, so successive
            # bench runs on one machine settle it incrementally.
            start = steps_done
            while steps_done < MAX_WARMUP and _left() > reserve_s:
                state, _ = compiled(state, batch, ubatch,
                                    jax.random.fold_in(rng, steps_done))
                steps_done += SCAN_LEN
                if steps_done >= MIN_WARMUP and steps_done % 50 == 0:
                    yv = round(float(yspan(state, batch)), 1)
                    if yv <= 25:
                        break
            if steps_done > start:
                _save_warm_state(name, state, steps_done)
        if _left() > 0:
            _log(f"{name}: warmed {steps_done} steps (yspan {yv}); "
                 "timing steady")
            dt_ss, state = _time(compiled, state, batch, ubatch,
                                 jax.random.fold_in(rng, 10**6 + 2))
            with _LOCK:
                res["steady_state"] = stats(dt_ss)
                res["steady_state"]["warmup_steps"] = steps_done
                res["steady_state"]["grid_yspan_px"] = round(
                    float(yspan(state, batch)), 1)
            _finalize(name)


def _probe_smooth_warp() -> bool:
    """Compile-probe the warp kernel's smooth-grid fast path on the real
    backend. The fast path's dynamic-shift `pltpu.roll` is the one Mosaic
    construct in this repo with toolchain-version risk; if it fails to
    compile, drop to the always-legal group-scan kernel (set_smooth_path
    clears the jit cache) instead of failing the whole bench. The
    pre-serialized artifacts bake the smooth path in, so a failed probe also
    disables the artifact route (bench_workload checks _META)."""
    if jax.default_backend() != "tpu":
        return True
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas import warp
    try:
        img = jnp.zeros((1, 8, 128, 1), jnp.float32)
        ix = jnp.zeros((1, 8, 128), jnp.float32)
        iy = jnp.zeros((1, 8, 128), jnp.float32)
        jax.block_until_ready(warp.bilinear_warp_corners_nchw(img, ix, iy))
        return True
    except Exception:
        warp.set_smooth_path(False)
        return False


def main():
    # fires even when the main thread is stuck in backend init against a
    # dead TPU tunnel or inside a long uncached compile
    timer = threading.Timer(max(DEADLINE_S - 12, 30), _watchdog)
    timer.daemon = True
    timer.start()

    _log("backend init")
    jax.devices()
    _log(f"backend up: {jax.default_backend()}; probing smooth warp")
    _META["warp_smooth_path"] = _probe_smooth_warp()

    # leave room for exp210 + exp212 after the headline workload
    reserves = {"sde_supervised": 150.0, "exp210_depthcomp": 60.0,
                "exp212_pad_online": 15.0}
    for name, model_cfg, step_cfg, batch_size, with_ema, steady in _step_cfgs():
        bench_workload(name, model_cfg, step_cfg, batch_size,
                       with_ema=with_ema, steady=steady,
                       reserve_s=reserves[name])

    timer.cancel()
    print(_emit_line(partial=False), flush=True)


if __name__ == "__main__":
    main()
