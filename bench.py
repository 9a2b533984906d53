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
# 480 default: the driver's own bound is ~600 s (round-3 forensics — its
# multichip dryrun's last stderr line lands 600 s after a plausible start);
# the watchdog fires at DEADLINE_S-12 and always prints the JSON line
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 480))
MIN_WARMUP = int(os.environ.get("BENCH_MIN_WARMUP", 250))
MAX_WARMUP = int(os.environ.get("BENCH_MAX_WARMUP", 600))
ART_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_artifacts")
# Secondary warm-state location OUTSIDE the repo: warm .npz files are
# gitignored, so a fresh checkout between the round and the driver's
# end-of-round bench run wipes them — the home cache survives and saves
# the ~320 s settle-from-scratch per steady workload.
WARM_CACHE_DIR = os.environ.get(
    "SSD_TPU_WARM_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "ssd_tpu_warm"))
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


def _write_snapshot() -> None:
    """Child mode: persist the current results as a complete JSON line so
    the supervisor can print the best-so-far even if this process wedges
    or is killed (see _supervise)."""
    path = os.environ.get("BENCH_SNAPSHOT", "")
    if not path:
        return
    try:
        line = _emit_line(partial=True, note="snapshot")
        with open(path + ".tmp", "w") as f:
            f.write(line)
        os.replace(path + ".tmp", path)
    except Exception:
        pass


def _emit_line(partial: bool, note: str | None = None) -> str:
    with _LOCK:
        results = json.loads(json.dumps(_RESULTS))  # snapshot
    head = results.get("sde_supervised", {})
    # a mode flagged invalid_relay_replay is NOT a measurement and must not
    # become the headline value (ADVICE r4)
    head_mode = next((m for m in ("steady_state", "cold")
                      if "imgs_per_sec" in head.get(m, {})
                      and not head[m].get("invalid_relay_replay")), None)
    head_stats = head.get(head_mode, {}) if head_mode else {}
    line = {
        "metric": "train_imgs_per_sec",
        "value": head_stats.get("imgs_per_sec", 0.0),
        "unit": "imgs/sec",
        "vs_baseline": head.get("vs_baseline", 0.0),
        "baseline_imgs_per_sec": head.get("baseline_imgs_per_sec", 0.0),
        "baseline_kind": BASELINE_KIND,
        "headline_mode": head_mode or "none",
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


# constant lr for the steady_state warmup: decaying mid-warmup FREEZES the
# grid at whatever roughness the decay point reached (measured: the round-3
# [247, 405] milestones converged at yspan ~48-49 even after 2000 warmup
# steps, because lr 1e-4 can no longer smooth the synthetic scene), while a
# constant 1e-2 settles it to yspan < 25 within ~500 steps
# (tools/bench_steady.py trajectories). The schedule is baked into the
# compiled scan program as constants — changing it invalidates the committed
# artifacts AND the persistent compile cache (a miss costs ~3 min through
# the remote-TPU tunnel), so regenerate bench_artifacts/ when touching this.
_TRAINING_CFG = {
    "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9, "backbone_lr": 1e-3},
    "lr_schedule": {"name": "multi_step", "milestones": [10**6], "gamma": 0.1},
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

    # run order = value order under a tight budget: the sde headline first,
    # then exp212 (two modes to record, the weakest vs_baseline), then
    # exp210 (cold-only, the most robust number) — a slow relay startup
    # (observed 0.1-196 s, r4e log) clips from the back
    return [
        ("sde_supervised", _model_cfg(), sde, 8, False, True),
        ("exp212_pad_online", _model_cfg(pad=True), s212, 4, True, True),
        ("exp210_depthcomp", cfg210, s210, 8, True, False),
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
    _log(f"{name}: artifacts deserialized")
    init_jit = jax.jit(exp_init.call)
    reinit = lambda: init_jit(jax.random.PRNGKey(0), batch)  # noqa: E731
    # abstract state spec (NOT a device allocation): the scan program lowers
    # from avals, so the random-init state only ever materializes when a
    # window actually needs it — materializing it alongside the uploaded
    # warm state OOM'd the 16 GB chip on exp212 (r4f/r4h logs)
    spec = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in exp_init.out_avals]
    return exp_scan.call, spec, batch, ubatch, yspan, reinit


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
    init_jit = jax.jit(init_fn)
    reinit = lambda: init_jit(rng, batch)  # noqa: E731
    spec = jax.eval_shape(init_fn, rng, batch)
    scan_fn = make_scan_fn(make_train_step(model, step_cfg, tx))
    yspan = jax.jit(make_yspan_fn(model, step_cfg)) if steady else None
    return scan_fn, spec, batch, ubatch, yspan, reinit


def _plausible(dt, mfu_pct: float) -> bool:
    """A single window reading is PLAUSIBLE iff 0 < dt and 0 < MFU <= 60%.

    dt <= 0 happens when a relay-replayed window returns faster than the
    measured probe overhead (observed class of failure: the relay replays a
    cached execution at ~0.7 ms/step); its negative MFU must not pass the
    ceiling check (ADVICE r4). MFU > 60% is physically impossible for these
    conv-bound programs on this chip, so a faster reading means a relay sync
    primitive lied (see _sync_fetch)."""
    return dt is not None and dt > 0.0 and 0.0 < mfu_pct <= 60.0


def _windows_agree(a: float, b: float, tol: float = 0.20) -> bool:
    """Two successive plausible windows must agree within `tol` before a
    reading is CONFIRMED: a wedge-then-replay can return a plausible but
    stale time, and two independently salted windows replaying to
    *consistent* wrong values is not an observed relay failure mode."""
    return abs(a - b) / min(a, b) <= tol


def _measure_window(time_one, mfu_of, left, budget_floor, log, max_tries=6):
    """Acceptance rule for one timed mode (documented here; unit-tested by
    tests/test_bench_guard.py with a fake timer):

      1. readings failing _plausible are retried with a fresh rng fold;
      2. a plausible reading is CONFIRMED only when the next plausible
         window agrees within 20% (_windows_agree) — the mean of the two
         is returned;
      3. when the try or time budget runs out first, the best plausible
         single reading is returned flagged "unconfirmed" (still honest —
         one scan-chained window — just not cross-checked), or the last
         implausible reading flagged "invalid" so no consumer can mistake
         it for a measurement.

    `time_one(try_idx) -> dt | None` times one scan window (None = sync
    wedged); `mfu_of(dt) -> pct`; `left() -> seconds remaining`.

    Returns (dt | None, tries, status) with status in
    {"confirmed", "unconfirmed", "invalid", "wedged"}.
    """
    prev = None
    tries = 0
    while True:
        dt = time_one(tries)
        tries += 1
        ok = _plausible(dt, mfu_of(dt) if dt else 0.0)
        if ok and prev is not None and _windows_agree(dt, prev):
            return (dt + prev) / 2.0, tries, "confirmed"
        if tries >= max_tries or left() <= budget_floor:
            if ok:
                return dt, tries, "unconfirmed"
            if prev is not None:
                return prev, tries, "unconfirmed"
            if dt is None:
                return None, tries, "wedged"
            return dt, tries, "invalid"
        if ok:
            why = ("first plausible window; confirming" if prev is None else
                   f"{dt * 1e3:.0f} ms disagrees with {prev * 1e3:.0f} ms")
            prev = dt
        else:
            why = ("sync wedged" if dt is None else
                   f"dt {dt * 1e3:.1f} ms implausible "
                   f"({mfu_of(dt):.1f}% MFU, relay replay)")
        log(f"window {tries}: {why} — re-timing")


class _FetchTimeout(Exception):
    pass


def _bounded(fn, timeout: float, desc: str):
    """Run `fn()` on a daemon thread and wait at most `timeout` seconds.

    The tunneled-TPU relay can wedge a blocking fetch INDEFINITELY (r4c/r4d
    logs 2026-08-19: a device_get / probe fetch of an in-flight scan
    window's output sat >410 s until the watchdog killed the whole bench
    with zero workloads). A bounded wait converts that hang into a
    retryable _FetchTimeout; the wedged thread is abandoned (daemon — the
    bench always exits via os._exit, never joins)."""
    out: dict = {}

    def run():
        try:
            out["v"] = fn()
        except Exception as e:  # surfaced to the caller, not the thread
            out["e"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        raise _FetchTimeout(f"{desc} exceeded {timeout:.0f}s")
    if "e" in out:
        raise out["e"]
    return out["v"]


_SYNC = None


def _warm_probe():
    """Compile + execute the sync-probe executable ONCE, before any scan
    window is dispatched. The r4d hang (2026-08-19) was a compile RPC
    issued while a scan execution was in flight; pre-compiling here means
    _sync_fetch never compiles concurrently with a running window."""
    global _SYNC
    _SYNC = jax.jit(lambda v: v * 1.0)
    float(jax.device_get(_SYNC(jnp.float32(1.0))))


def _sync_fetch(x, timeout: float) -> float:
    """Force completion of everything `x` depends on and return its value.

    Routed through a SEPARATE trivial executable because, on the tunneled-TPU
    relay, the direct primitives lie for an executable's first in-flight
    execution (both observed 2026-08-19, same program whose real window is
    ~20 s): `block_until_ready` on the scan's outputs returned in ~3 ms
    four times back-to-back; `device_get` of the loss scalar then HUNG past
    a 400 s timeout. Fetching through a second program (exactly how the
    yspan probes behave, which always returned correct, really-synced
    values) is the one sync primitive the relay honors — and even it is
    time-bounded here (see _bounded)."""
    return float(_bounded(lambda: jax.device_get(_SYNC(x)),
                          timeout, "probe fetch"))


def _time(compiled, state, batch, ubatch, rng, fetch_timeout: float):
    """One timed remote execution = SCAN_LEN chained steps (see module
    docstring: python-looped step calls are NOT trusted on the relay).

    Shape: run a THROWAWAY window first and force-sync it via _sync_fetch —
    the relay's sync primitives are broken only around an executable's
    first in-flight execution — then measure the probe's own overhead on a
    ready value, then time the real window, also ended by the probe, and
    subtract the probe overhead. Advances the state by 2*SCAN_LEN steps.

    Returns (dt_per_step | None, state); None means a sync timed out —
    the returned state is the in-flight result and stays usable (later
    executions queue behind it)."""
    state, m = compiled(state, batch, ubatch, jax.random.fold_in(rng, 0))
    try:
        loss = _sync_fetch(m["total_loss"], fetch_timeout)
        if not (loss == loss):  # NaN guard: diverged warmup -> note it
            _log("throwaway window loss is NaN")
        t0 = time.perf_counter()
        _sync_fetch(m["total_loss"], 30.0)
        probe_s = time.perf_counter() - t0
    except _FetchTimeout as e:
        _log(f"throwaway-window sync wedged ({e})")
        return None, state
    t0 = time.perf_counter()
    state, m = compiled(state, batch, ubatch, jax.random.fold_in(rng, 1))
    try:
        _sync_fetch(m["total_loss"], fetch_timeout)
    except _FetchTimeout as e:
        _log(f"timed-window sync wedged ({e})")
        return None, state
    dt = (time.perf_counter() - t0 - probe_s) / SCAN_LEN
    return dt, state


def _warm_paths(name):
    """Candidate locations, preference order: repo-local (gitignored),
    then the machine-local home cache (survives a fresh checkout)."""
    return [os.path.join(ART_DIR, f"{name}.warm.npz"),
            os.path.join(WARM_CACHE_DIR, f"{name}.warm.npz")]


def _load_warm_state(name, state_like):
    """Load a locally persisted settled TrainState (same leaf structure as
    `state_like`) written by a previous bench run on this machine. Returns
    (state, warmup_steps) or (None, 0). The files are machine-local
    (gitignored / home cache): on a fresh machine the bench warms up from
    scratch."""
    import numpy as np

    path = next((p for p in _warm_paths(name) if os.path.exists(p)), None)
    if path is None:
        return None, 0
    try:
        leaves, treedef = jax.tree_util.tree_flatten(state_like)
        with np.load(path) as z:
            steps = int(z["__steps__"])
            dtypes = [str(d) for d in z["__dtypes__"]] if "__dtypes__" in z \
                else None
            loaded = [z[f"a{i}"] for i in range(len(leaves))]
        if any(l.shape != tuple(jnp.shape(c)) for l, c in zip(loaded, leaves)):
            raise ValueError("stale warm state: leaf shape mismatch")
        # the f32 round-trip below is only exact for the dtypes the state had
        # at save time — a dtype change (e.g. a future uint32 PRNG key leaf)
        # must invalidate the file, not silently corrupt it (ADVICE r4)
        if dtypes is None or any(
                d != str(jnp.result_type(c)) for d, c in zip(dtypes, leaves)):
            raise ValueError("stale warm state: leaf dtype mismatch")
        # ship the ~1200 leaves as ONE f32 buffer + one cached unpack
        # program: per-leaf device_put through the relay cost ~4 min for the
        # 1 GB sde state (run B 2026-08-19), one bulk transfer ~15 s. f32
        # holds every state dtype here exactly (f32 params/opt, small int32
        # counters).
        flat = np.concatenate(
            [np.asarray(l, np.float32).ravel() for l in loaded])
        sizes = [int(np.prod(l.shape, dtype=np.int64)) for l in loaded]
        offs = np.cumsum([0] + sizes)

        def unpack(buf):
            return [
                jax.lax.dynamic_slice(buf, (int(o),), (s,))
                .reshape(jnp.shape(c)).astype(jnp.result_type(c))
                for o, s, c in zip(offs, sizes, leaves)
            ]

        # device transfer + unpack compile both happen while nothing is in
        # flight, but the relay can still wedge — bound the whole load
        out = _bounded(lambda: jax.jit(unpack)(jnp.asarray(flat)),
                       min(280.0, max(60.0, _left() - 60)),
                       "warm-state upload")
        return jax.tree_util.tree_unflatten(treedef, out), steps
    except Exception as e:
        _log(f"{name}: warm state unusable ({type(e).__name__}: {e})")
        return None, 0


def _save_warm_state(name, state, steps):
    import numpy as np

    if _left() < 40:
        return
    try:
        leaves = jax.tree_util.tree_leaves(state)
        arrs = _bounded(
            lambda: {f"a{i}": np.asarray(l) for i, l in enumerate(leaves)},
            min(240.0, max(30.0, _left() - 30)), "warm-state download")
        # the loader ships everything as ONE f32 buffer; refuse to persist
        # any leaf the f32 round-trip can't represent exactly (ADVICE r4):
        # floats wider than 32 bit, or integers beyond f32's 2^24 mantissa
        for i, l in enumerate(leaves):
            a = arrs[f"a{i}"]
            if (np.issubdtype(a.dtype, np.floating) and a.dtype.itemsize > 4) \
               or (np.issubdtype(a.dtype, np.integer) and a.size
                   and np.abs(a).max() >= 2 ** 24):
                raise ValueError(f"leaf {i} ({a.dtype}) not f32-exact")
        arrs["__steps__"] = np.asarray(steps)
        arrs["__dtypes__"] = np.asarray(
            [str(jnp.result_type(l)) for l in leaves])
        primary, cache = _warm_paths(name)
        np.savez(primary, **arrs)
        try:
            # checkout-wipe-proof copy (see WARM_CACHE_DIR note above)
            import shutil

            os.makedirs(WARM_CACHE_DIR, exist_ok=True)
            shutil.copyfile(primary, cache)
        except OSError as e:
            _log(f"{name}: warm cache copy failed ({e})")
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
            if "imgs_per_sec" in r.get(mode, {}):
                r[mode]["vs_baseline"] = round(r[mode]["imgs_per_sec"] / proxy, 3)
        # headline per workload: the training regime (steady when measured;
        # a failed/missing/invalid mode falls through to the other)
        good = [r[m] for m in ("steady_state", "cold")
                if "vs_baseline" in r.get(m, {})
                and not r[m].get("invalid_relay_replay")]
        if good:
            r["vs_baseline"] = good[0]["vs_baseline"]
    _write_snapshot()


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
    scan_fn, state_spec, batch, ubatch, yspan, reinit = built
    # process-unique rng salt: the relay caches executions ACROSS PROCESSES
    # keyed on (program, input values) — a bench re-run that replays the
    # canonical PRNGKey(0) sequence gets last run's results replayed at
    # ~0.7 ms/step (observed 2026-08-19: sde cold replayed, exp210/212 cold
    # real on their first-ever execution). Init stays deterministic
    # (PRNGKey(0)); every timed/warmup execution is salted fresh.
    rng = jax.random.PRNGKey((os.getpid() << 16) ^ (int(time.time()) & 0x7FFFFFFF))

    # AOT: one compile serves cost analysis AND execution; lowering from the
    # abstract state spec means no state is allocated until a window runs
    _log(f"{name}: lower + compile {SCAN_LEN}-step scan program")
    compiled = jax.jit(scan_fn, donate_argnums=(0,)).lower(
        state_spec, batch, ubatch, rng).compile()
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

    def _yspan_of(st):
        try:
            return round(float(_bounded(
                lambda: jax.device_get(yspan(st, batch)),
                min(300.0, max(30.0, _left() - 5)), "yspan fetch")), 1)
        except _FetchTimeout as e:
            _log(f"{name}: {e}")
            return None

    def _record_window(mode, fold0, budget_floor, st):
        """Time one mode via the module-level acceptance rule
        (_measure_window) and record it under _RESULTS[name][mode].
        Each underlying _time call advances the state 2*SCAN_LEN steps.
        Returns (advanced state, tries)."""
        box = {"st": st}

        def time_one(i):
            fetch_to = min(150.0, max(30.0, _left() - budget_floor - 5))
            dt, box["st"] = _time(compiled, box["st"], batch, ubatch,
                                  jax.random.fold_in(rng, fold0 + i), fetch_to)
            return dt

        dt, tries, status = _measure_window(
            time_one, lambda d: stats(d)["mfu_pct"],
            _left, budget_floor, lambda m: _log(f"{name}: {mode} {m}"))
        with _LOCK:
            if dt is None:
                res[mode] = {"failed": "relay sync wedged"}
            else:
                res[mode] = stats(dt)
                if status == "confirmed":
                    res[mode]["confirmed"] = True  # two windows agreed <=20%
                elif status == "unconfirmed":
                    res[mode]["unconfirmed"] = True
                else:  # implausible — never promoted to a headline (_finalize)
                    res[mode]["invalid_relay_replay"] = True
        _finalize(name)
        return box["st"], tries

    res = {"batch_size": batch_size, "tflop_per_step": round(flops / 1e12, 3)}
    with _LOCK:
        _RESULTS[name] = res

    if steady:
        # STEADY FIRST, always — it is the headline mode (the regime real
        # training spends >99% of its iterations in), and the cold window is
        # the one that historically wedged the relay (r4b-r4d). A warm state
        # persisted by a previous run on this machine (gitignored) skips the
        # settling warmup; on a fresh clone the state settles from random
        # init, time-bounded, so the steady number still lands inside the
        # driver budget (possibly at a rougher grid — grid_yspan_px says
        # how settled it really was). Only ONE full state is ever live on
        # the chip: the settling state now, the random init later
        # (recreated by reinit()) — two at once OOM'd 16 GB on exp212
        # (r4f/r4h logs).
        state, steps_done = _load_warm_state(name, state_spec)
        if state is None:
            _log(f"{name}: no warm state; settling from random init")
            state, steps_done = reinit(), 0
        yv = _yspan_of(state)
        _log(f"{name}: settling from {steps_done} steps (yspan {yv})")
        start = steps_done
        # settle in SCAN_LEN-step chunks until the grid is smooth
        # (yspan <= 25 — tools/bench_steady.py ladders show yspan ~60 still
        # costs ~10% step time) or the budget is out; successive runs on one
        # machine settle incrementally via the persisted state. The yspan
        # gate is only trusted from MIN_WARMUP steps on: exp212's random
        # init predicts near-FLAT depth (yspan ~0), which roughens over the
        # first training steps before settling — gating the loop on the
        # initial yspan skipped its warmup entirely (r5b log 2026-08-19:
        # "settled 0 steps (yspan 0.0)", then 303.6 after the timed window).
        while steps_done < MAX_WARMUP and _left() > reserve_s:
            if steps_done >= MIN_WARMUP and yv is not None and yv <= 25:
                break
            state, _ = compiled(state, batch, ubatch,
                                jax.random.fold_in(rng, steps_done))
            steps_done += SCAN_LEN
            if steps_done >= MIN_WARMUP and steps_done % 50 == 0:
                yv = _yspan_of(state)
        if steps_done > start:
            _save_warm_state(name, state, steps_done)
        _log(f"{name}: settled {steps_done} steps (yspan {yv}); "
             "timing steady")
        state, tries = _record_window("steady_state", 2 * 10**6 + 1,
                                      reserve_s, state)
        ss = res.get("steady_state", {})
        if "failed" not in ss:
            with _LOCK:
                # timing retries advance the state too (ADVICE r4)
                ss["warmup_steps"] = steps_done + 2 * SCAN_LEN * tries
                ss["grid_yspan_px"] = _yspan_of(state)
        del state  # only one full state on the chip at a time (see above)
        _log(f"{name}: steady done; timing cold (random init)")

    if not steady:
        _log(f"{name}: compiled; timing cold")
    state, _ = _record_window("cold", 10**6 + 1, reserve_s, reinit())
    if steady and "failed" not in res.get("cold", {}):
        with _LOCK:
            res["cold"]["grid_yspan_px"] = _yspan_of(state)


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
    _log(f"backend up: {jax.default_backend()}; warming sync probe")
    # Startup wedge handling. After a previous client's abrupt death the
    # remote end holds its session for a grace period and BLOCKS the new
    # session's first device work (observed 2026-08-19: r4e unwedged
    # in-process after ~190 s and then ran perfectly; r4g sat 470 s and
    # never recovered; r5a's second attempt started fine after 137 s).
    # Tension: patience usually wins and every abandoned process adds
    # another dead session to wait out (r4i: three 120s-timeout retries in a
    # row all wedged) — but r4's two-attempt 280s-then-60s schedule burned
    # the whole window on waiting. The supervisor now ladders the wait per
    # attempt (BENCH_STARTUP_WAIT: ~160 s first — covers the observed 137 s
    # clear — then a full 280 s grace period, then mid-length tries while
    # budget remains); standalone child runs keep the old long-wait formula.
    startup_to = float(os.environ.get("BENCH_STARTUP_WAIT", 0)) \
        or min(280.0, max(60.0, _left() - 150.0))
    try:
        _bounded(_warm_probe, startup_to, "sync-probe warmup")
    except _FetchTimeout as e:
        _log(f"startup wedged ({e}); exiting for supervisor retry")
        os._exit(3)
    if _left() > 300.0:
        try:
            _META["warp_smooth_path"] = _bounded(
                _probe_smooth_warp, 120.0, "smooth-warp probe")
        except _FetchTimeout as e:
            _log(f"smooth-warp probe wedged ({e}); exiting for retry")
            os._exit(3)
    else:
        # under a tight budget skip the 120 s probe: the smooth path has
        # been validated on this hardware (docs/evidence/
        # bench_scan_2026-08-19_r5.log, warp_smooth_path: true), so assume
        # it and keep the artifact route; a Mosaic regression would surface
        # as a compile error -> live-trace fallback in bench_workload
        _META["warp_smooth_path"] = "assumed"
        _log("skipping smooth-warp probe (tight budget); assuming validated")

    # leave room for the workloads that follow each one
    reserves = {"sde_supervised": 190.0, "exp212_pad_online": 60.0,
                "exp210_depthcomp": 15.0}
    failed = []
    for name, model_cfg, step_cfg, batch_size, with_ema, steady in _step_cfgs():
        try:
            bench_workload(name, model_cfg, step_cfg, batch_size,
                           with_ema=with_ema, steady=steady,
                           reserve_s=reserves[name])
        except Exception as e:  # one broken workload must not cost the rest
            _log(f"{name}: FAILED {type(e).__name__}: {e}")
            failed.append(name)
            with _LOCK:
                _RESULTS.setdefault(name, {})["error"] = (
                    f"{type(e).__name__}: {e}"[:300])

    timer.cancel()
    print(_emit_line(partial=False,
                     note=(f"workloads errored: {','.join(failed)}"
                           if failed else None)), flush=True)
    # prefer a CLEAN exit (proper backend teardown keeps the relay healthy
    # for the next process — abrupt exits poison its session grace period),
    # but bound it: an abandoned wedged fetch thread (see _bounded) can
    # block jax's atexit client shutdown forever
    t = threading.Timer(15.0, lambda: os._exit(0))
    t.daemon = True
    t.start()


def _supervise():
    """Parent mode (no jax touched): run the bench as a child process,
    retry on a startup wedge, and ALWAYS print exactly one JSON line.

    The relay failure modes this covers (all observed 2026-08-19):
      exit 3       child detected a wedged startup (see main) — retry
      crash        an unexpected exception — retry with remaining budget
      silent wedge child's own watchdog prints a partial line and exits 0
    The child snapshots results after every completed mode (_write_snapshot),
    so even a SIGKILLed child leaves the best-so-far line behind.

    Startup-wait ladder (round-4 postmortem: two attempts, 280 s + 60 s,
    spent the whole window waiting and measured nothing): first try a wait
    that covers the commonly observed ~140-190 s session-grace clear, then
    one full 280 s grace period, then keep trying mid-length waits while
    budget remains — up to 5 attempts instead of 2."""
    import subprocess

    t_end = _T0 + DEADLINE_S
    snap = f"/tmp/bench_snap_{os.getpid()}.json"
    startup_waits = (160.0, 280.0, 200.0, 200.0, 200.0)

    def snap_line():
        try:
            with open(snap) as f:
                return f.read().strip() or None
        except OSError:
            return None

    last_line = None
    for attempt in range(len(startup_waits)):
        left = t_end - time.time()
        if left < 60:
            break
        env = dict(os.environ)
        env["BENCH_CHILD"] = "1"
        env["BENCH_SNAPSHOT"] = snap
        env["BENCH_DEADLINE_S"] = str(max(45.0, left - 8.0))
        env["BENCH_STARTUP_WAIT"] = str(
            max(45.0, min(startup_waits[attempt], left - 110.0)))
        _log(f"supervisor: attempt {attempt + 1}, budget {left:.0f}s, "
             f"startup wait {float(env['BENCH_STARTUP_WAIT']):.0f}s")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                stdout=subprocess.PIPE, env=env, text=True,
                timeout=max(50.0, left - 4.0))
        except subprocess.TimeoutExpired as e:
            _log("supervisor: child overran its budget; killed")
            last_line = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            break
        out = (proc.stdout or "").strip().splitlines()
        if out:
            last_line = out[-1]
        if proc.returncode == 3:
            continue  # startup wedge — a fresh process often succeeds
        if proc.returncode != 0:
            _log(f"supervisor: child rc={proc.returncode}; retrying")
            continue
        try:
            has_data = json.loads(last_line).get("value", 0) > 0
        except Exception:
            has_data = False
        if has_data or t_end - time.time() < 120:
            break
        _log("supervisor: clean exit but no data; retrying")

    line = None
    for cand in (last_line, snap_line()):
        try:
            if cand and json.loads(cand).get("value", 0) > 0:
                line = cand
                break
            line = line or cand
        except Exception:
            pass
    print(line or _emit_line(partial=True, note="all attempts wedged"),
          flush=True)


if __name__ == "__main__":
    # Single-core host: a sibling CPU hog (test suite, the driver's own
    # tooling) can starve this client's relay RPC pump — observed
    # 2026-08-19 as repeated startup sync-probe "wedges" while a pytest
    # run held 93% of the core. Priority is inherited by the child.
    try:
        os.nice(-10)
    except OSError:
        pass
    if os.environ.get("BENCH_CHILD", ""):
        main()
    else:
        _supervise()
