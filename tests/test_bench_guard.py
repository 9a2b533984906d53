"""Unit tests for bench.py's window-acceptance rule (fake timer, no device).

The rule (bench._measure_window docstring) exists because the tunneled-TPU
relay has two observed lying modes: replayed windows that finish faster than
the probe overhead (dt <= 0 or absurd MFU), and wedge-then-replay windows
that return plausible but stale times. The guard requires every reading to
be physically plausible AND cross-checked against a second agreeing window
before it is recorded unflagged.
"""

import bench


def _mfu(dt, flops=2.0e12):
    # mirror of bench_workload's stats(): MFU for a given per-step time
    return 100.0 * flops / dt / bench.V5E_PEAK


def _run(seq, budget_floor=0.0, left=lambda: 1e9, max_tries=6):
    it = iter(seq)
    return bench._measure_window(
        lambda i: next(it), _mfu, left, budget_floor,
        log=lambda m: None, max_tries=max_tries)


def test_plausible_rejects_negative_dt():
    # relay-replayed window faster than probe overhead -> negative dt whose
    # negative MFU must not pass the ceiling check (ADVICE r4, medium)
    assert not bench._plausible(-0.01, _mfu(-0.01))
    assert not bench._plausible(0.0, 0.0)
    assert not bench._plausible(None, 0.0)


def test_plausible_rejects_impossible_mfu():
    dt = 2.0e12 / (0.9 * bench.V5E_PEAK)  # 90% MFU reading
    assert _mfu(dt) > 60.0
    assert not bench._plausible(dt, _mfu(dt))
    dt = 2.0e12 / (0.3 * bench.V5E_PEAK)  # 30% MFU reading
    assert bench._plausible(dt, _mfu(dt))


def test_windows_agree_band():
    assert bench._windows_agree(0.100, 0.118)   # 18% apart
    assert not bench._windows_agree(0.100, 0.125)  # 25% apart
    assert bench._windows_agree(0.2, 0.2)


def test_two_agreeing_windows_confirm_with_mean():
    dt, tries, status = _run([0.200, 0.210])
    assert status == "confirmed" and tries == 2
    assert abs(dt - 0.205) < 1e-12


def test_implausible_window_retried_then_confirmed():
    dt, tries, status = _run([-0.005, 0.200, 0.205])
    assert status == "confirmed" and tries == 3
    assert abs(dt - 0.2025) < 1e-12


def test_disagreeing_windows_keep_latest_until_agreement():
    dt, tries, status = _run([0.200, 0.300, 0.310])
    assert status == "confirmed" and tries == 3
    assert abs(dt - 0.305) < 1e-12


def test_budget_exhaustion_returns_unconfirmed_single_reading():
    calls = []

    def left():
        return 10.0 if not calls else 0.0

    it = iter([0.200, 0.999])

    def time_one(i):
        calls.append(i)
        return next(it)

    dt, tries, status = bench._measure_window(
        time_one, _mfu, left, budget_floor=5.0, log=lambda m: None)
    assert status == "unconfirmed" and tries == 1 and dt == 0.200


def test_tries_exhaustion_prefers_last_plausible():
    # plausible but never-agreeing readings: flag unconfirmed, keep one
    dt, tries, status = _run([0.1, 0.2, 0.4, 0.8], max_tries=4)
    assert status == "unconfirmed" and tries == 4
    assert dt in (0.4, 0.8)


def test_all_wedged_returns_wedged():
    dt, tries, status = _run([None, None], max_tries=2)
    assert status == "wedged" and dt is None


def test_only_implausible_returns_invalid():
    neg = -0.001
    dt, tries, status = _run([neg, neg], max_tries=2)
    assert status == "invalid" and dt == neg


def test_wedge_between_good_windows_keeps_prev():
    dt, tries, status = _run([0.200, None, 0.204])
    assert status == "confirmed" and tries == 3
    assert abs(dt - 0.202) < 1e-12


def test_warm_state_home_cache_fallback(tmp_path, monkeypatch):
    # warm .npz files are gitignored; a fresh checkout before the driver's
    # end-of-round bench wipes the repo copy. The save must mirror to the
    # home cache and the load must fall back to it.
    import jax.numpy as jnp

    monkeypatch.setattr(bench, "ART_DIR", str(tmp_path / "art"))
    monkeypatch.setattr(bench, "WARM_CACHE_DIR", str(tmp_path / "cache"))
    (tmp_path / "art").mkdir()
    state = {"w": jnp.arange(4, dtype=jnp.float32).reshape(2, 2),
             "c": jnp.asarray(7, jnp.int32)}

    bench._save_warm_state("toy", state, steps=123)
    primary, cache = bench._warm_paths("toy")
    assert primary.startswith(str(tmp_path / "art"))
    for p in (primary, cache):
        assert bench.os.path.exists(p), p

    # wipe the repo-local copy (fresh checkout) -> cache still loads
    bench.os.remove(primary)
    loaded, steps = bench._load_warm_state("toy", state)
    assert steps == 123 and loaded is not None
    assert jnp.allclose(loaded["w"], state["w"])
    assert int(loaded["c"]) == 7 and loaded["c"].dtype == jnp.int32
