"""Direct unit tests of EarlyStopping patience/min_delta/cumulative_delta
semantics (reference utils/early_stopping.py:3-52)."""

import pytest

from improving_segmentation_with_selfsupervised_depth_tpu.engine.early_stopping import (
    EarlyStopping,
)


def test_validates_args():
    with pytest.raises(ValueError):
        EarlyStopping(patience=0)
    with pytest.raises(ValueError):
        EarlyStopping(patience=3, min_delta=-0.1)


def test_stops_after_patience_non_improving_evals():
    es = EarlyStopping(patience=2)
    assert es.step(0.5)      # first score: becomes best
    assert es.step(0.5)      # equal = no improvement (1/2)
    assert not es.step(0.4)  # 2/2 -> stop


def test_improvement_resets_counter():
    es = EarlyStopping(patience=2)
    assert es.step(0.5)
    assert es.step(0.4)      # 1/2
    assert es.step(0.6)      # improvement: counter back to 0
    assert es.step(0.6)      # 1/2
    assert not es.step(0.6)  # 2/2 -> stop


def test_min_delta_gate():
    # a gain of exactly min_delta does NOT count as improvement
    es = EarlyStopping(patience=2, min_delta=0.1)
    assert es.step(0.5)
    assert es.step(0.6)      # +0.1 <= min_delta: 1/2 ... but best moves to 0.6
    assert es.best_score == pytest.approx(0.6)
    assert not es.step(0.65)  # +0.05 vs new best: 2/2 -> stop


def test_non_cumulative_best_tracks_small_gains():
    # default mode: best advances on any strict gain, so repeated sub-delta
    # gains never clear the bar
    es = EarlyStopping(patience=10, min_delta=0.2)
    assert es.step(0.0)
    for i in range(1, 10):
        alive = es.step(i * 0.1)  # each +0.1 < 0.2 over the moving best
        assert alive == (i < 10)
    assert es.counter == 9


def test_cumulative_delta_lets_gains_accumulate():
    # cumulative mode: best frozen until a qualifying jump, so +0.1 steps
    # accumulate to beat min_delta=0.2 measured from the frozen best
    es = EarlyStopping(patience=3, cumulative_delta=True, min_delta=0.2)
    assert es.step(0.0)
    assert es.step(0.1)      # 1/3, best stays 0.0
    assert es.best_score == pytest.approx(0.0)
    assert es.step(0.25)     # +0.25 > 0.2: improvement, reset
    assert es.counter == 0
    assert es.best_score == pytest.approx(0.25)


def test_first_score_never_counts_against_patience():
    es = EarlyStopping(patience=1)
    assert es.step(-1.0)
    assert not es.step(-2.0)
