"""Async checkpoint writes: atomicity, ordering, and equality with sync."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from improving_segmentation_with_selfsupervised_depth_tpu.engine import checkpoints
from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import TrainState


def _tiny_state(seed: int) -> TrainState:
    params = {"w": jnp.full((4, 4), float(seed)), "b": jnp.zeros((4,))}
    tx = optax.sgd(0.1, momentum=0.9)
    return TrainState(step=jnp.asarray(seed), params=params, batch_stats={},
                      opt_state=tx.init(params), ema_params=None,
                      lr_scale=jnp.asarray(1.0))


def test_async_save_matches_sync_and_is_atomic(tmp_path):
    sync_dir, async_dir = str(tmp_path / "s"), str(tmp_path / "a")
    state = _tiny_state(3)
    checkpoints.save_resume(sync_dir, state, 0.5)
    path = checkpoints.save_resume(async_dir, state, 0.5, async_write=True)
    checkpoints.wait_for_saves()
    assert not os.path.exists(path + ".tmp")  # atomic rename, no torn file
    with open(path, "rb") as fa, \
            open(os.path.join(sync_dir, "best_model.msgpack"), "rb") as fs:
        assert fa.read() == fs.read()


def test_async_save_survives_buffer_donation(tmp_path):
    """The trainer jits its step with donate_argnums=(0,) (parallel/mesh.py),
    so the step AFTER an async save deletes the saved state's device buffers.
    The save must host-gather synchronously; this test fails on a writer that
    reads device arrays on the background thread ("Array has been deleted")."""
    d = str(tmp_path / "don")
    state = _tiny_state(5)

    donating_step = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x + 1.0, p),
        donate_argnums=(0,))

    path = checkpoints.save_resume(d, state, 0.25, async_write=True)
    # donate the params + opt_state buffers immediately, like the real loop
    _ = donating_step(state.params)
    _ = donating_step({"opt": state.opt_state})
    checkpoints.wait_for_saves()  # re-raises writer failures
    restored, step, best = checkpoints.load_resume(path, _tiny_state(0))
    assert step == 5 and abs(best - 0.25) < 1e-6
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 5.0, np.float32))


def test_wait_for_saves_reraises_writer_errors(tmp_path, monkeypatch):
    d = str(tmp_path / "err")
    state = _tiny_state(2)

    def boom(payload):
        raise OSError("disk full")

    monkeypatch.setattr(checkpoints.serialization, "to_bytes", boom)
    checkpoints.save_resume(d, state, 0.1, async_write=True)
    try:
        checkpoints.wait_for_saves()
        raised = False
    except RuntimeError as e:
        raised = isinstance(e.__cause__, OSError)
    assert raised, "writer exception must surface through wait_for_saves"
    # the error is consumed: a second wait is clean
    checkpoints.wait_for_saves()


def test_async_saves_are_ordered_and_load_joins(tmp_path):
    d = str(tmp_path / "o")
    # two back-to-back async saves: the second must land last (the reader
    # sees step=9), and load_resume must join the in-flight write itself
    checkpoints.save_resume(d, _tiny_state(1), 0.1, async_write=True)
    checkpoints.save_resume(d, _tiny_state(9), 0.9, async_write=True)
    fresh = _tiny_state(0)
    restored, step, best = checkpoints.load_resume(
        os.path.join(d, "best_model.msgpack"), fresh)
    assert step == 9 and abs(best - 0.9) < 1e-6
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 9.0, np.float32))
