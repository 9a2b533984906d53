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
