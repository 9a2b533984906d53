"""ReduceLROnPlateau host controller semantics."""

import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.engine.trainer import Trainer


class _Shim:
    """Minimal object exposing the pieces _plateau_step touches."""

    _plateau_step = Trainer._plateau_step

    def __init__(self):
        import logging

        self.plateau = {"factor": 0.1, "patience": 2, "best": -float("inf"), "count": 0}
        self.logger = logging.getLogger("test")

        class _S:
            lr_scale = jnp.asarray(1.0)

            def replace(self, lr_scale):
                s = _S()
                s.lr_scale = lr_scale
                return s

        self.state = _S()


def test_plateau_reduces_after_patience():
    t = _Shim()
    t._plateau_step(0.5)   # new best
    t._plateau_step(0.4)   # 1
    t._plateau_step(0.4)   # 2
    assert float(t.state.lr_scale) == 1.0
    t._plateau_step(0.4)   # 3 > patience -> reduce
    assert abs(float(t.state.lr_scale) - 0.1) < 1e-6
    t._plateau_step(0.9)   # new best resets
    assert t.plateau["count"] == 0
