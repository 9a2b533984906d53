"""DepthMix/ClassMix mask + mixing semantics (reference train.py:572-642,
loader/transformsgpu.py, loader/transformmasks.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from improving_segmentation_with_selfsupervised_depth_tpu.ops.mixing import (
    depthhist_thresholds,
    generate_class_mask,
    generate_depth_mask,
    generate_depthcomp_mask,
    mix,
)


def test_mix_blends_with_next_in_batch():
    data = jnp.asarray(np.stack([np.zeros((4, 4, 3)), np.ones((4, 4, 3))]).astype(np.float32))
    mask = jnp.asarray(np.array([np.ones((4, 4)), np.zeros((4, 4))], np.float32))
    mixed, _ = mix(mask, data=data)
    # sample 0: mask 1 -> keeps itself (zeros); sample 1: mask 0 -> takes next (wraps to 0 -> zeros)
    np.testing.assert_array_equal(np.asarray(mixed[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(mixed[1]), 0.0)
    half = jnp.asarray(np.full((2, 4, 4), 0.5, np.float32))
    mixed, tgt = mix(half, data=data, target=data)
    np.testing.assert_allclose(np.asarray(mixed), 0.5)
    np.testing.assert_allclose(np.asarray(tgt), 0.5)


def test_generate_class_mask_selects_half_of_present_classes():
    rng = np.random.default_rng(0)
    lbl = rng.integers(0, 6, (2, 32, 32)).astype(np.int32)
    lbl[:, :4] = 250  # ignore region
    m = np.asarray(generate_class_mask(jax.random.PRNGKey(0), jnp.asarray(lbl), 19, 250))
    assert m.shape == lbl.shape
    assert set(np.unique(m)) <= {0.0, 1.0}
    # ignore pixels never selected
    assert m[:, :4].max() == 0.0
    for i in range(2):
        present = np.unique(lbl[i][lbl[i] != 250])
        selected = np.unique(lbl[i][(m[i] == 1)])
        k = (len(present) - len(present) % 2) // 2
        assert len(selected) == k
        # selection is class-consistent: every pixel of a selected class is 1
        for c in selected:
            assert np.all(m[i][lbl[i] == c] == 1.0)


def test_generate_depthcomp_mask_matches_reference_formula_bs2():
    rng = np.random.default_rng(1)
    disps = rng.uniform(0, 1, (2, 8, 8)).astype(np.float32)
    margin, ft = 0.03, 0.25
    m = np.asarray(generate_depthcomp_mask(jnp.asarray(disps), jax.random.PRNGKey(0),
                                           margin, ft))
    # reference formula (train.py:587-604) for pairs (0,1),(1,0)
    for i, o in [(0, 1), (1, 0)]:
        expected = ((disps[i] >= disps[o] - margin) & (disps[i] >= ft)).astype(np.float32)
        np.testing.assert_array_equal(m[i], expected)


def test_generate_depth_mask_band_and_threshold():
    d = jnp.asarray(np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 4, 4))
    m1 = np.asarray(generate_depth_mask(d, jnp.asarray(0.5)))
    np.testing.assert_array_equal(m1, (np.asarray(d) >= 0.5).astype(np.float32))
    m2 = np.asarray(generate_depth_mask(d, jnp.asarray(0.25), jnp.asarray(0.75)))
    ref = ((np.asarray(d) >= 0.25) & (np.asarray(d) <= 0.75)).astype(np.float32)
    np.testing.assert_array_equal(m2, ref)


def test_depthhist_thresholds_in_range():
    rng = np.random.default_rng(2)
    # bimodal depth map: near ground + far structures
    depth = np.concatenate([rng.uniform(0.05, 0.15, (2, 16, 16)),
                            rng.uniform(0.6, 0.9, (2, 16, 16))], axis=1).astype(np.float32)
    thr = np.asarray(depthhist_thresholds(jnp.asarray(depth), jax.random.PRNGKey(0)))
    assert thr.shape == (2,)
    assert np.all(thr >= depth.min() - 1e-3)
    assert np.all(thr <= depth.max() + 1e-3)
