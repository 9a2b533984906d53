"""Loss-landscape correctness: the photometric loss at the ground-truth
depth+pose must be far below the identity (zero-pose) value.

This guards the sign/convention chain disp -> depth -> backproject -> pose ->
project -> warp end-to-end: any sign or axis error would make the GT
configuration no better than identity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from improving_segmentation_with_selfsupervised_depth_tpu.ops import photometric
from improving_segmentation_with_selfsupervised_depth_tpu.ops.geometry import (
    transformation_from_parameters,
)
from improving_segmentation_with_selfsupervised_depth_tpu.ops.photometric import key_of
from improving_segmentation_with_selfsupervised_depth_tpu.ops.resample import grid_sample

H = W = 64
FX = FY = 100.0
Z = 10.0          # constant scene depth
TX = 0.5          # camera translation between frames (world units)
# image-space disparity shift: s = fx * tx / Z = 5 px


def _camera():
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = FX, FY
    K[0, 2], K[1, 2] = W / 2, H / 2
    return K


def _scene(seed=0):
    """Smooth random texture target + sources rendered by exact shifts."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (1, H // 4, W // 4, 3)).astype(np.float32)
    target = base.repeat(4, axis=1).repeat(4, axis=2)
    shift = FX * TX / Z  # px

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def render(px_shift):
        # source frame: the camera moved by tx, so source(x) = target(x - s)
        gx = (xs + px_shift) / (W - 1) * 2 - 1
        gy = ys / (H - 1) * 2 - 1
        grid = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))
        return np.asarray(grid_sample(jnp.asarray(target), grid))

    # frame -1: camera at -tx -> image content shifted by +s; frame +1: -s
    return target, {-1: render(+shift), 1: render(-shift)}


def _loss(disp_value, tx, inputs):
    outputs = {key_of("disp", 0): jnp.full((1, H, W, 1), disp_value, jnp.float32)}
    for f, t in ((-1, -tx), (1, tx)):
        aa = jnp.zeros((1, 3))
        tr = jnp.asarray([[t, 0.0, 0.0]], jnp.float32)
        outputs[key_of("cam_T_cam", 0, f)] = transformation_from_parameters(
            aa, tr, invert=(f < 0))
    outputs = photometric.generate_images_pred(
        inputs, outputs, scales=(0,), frame_ids=(0, -1, 1),
        min_depth=0.1, max_depth=100.0)
    losses = photometric.compute_losses(
        jax.random.PRNGKey(0), inputs, outputs, scales=(0,), frame_ids=(0, -1, 1),
        disparity_smoothness=0.0, disable_automasking=True)
    return float(losses["loss"])


def test_ground_truth_pose_and_depth_minimize_reprojection():
    target, sources = _scene()
    inputs = {
        key_of("color", 0, 0): jnp.asarray(target),
        key_of("color", -1, 0): jnp.asarray(sources[-1]),
        key_of("color", 1, 0): jnp.asarray(sources[1]),
        key_of("K", 0): jnp.asarray(_camera()[None]),
        key_of("inv_K", 0): jnp.asarray(np.linalg.inv(_camera())[None]),
    }
    # GT sigmoid disparity for depth Z: scaled_disp = 1/Z
    # scaled = 0.01 + (10 - 0.01) * d  =>  d = (1/Z - 0.01) / 9.99
    gt_disp = (1.0 / Z - 0.01) / 9.99

    loss_gt = _loss(gt_disp, TX, inputs)
    loss_zero_pose = _loss(gt_disp, 0.0, inputs)
    loss_wrong_depth = _loss(min(gt_disp * 4, 0.99), TX, inputs)
    loss_wrong_sign = _loss(gt_disp, -TX, inputs)

    # GT must beat the identity/zero-pose configuration decisively
    assert loss_gt < 0.5 * loss_zero_pose, (loss_gt, loss_zero_pose)
    # and beat wrong depth / wrong translation sign
    assert loss_gt < loss_wrong_depth, (loss_gt, loss_wrong_depth)
    assert loss_gt < loss_wrong_sign, (loss_gt, loss_wrong_sign)
    # near-perfect warp: tiny residual
    assert loss_gt < 0.02, loss_gt
