"""Isolate photometric-loss fwd+bwd cost; compare per-scale vs batched warps."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.ops import photometric
from improving_segmentation_with_selfsupervised_depth_tpu.ops.geometry import (
    backproject_depth,
    disp_to_depth,
    project_3d,
    transformation_from_parameters,
)
from improving_segmentation_with_selfsupervised_depth_tpu.ops.resample import grid_sample
from improving_segmentation_with_selfsupervised_depth_tpu.ops.resize import resize_bilinear
from improving_segmentation_with_selfsupervised_depth_tpu.ops.photometric import key_of

H = W = 512
BATCH = 8
SCALES = (0, 1, 2, 3)
FRAMES = (0, -1, 1)

batch = {k: jnp.asarray(v) for k, v in
         make_synthetic_batch(BATCH, H, W, frame_ids=FRAMES, num_scales=4).items()}
rng = np.random.default_rng(0)
disps = {s: jnp.asarray(rng.uniform(0.01, 0.99,
                                    (BATCH, H // 2**s, W // 2**s, 1)).astype(np.float32))
         for s in SCALES}
poses = {}
for f in (-1, 1):
    aa = jnp.asarray(rng.standard_normal((BATCH, 3)).astype(np.float32) * 0.01)
    tr = jnp.asarray(rng.standard_normal((BATCH, 3)).astype(np.float32) * 0.01)
    poses[f] = (aa, tr)


def loss_v0(params, no_ssim=False, skip_warp=False, stop_grid=False):
    outputs = {key_of("disp", s): params[f"disp_{s}"] for s in SCALES}
    for f in (-1, 1):
        aa, tr = params[f"pose_{f}"]
        outputs[key_of("cam_T_cam", 0, f)] = transformation_from_parameters(
            aa, tr, invert=f < 0)
    if skip_warp:
        # replace each warp with a cheap elementwise proxy: isolates gather cost
        for s in SCALES:
            disp = resize_bilinear(outputs[key_of("disp", s)], (H, W), align_corners=False)
            _, depth = disp_to_depth(disp, 0.1, 100.0)
            outputs[key_of("depth", 0, s)] = depth
            for f in (-1, 1):
                T = outputs[key_of("cam_T_cam", 0, f)]
                scale_fac = (depth * 1e-3 + T[:, 0, 0].reshape(-1, 1, 1, 1))
                outputs[key_of("color_pred", f, s)] = batch[key_of("color", f, 0)] * scale_fac
    elif stop_grid:
        from improving_segmentation_with_selfsupervised_depth_tpu.ops.resample import (
            grid_sample_nograd_image,
        )
        for s in SCALES:
            disp = resize_bilinear(outputs[key_of("disp", s)], (H, W), align_corners=False)
            _, depth = disp_to_depth(disp, 0.1, 100.0)
            outputs[key_of("depth", 0, s)] = depth
            cam_points = backproject_depth(depth, batch[key_of("inv_K", 0)])
            for f in (-1, 1):
                T = outputs[key_of("cam_T_cam", 0, f)]
                pix = project_3d(cam_points, batch[key_of("K", 0)], T, H, W)
                pix = jax.lax.stop_gradient(pix)  # no grad through the grid
                outputs[key_of("color_pred", f, s)] = grid_sample_nograd_image(
                    jax.lax.stop_gradient(batch[key_of("color", f, 0)]), pix)
    else:
        outputs = photometric.generate_images_pred(
            batch, outputs, scales=SCALES, frame_ids=FRAMES, min_depth=0.1, max_depth=100.0)
    losses = photometric.compute_losses(
        jax.random.PRNGKey(0), batch, outputs, scales=SCALES, frame_ids=FRAMES,
        disparity_smoothness=1e-3, no_ssim=no_ssim)
    return losses["loss"]


def loss_v1(params):
    """Batched warps: one grid_sample over (scales x frames) stacked batch."""
    full = (H, W)
    target = batch[key_of("color", 0, 0)]
    depths = {}
    grids = []
    srcs = []
    for s in SCALES:
        disp = resize_bilinear(params[f"disp_{s}"], full, align_corners=False)
        _, depth = disp_to_depth(disp, 0.1, 100.0)
        depths[s] = depth
        cam_points = backproject_depth(depth, batch[key_of("inv_K", 0)])
        for f in (-1, 1):
            aa, tr = params[f"pose_{f}"]
            T = transformation_from_parameters(aa, tr, invert=f < 0)
            grids.append(project_3d(cam_points, batch[key_of("K", 0)], T, H, W))
            srcs.append(batch[key_of("color", f, 0)])
    big_grid = jnp.concatenate(grids, axis=0)
    big_src = jnp.concatenate(srcs, axis=0)
    warped = grid_sample(big_src, big_grid)
    warped = warped.reshape(len(SCALES), 2, BATCH, H, W, 3)

    identity = jnp.concatenate(
        [photometric.reprojection_loss(batch[key_of("color", f, 0)], target)
         for f in (-1, 1)], axis=-1)
    total = 0.0
    key = jax.random.PRNGKey(0)
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.image import (
        smoothness_loss,
    )

    for si, s in enumerate(SCALES):
        reproj = jnp.concatenate(
            [photometric.reprojection_loss(warped[si, fi], target) for fi in range(2)],
            axis=-1)
        key, sub = jax.random.split(key)
        ident = identity + jax.random.normal(sub, identity.shape) * 1e-5
        combined = jnp.concatenate([ident, reproj], axis=-1)
        loss = jnp.mean(jnp.min(combined, axis=-1))
        disp = params[f"disp_{s}"]
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        loss += 1e-3 * smoothness_loss(disp / (mean_disp + 1e-7),
                                       batch[key_of("color", 0, s)]) / (2**s)
        total += loss
    return total / len(SCALES)


params = {**{f"disp_{s}": disps[s] for s in SCALES},
          **{f"pose_{f}": poses[f] for f in (-1, 1)}}

which = sys.argv[1] if len(sys.argv) > 1 else "v0"
import functools


def warp_fwd_only(params):
    outputs = {key_of("disp", s): params[f"disp_{s}"] for s in SCALES}
    for f in (-1, 1):
        aa, tr = params[f"pose_{f}"]
        outputs[key_of("cam_T_cam", 0, f)] = transformation_from_parameters(aa, tr, invert=f < 0)
    outputs = photometric.generate_images_pred(
        batch, outputs, scales=SCALES, frame_ids=FRAMES, min_depth=0.1, max_depth=100.0)
    return sum(jnp.sum(outputs[key_of("color_pred", f, s)])
               for s in SCALES for f in (-1, 1))


def proj_fwd_only(params):
    outputs = {key_of("disp", s): params[f"disp_{s}"] for s in SCALES}
    for f in (-1, 1):
        aa, tr = params[f"pose_{f}"]
        outputs[key_of("cam_T_cam", 0, f)] = transformation_from_parameters(aa, tr, invert=f < 0)
    tot = 0.0
    for s in SCALES:
        disp = resize_bilinear(outputs[key_of("disp", s)], (H, W), align_corners=False)
        _, depth = disp_to_depth(disp, 0.1, 100.0)
        cam_points = backproject_depth(depth, batch[key_of("inv_K", 0)])
        for f in (-1, 1):
            T = outputs[key_of("cam_T_cam", 0, f)]
            tot += jnp.sum(project_3d(cam_points, batch[key_of("K", 0)], T, H, W))
    return tot
fn = {"v0": loss_v0, "v1": loss_v1,
      "v0_nossim": functools.partial(loss_v0, no_ssim=True),
      "v0_nowarp": functools.partial(loss_v0, skip_warp=True),
      "v0_stopgrid": functools.partial(loss_v0, stop_grid=True),
      "warp_fwd": warp_fwd_only,
      "proj_fwd": proj_fwd_only,
      "loss_fwd": loss_v0}[which]
if which.endswith("_fwd"):
    g = jax.jit(lambda p: (fn(p), p))
else:
    g = jax.jit(jax.value_and_grad(fn))
out = g(params)
jax.block_until_ready(out[0])
N = 20
t0 = time.perf_counter()
val = None
p = params
for i in range(N):
    val, grads = g(p)
    # perturb to defeat any result caching
    if which.endswith("_fwd"):
        p = jax.tree_util.tree_map(lambda a: a * (1.0 + 1e-9), p)
    else:
        p = jax.tree_util.tree_map(lambda a, b: a + 1e-12 * b, p, grads)
jax.block_until_ready(val)
dt = (time.perf_counter() - t0) / N
print(f"photometric {which}: {dt * 1000:.1f} ms (fwd+bwd, bs{BATCH})", flush=True)
