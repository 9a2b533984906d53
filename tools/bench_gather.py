"""Microbench TPU gather formulations for the warp's 4-corner fetch."""

import time

import jax
import jax.numpy as jnp
import numpy as np

N, H, W, C = 8, 512, 512, 3
HW = H * W
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, HW, (N, HW)).astype(np.int32))


# vary inputs per call: the tunnel caches identical executions
IDXS = [jnp.asarray(rng.integers(0, HW, (N, HW)).astype(np.int32)) for _ in range(10)]


def timeit(name, fn, img_, n=30):
    out = jax.block_until_ready(fn(img_, IDXS[0]))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(img_, IDXS[i % len(IDXS)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)


@jax.jit
def g_take_along(img, idx):
    flat = img.reshape(N, HW, C)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


@jax.jit
def g_take_along_c4(img, idx):
    flat = jnp.pad(img, [(0, 0), (0, 0), (0, 0), (0, 1)]).reshape(N, HW, 4)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


@jax.jit
def g_per_channel(img, idx):
    flat = img.reshape(N, HW, C)
    return jnp.stack([jnp.take_along_axis(flat[..., c], idx, axis=1) for c in range(C)], -1)


@jax.jit
def g_global_take(img, idx):
    flat = img.reshape(N * HW, C)
    gidx = idx + (jnp.arange(N)[:, None] * HW)
    return jnp.take(flat, gidx.reshape(-1), axis=0).reshape(N, HW, C)


@jax.jit
def g_bf16(img, idx):
    flat = img.astype(jnp.bfloat16).reshape(N, HW, C)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


@jax.jit
def g_vmap_rows(img, idx):
    # gather whole rows then columns: 2-stage (row gather (N,HW)->rows of W*C)
    yi = idx // W
    xi = idx % W
    rows = jnp.take_along_axis(img.reshape(N, H, W * C), yi[..., None], axis=1)
    rows = rows.reshape(N, HW, W, C)
    return jnp.take_along_axis(rows, xi[..., None, None], axis=2)[:, :, 0]


timeit("take_along_axis (N,HW,3)", g_take_along, img)
timeit("take_along_axis (N,HW,4)", g_take_along_c4, img)
timeit("per-channel 2D gathers", g_per_channel, img)
timeit("global flat take", g_global_take, img)
timeit("bf16 take_along_axis", g_bf16, img)


GRIDS = [jnp.asarray(rng.uniform(-1.1, 1.1, (N, H, W, 2)).astype(np.float32))
         for _ in range(10)]


def _indices(grid):
    gx = grid[..., 0]
    gy = grid[..., 1]
    ix = jnp.clip((gx + 1.0) * 0.5 * (W - 1), -1.0, float(W))
    iy = jnp.clip((gy + 1.0) * 0.5 * (H - 1), -1.0, float(H))
    x0 = jnp.clip(jnp.floor(ix), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, H - 1).astype(jnp.int32)
    return (y0 * W + x0).reshape(N, HW)


@jax.jit
def g_computed_idx(img, grid):
    idx = _indices(grid)
    flat = img.reshape(N, HW, C)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


@jax.jit
def g_computed_idx_barrier(img, grid):
    idx = jax.lax.optimization_barrier(_indices(grid))
    flat = img.reshape(N, HW, C)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def timeit_grid(name, fn, n=30):
    out = jax.block_until_ready(fn(img, GRIDS[0]))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(img, GRIDS[i % len(GRIDS)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)


timeit_grid("computed-idx gather (fused)", g_computed_idx)
timeit_grid("computed-idx gather (barrier)", g_computed_idx_barrier)


from improving_segmentation_with_selfsupervised_depth_tpu.ops.resample import (
    grid_sample,
    grid_sample_nograd_image,
)

timeit_grid("grid_sample (full bilinear)", jax.jit(grid_sample))
timeit_grid("grid_sample_nograd_image", jax.jit(grid_sample_nograd_image))


@jax.jit
def warp_like_photometric(img, grid):
    # mimic generate_images_pred inner loop for ONE scale/frame
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.geometry import (
        backproject_depth, project_3d, disp_to_depth,
    )
    disp = jnp.clip(grid[..., :1] * 0.5 + 0.5, 0.01, 0.99)
    _, depth = disp_to_depth(disp, 0.1, 100.0)
    K = jnp.broadcast_to(jnp.eye(4), (N, 4, 4)).at[:, 0, 0].set(500.0).at[:, 1, 1].set(500.0)
    inv_K = jnp.linalg.inv(K)
    pts = backproject_depth(depth, inv_K)
    pix = project_3d(pts, K, jnp.broadcast_to(jnp.eye(4), (N, 4, 4)), H, W)
    return grid_sample_nograd_image(img, pix)


timeit_grid("backproject+project+warp (1 scale)", warp_like_photometric)
