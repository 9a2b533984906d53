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
