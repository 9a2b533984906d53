"""Isolated Pallas warp-kernel cost vs grid smoothness (scan-chained).

Measures bilinear_warp_corners_nchw at the flagship call shape (8 images x
4 grids, 512x512x3) for synthetic grids of controlled roughness:
  identity+shift (settled training regime), +- uniform noise of increasing
  amplitude (mid-training), and uniform-random scatter (init transient).

Protocol: scan-chain a data dependence through `reps` kernel calls inside
one jit so the axon relay cannot serve cached executions (docs/DESIGN.md).

Usage: python tools/bench_warp_kernel.py [reps=20]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas.warp import (
    bilinear_warp_corners_nchw,
)

N, H, W, C, REPS_GRIDS = 8, 512, 512, 3, 4


def grids(mode: str, key):
    m = N * REPS_GRIDS
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ix = jnp.broadcast_to(xx, (m, H, W))
    iy = jnp.broadcast_to(yy, (m, H, W))
    if mode == "identity":
        # +-1e-3 px jitter: keeps spans identical but makes each key's grid
        # a distinct input (the axon relay caches identical executions)
        j = jax.random.uniform(key, (m, H, W), minval=-1e-3, maxval=1e-3)
        return ix + 3.3 + j, iy + 1.7 + j
    if mode.startswith("noise"):
        amp = float(mode[5:])
        kx, ky = jax.random.split(key)
        return (ix + jax.random.uniform(kx, (m, H, W), minval=-amp, maxval=amp),
                iy + jax.random.uniform(ky, (m, H, W), minval=-amp, maxval=amp))
    if mode == "random":
        kx, ky = jax.random.split(key)
        return (jax.random.uniform(kx, (m, H, W), maxval=float(W)),
                jax.random.uniform(ky, (m, H, W), maxval=float(H)))
    raise ValueError(mode)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (N, H, W, C), jnp.float32)

    @jax.jit
    def chain(img, ix, iy):
        def body(carry, _):
            img, ix = carry
            out, dfx, dfy = bilinear_warp_corners_nchw(img, ix, iy,
                                                       reps=REPS_GRIDS)
            # data dependence: perturb ix by a tiny amount of the output
            d = out[0, 0, 0, 0] * 1e-7
            return (img, ix + d), out[0, 0, 0, 0]
        (_, _), outs = jax.lax.scan(body, (img, ix), None, length=reps)
        return outs

    for mode in ["identity", "noise2", "noise8", "noise32", "random"]:
        ix, iy = grids(mode, jax.random.fold_in(key, 1))
        chain(img, ix, iy).block_until_ready()  # compile + warm
        # the axon relay caches (executable, inputs) executions — time with
        # FRESH inputs (same shapes) so the call actually runs on-device
        ix2, iy2 = grids(mode, jax.random.fold_in(key, 2))
        t0 = time.time()
        chain(img, ix2, iy2).block_until_ready()
        dt = (time.time() - t0) / reps * 1000
        print(f"{mode:10s} {dt:7.2f} ms/call  ({dt/REPS_GRIDS/N*1000:6.1f} us/img-grid)")


if __name__ == "__main__":
    main()
