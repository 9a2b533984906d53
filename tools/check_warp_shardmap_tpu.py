"""Hardware check: the REAL Pallas warp kernel under jax.shard_map on the
TPU backend (1-chip mesh, same code path as multi-chip).

Closes the evidence gap between "shard_map composition tested in interpret
mode on the CPU mesh" (tests/test_warp_shardmap.py) and "the kernel's Mosaic
lowering inside shard_map runs on real hardware": multi-chip jits wrap the
kernel in shard_map (ops/resample.py `_pallas_warp3`, pallas_call has no
GSPMD rule), and that wrapping is exercised here on the one available chip
via `configure_warp(force_shard_map=True)`.

Checks, all on the TPU backend:
  1. forward warp via shard_map(pallas kernel) vs the full-f32 XLA gather
     path (bf16 channel-pair rounding tolerance);
  2. grid gradient through the custom VJP with the shard_mapped kernel in
     the forward, vs the XLA path on a bf16-rounded image;
  3. the same two checks through `jax.jit` (the composition the train step
     actually compiles).

Usage: python tools/check_warp_shardmap_tpu.py   (requires the TPU backend;
appends a PASS/FAIL record suitable for docs/evidence/.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_segmentation_with_selfsupervised_depth_tpu.ops import resample


def main() -> int:
    if jax.default_backend() != "tpu":
        print("SKIP: TPU backend required, got", jax.default_backend())
        return 2
    dev = jax.devices()[0]
    mesh = jax.sharding.Mesh(np.asarray([dev]), ("data",))
    print(f"device: {dev.device_kind}; 1-chip mesh, axis 'data'")

    rng = np.random.default_rng(0)
    n, h, w, c = 8, 128, 512, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, (n, h, w, 2)).astype(np.float32))

    # reference: full-f32 XLA gather path
    resample.configure_warp("xla")
    ref = np.asarray(jax.jit(resample.grid_sample_nograd_image)(img, grid))
    img_bf16 = img.astype(jnp.bfloat16).astype(jnp.float32)

    def loss(g, im):
        return jnp.sum(resample.grid_sample_nograd_image(im, g) ** 2)

    gref = np.asarray(jax.jit(jax.grad(loss))(grid, img_bf16))

    # the multi-chip code path: shard_map(pallas kernel) on the real backend
    resample.configure_warp("pallas", mesh=mesh, force_shard_map=True)
    assert resample._pallas_dispatch(img, grid) == "shard_map"

    t0 = time.time()
    out = np.asarray(jax.jit(resample.grid_sample_nograd_image)(img, grid))
    t_fwd = time.time() - t0
    fwd_err = float(np.max(np.abs(out - ref)))

    t0 = time.time()
    gout = np.asarray(jax.jit(jax.grad(loss))(grid, img_bf16))
    t_grad = time.time() - t0
    # the grid gradient scales pixel diffs by ~(w-1)/2; bf16 corner rounding
    # (~4e-3 relative) therefore shows up at ~1e0 absolute on w=512
    grad_err = float(np.max(np.abs(gout - gref)))
    grad_rel = grad_err / max(1e-9, float(np.max(np.abs(gref))))

    ok = fwd_err < 5e-3 and grad_rel < 2e-2
    print(f"forward  max|err| {fwd_err:.2e} (tol 5e-3)   "
          f"compile+run {t_fwd:.1f}s")
    print(f"gradient max|err| {grad_err:.2e} rel {grad_rel:.2e} "
          f"(tol 2e-2)   compile+run {t_grad:.1f}s")
    print(("PASS" if ok else "FAIL") +
          ": real Pallas warp under shard_map on the TPU backend "
          f"(Mosaic lowering, 1-chip mesh, shapes {img.shape}/{grid.shape})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
