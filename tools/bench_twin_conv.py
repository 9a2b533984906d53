"""Hypothesis gate for batching the twin U-Net decoders (depth + seg unet).

The supervised step runs two structurally-identical dec6 U-Nets with
different weights (models/joint.py depth decoder + seg_decoder.py unet_dec)
— the two weakest conv components in the roofline table
(docs/profile_r03.md: 28%/37% of peak). If XLA lowers a vmapped
(twin-stacked kernels) conv as well as one 2x-batch conv, merging the
decoders via jax.vmap over stacked params would halve dispatches and
improve tiling; if it lowers to a slow batch_group_count form, the
refactor is dead on arrival. This measures exactly that, per decoder-stage
shape, with the scan-chained protocol from docs/DESIGN.md (the axon relay
caches (executable, inputs) pairs — a data dependence between iterations
defeats it).

Usage: python tools/bench_twin_conv.py [iters=30]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

# (H, W, C_in, C_out): dec6 U-Net stage shapes at bs8 512^2 (stage i
# upconv_i_1 after up2; see models/depth_decoder.py channel table)
STAGES = [
    (32, 32, 1280, 256),   # stage 4 concat conv (post-ASPP + f3 skip)
    (64, 64, 768, 256),    # stage 3 fused conv
    (128, 128, 384, 128),  # stage 2
    (256, 256, 192, 128),  # stage 1
    (256, 256, 1024, 256),  # stage 0 packed form (4*C domain, quarter area)
]
B = 8
DT = jnp.bfloat16

_SYNC = None  # separate probe executable — the relay's one honest sync


def _sync(v) -> float:
    """Force completion via a SEPARATE trivial executable (bench.py
    _sync_fetch rules: block_until_ready/device_get lie around an
    executable's first in-flight execution on the tunneled relay)."""
    global _SYNC
    if _SYNC is None:
        _SYNC = jax.jit(lambda s: s * 1.0)
    return float(jax.device_get(_SYNC(v)))


def timed(fn, x, iters):
    """Scan-chain iterations through a data dependence; time whole windows
    ended by the probe executable, with the probe's own overhead subtracted.
    Two windows on DIFFERENT input values (the relay replay cache is
    value-keyed) must agree within 20% or the reading is flagged."""

    def body(c, _):
        y = fn(c)
        # fold the output back into an input-shaped carry (keeps the chain)
        c = c + 0.0 * jnp.mean(y).astype(c.dtype)
        return c, ()

    @jax.jit
    def run(x):
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(c.astype(jnp.float32))

    _sync(run(x))  # compile + warm (first in-flight execution)
    # probe overhead on a ready value, then two salted timed windows
    v = run(x + 3.0)
    _sync(v)
    t0 = time.perf_counter()
    _sync(v)
    probe = time.perf_counter() - t0
    dts = []
    for i in (4.0, 5.0):
        t0 = time.perf_counter()
        _sync(run(x + i))
        dts.append(time.perf_counter() - t0 - probe)
    a, b = (d / iters for d in dts)
    if abs(a - b) / min(a, b) > 0.20:
        print(f"    !! windows disagree: {a * 1e3:.3f} vs {b * 1e3:.3f} ms",
              file=sys.stderr)
    return (a + b) / 2.0


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    # process-unique salt: the relay replay cache is value-keyed across
    # processes — a deterministic key would replay a previous run's results
    rng = jax.random.PRNGKey((os.getpid() << 16)
                             ^ (int(time.time()) & 0x7FFFFFFF))
    print(f"{'stage shape':28s} {'2x separate':>12s} {'vmap-twin':>12s} "
          f"{'2x-batch':>12s}  (ms, fwd only)")
    for (h, w, ci, co) in STAGES:
        k1, k2, k3 = jax.random.split(rng, 3)
        x = jax.random.normal(k1, (B, h, w, ci), DT)
        ker = jax.random.normal(k2, (3, 3, ci, co), DT)
        ker2 = jax.random.normal(k3, (2, 3, 3, ci, co), DT)

        def conv(x, k=ker):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # (a) two separate convs (current structure)
        def two(x):
            return conv(x) + conv(x, ker2[1])

        # (b) vmapped twin: stacked kernels, stacked inputs
        xs = jnp.stack([x, x])

        vconv = jax.vmap(lambda xx, kk: jax.lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))

        def twin(x2):
            return vconv(x2, ker2)

        # (c) one conv at 2x batch (upper bound: shared weights)
        x2b = jnp.concatenate([x, x])

        t_two = timed(two, x, iters) * 1e3
        t_twin = timed(twin, xs, iters) * 1e3
        t_2b = timed(conv, x2b, iters) * 1e3
        print(f"{h}x{w} {ci:5d}->{co:4d}          {t_two:12.3f} "
              f"{t_twin:12.3f} {t_2b:12.3f}")


if __name__ == "__main__":
    main()
