"""Bilinear image warp (grid_sample) — Pallas TPU kernel.

Why: the photometric loss warps each source frame at every scale
(8 warps/step at the flagship geometry). XLA lowers the 4-corner gather to
generic HBM gathers at ~7 ns/index — profiling showed 32 gather fusions
consuming ~480 ms of a 753 ms train step (14.6 ms per 2M-row gather,
tools/bench_gather2.py confirms 60-260 ms/warp for every XLA gather shape).

Design: TPU has no fast arbitrary gather, but Mosaic lowers
`jnp.take_along_axis(..., axis=-1)` on a (8, 128) tile to an in-register lane
shuffle. The kernel keeps the source plane in VMEM and, for each (8, 128)
output tile, computes the dynamic bounding box of the source rows/lane-tiles
its samples touch; each candidate source row costs one broadcast and two lane
shuffles (left/right x-corner) whose output covers the whole tile. Arbitrary
warps stay *exact* in indexing — wide scatter (random-init depth) just widens
the candidate loop.

Channel packing: pixel values are carried as bf16 PAIRS packed into 32-bit
lanes (channels padded to even count), so one shuffle+select chain fetches
two channels at once — ~1.8x less inner-loop work. Corner values are
therefore bf16; the reference itself warps in fp16 under torch.cuda.amp
(monodepth configs set amp: true and autocast covers F.grid_sample), and the
photometric loss consumes image values in [0, 1] where bf16 holds ~3
significant digits. The sampling indices and all blending/gradient math stay
f32. The XLA fallback path in ops/resample.py remains full f32.

Loop structure (measured in-step on v5e, bs8 512^2): one grid program per
(image, 8-row output band) covering ALL channel pairs — the sampling
indices are shared across pairs, so the per-tile index math, span
reductions and row-key compares are paid once and only the value
fetch/select repeats per pair. Inside: dynamic fori over x lane-tiles x
dynamic fori over 8-row source groups, 8-row static unroll.
Variants tried and rejected: one program per (image, pair, band) (round-2
shape: repeats index math per pair, ~15% slower); statically unrolled
lane-tile loop (faster isolated, slower in-step — real rough grids have
x-span ~2 of 4 tiles); batch-in-sublanes layout (3x slower: it forfeits
the one-shuffle-per-candidate-row amortization across the tile's 8 output
rows).

Semantics: torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True), matching ops/resample.py
(reference loss/monodepth_loss.py:94-98).

Outputs: the blended image plus the two backward coefficient planes
  dfx = (g01-g00)*(1-fy) + (g11-g10)*fy
  dfy = (g10-g00)*(1-fx) + (g11-g01)*fx
so the custom VJP in ops/resample.py is purely elementwise (no re-gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8     # sublanes per output tile
_LANE = 128  # lanes per output tile


def _unpack_pair(g: jnp.ndarray):
    """int32 (8,128) holding two packed bf16 -> two f32 (8,128) planes.

    bf16 -> f32 is a pure bit shift into the high half; pair slot 0 is the
    low 16 bits (little-endian packing by bitcast_convert_type).
    """
    lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(g & jnp.int32(-65536), jnp.float32)
    return lo, hi


def _warp_kernel(ix_ref, iy_ref, src_ref, out_ref, dfx_ref, dfy_ref, *,
                 h: int, w: int, n_pairs: int):
    """Grid step = one (SUB, w) output band across ALL channel pairs.

    src_ref: (1, P, h, w) int32 — packed bf16 channel pairs.
    out/dfx/dfy: (1, P, 2, SUB, w) f32 — the unpacked channels.

    All channel pairs share the sampling indices, so one program handles the
    whole band: the per-tile index math, span reductions and row-key compares
    are computed ONCE and only the value fetch/select runs per pair —
    per candidate row: 4 compares + P*(broadcast + 2 shuffles + 4 selects)
    instead of P*(4 compares + broadcast + 2 shuffles + 4 selects).
    """
    n_lt = w // _LANE

    for lt in range(n_lt):
        ix = ix_ref[0, :, lt * _LANE:(lt + 1) * _LANE].astype(jnp.float32)
        iy = iy_ref[0, :, lt * _LANE:(lt + 1) * _LANE].astype(jnp.float32)

        # torch border semantics: weights from the unclamped fractional
        # coordinate, gather indices clamped to the edge
        ix = jnp.clip(ix, -1.0, float(w))
        iy = jnp.clip(iy, -1.0, float(h))
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        fx = ix - x0
        fy = iy - y0
        x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
        x1c = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
        y1c = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

        # dynamic candidate bounds for this tile (exact; tight when local).
        # Mosaic only allows 8-aligned dynamic sublane starts, so the row loop
        # walks aligned 8-row groups with a static inner unroll.
        g_lo = jnp.min(y0c) // _SUB
        g_hi = jnp.max(y1c) // _SUB
        t_lo = jnp.min(x0c) // _LANE
        t_hi = jnp.max(x1c) // _LANE

        zero = jnp.zeros((_SUB, _LANE), jnp.int32)

        # lane-tile loop OUTER so the per-tile x masks/keys hoist out of the
        # row loop (carrying bool masks across rows to reuse the y0 compare
        # for y1 does not legalize in Mosaic's scf.for — explicit r-1
        # compares instead, which also need no border fix-up)
        def tile_body(xt, accs):
            xs = pl.multiple_of(xt * _LANE, _LANE)
            xl0 = x0c - xt * _LANE
            xl1 = x1c - xt * _LANE
            # fold the in-tile test into the row key: out-of-tile lanes get
            # key -1 which never matches a row index
            key0 = jnp.where((xl0 >= 0) & (xl0 < _LANE), y0c, -1)
            key0b = jnp.where((xl0 >= 0) & (xl0 < _LANE), y1c, -1)
            key1 = jnp.where((xl1 >= 0) & (xl1 < _LANE), y0c, -1)
            key1b = jnp.where((xl1 >= 0) & (xl1 < _LANE), y1c, -1)
            xl0c = jnp.clip(xl0, 0, _LANE - 1)
            xl1c = jnp.clip(xl1, 0, _LANE - 1)

            def group_body(rg, accs):
                rs = pl.multiple_of(rg * _SUB, _SUB)
                blocks = [src_ref[0, p, pl.ds(rs, _SUB), pl.ds(xs, _LANE)]
                          for p in range(n_pairs)]
                accs = list(accs)
                for s in range(_SUB):
                    r = rg * _SUB + s
                    m00 = key0 == r
                    m10 = key0b == r
                    m01 = key1 == r
                    m11 = key1b == r
                    for p in range(n_pairs):
                        g00, g01, g10, g11 = accs[p]
                        seg = jnp.broadcast_to(blocks[p][s:s + 1, :], (_SUB, _LANE))
                        s0 = jnp.take_along_axis(seg, xl0c, axis=1)
                        s1 = jnp.take_along_axis(seg, xl1c, axis=1)
                        accs[p] = (jnp.where(m00, s0, g00),
                                   jnp.where(m01, s1, g01),
                                   jnp.where(m10, s0, g10),
                                   jnp.where(m11, s1, g11))
                return tuple(accs)

            return jax.lax.fori_loop(g_lo, g_hi + 1, group_body, accs)

        init = tuple((zero, zero, zero, zero) for _ in range(n_pairs))
        accs = jax.lax.fori_loop(t_lo, t_hi + 1, tile_body, init)

        w00 = (1.0 - fx) * (1.0 - fy)
        w01 = fx * (1.0 - fy)
        w10 = (1.0 - fx) * fy
        w11 = fx * fy
        sl = slice(lt * _LANE, (lt + 1) * _LANE)
        for p in range(n_pairs):
            g00, g01, g10, g11 = accs[p]
            for slot, pick in ((0, 0), (1, 1)):
                c00, c01 = _unpack_pair(g00)[pick], _unpack_pair(g01)[pick]
                c10, c11 = _unpack_pair(g10)[pick], _unpack_pair(g11)[pick]
                out_ref[0, p, slot, :, sl] = (
                    w00 * c00 + w01 * c01 + w10 * c10 + w11 * c11)
                dfx_ref[0, p, slot, :, sl] = (c01 - c00) * (1.0 - fy) + (c11 - c10) * fy
                dfy_ref[0, p, slot, :, sl] = (c10 - c00) * (1.0 - fx) + (c11 - c01) * fx


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_warp_corners(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                          interpret: bool = False):
    """Warp `img` (N, H, W, C) at unnormalized sample coords ix/iy (N, H, W).

    Returns (out, dfx, dfy), each (N, H, W, C) float32: the bilinear sample
    and the two grid-gradient coefficient planes (see module docstring).
    Pixel values round through bf16 (channel-pair packing); indices and
    blending are f32. Requires H % 8 == 0 and W % 128 == 0.
    """
    n, h, w, c = img.shape
    assert h % _SUB == 0 and w % _LANE == 0, (h, w)
    n_bands = h // _SUB
    cp = c + (c % 2)
    n_pairs = cp // 2

    imgb = img.astype(jnp.bfloat16)
    if cp != c:
        imgb = jnp.pad(imgb, [(0, 0)] * 3 + [(0, cp - c)])
    packed = jax.lax.bitcast_convert_type(
        imgb.reshape(n, h, w, n_pairs, 2), jnp.int32)     # (N, H, W, P)
    packed = packed.transpose(0, 3, 1, 2)                  # (N, P, H, W)

    shape = jax.ShapeDtypeStruct((n, n_pairs, 2, h, w), jnp.float32)
    band = pl.BlockSpec((1, _SUB, w), lambda ni, b: (ni, b, 0),
                        memory_space=pltpu.VMEM)
    band_out = pl.BlockSpec((1, n_pairs, 2, _SUB, w), lambda ni, b: (ni, 0, 0, b, 0),
                            memory_space=pltpu.VMEM)
    out, dfx, dfy = pl.pallas_call(
        functools.partial(_warp_kernel, h=h, w=w, n_pairs=n_pairs),
        out_shape=(shape, shape, shape),
        grid=(n, n_bands),
        in_specs=[
            band,
            band,
            pl.BlockSpec((1, n_pairs, h, w), lambda ni, b: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(band_out, band_out, band_out),
        interpret=interpret,
    )(ix.astype(jnp.float32), iy.astype(jnp.float32), packed)
    # (n, P, 2, h, w) -> (n, h, w, P*2) -> drop channel padding
    tr = lambda x: x.reshape(n, cp, h, w).transpose(0, 2, 3, 1)[..., :c]
    return tr(out), tr(dfx), tr(dfy)


def unnormalize_grid(grid: jnp.ndarray, h: int, w: int):
    """[-1, 1] grid (N, H, W, 2) -> pixel coords (ix, iy), align_corners=True."""
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    return (gx + 1.0) * 0.5 * (w - 1), (gy + 1.0) * 0.5 * (h - 1)
