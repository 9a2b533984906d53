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
its samples touch; candidate source rows are scanned with one broadcast +
one lane shuffle per channel whose output covers the whole tile. Arbitrary
warps stay *exact* in indexing — wide scatter (random-init depth) just widens
the candidate loop.

Sliding-pair packing (the key trick): each 32-bit source lane carries the
bf16 PAIR (src[y, x], src[y, x+1]) — pixel and right neighbor, built once
per call with an edge-clamped shift. A single lane shuffle at index x0 then
fetches BOTH x-corners of the bilinear stencil, so the candidate loop needs
one shuffle + two selects per (row, channel) instead of two shuffles + four
selects per channel-pair, and the x1 tile-membership keys vanish entirely
(x0's tile always holds x0+1's value). In-step A/B on v5e showed the loop
is bound by the shuffle ops — round-2's channel-pair packing (2 channels
per shuffle but 2 shuffles per row for the two x-corners) measured
identically to a compare/select-halved variant, while sliding pairs cut the
shuffle count itself.

Corner values are therefore bf16; the reference itself warps in fp16 under
torch.cuda.amp (monodepth configs set amp: true and autocast covers
F.grid_sample), and the photometric loss consumes image values in [0, 1]
where bf16 holds ~3 significant digits. The sampling indices and all
blending/gradient math stay f32. The XLA fallback path in ops/resample.py
remains full f32.

Loop structure: one grid program per (image, 8-row output band) covering
ALL channels — index math, span reductions and row-key compares are paid
once per band. Inside: dynamic fori over x lane-tiles x dynamic fori over
8-row source groups, 8-row static unroll.
Variants tried and rejected: one program per (image, pair, band) (round-2
shape: repeats index math per pair); statically unrolled lane-tile loop
(faster isolated, slower in-step — real rough grids have x-span ~2 of 4
tiles); batch-in-sublanes layout (3x slower: it forfeits the
one-shuffle-per-candidate-row amortization across the tile's 8 output
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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8     # sublanes per output tile
_LANE = 128  # lanes per output tile

# The smooth-grid fast path pulls exact candidate rows with a DYNAMIC-shift
# `pltpu.roll` — legal in interpret mode and on current Mosaic, but gated so
# callers (bench.py probes it at startup) can drop back to the always-legal
# aligned group scan if a TPU toolchain rejects the dynamic rotate.
_smooth_path_enabled = os.environ.get("SSD_TPU_WARP_SMOOTH", "1") == "1"


def set_smooth_path(enabled: bool) -> None:
    """Toggle the smooth-grid row scan; clears the jit cache so already-traced
    warp calls re-lower with the new loop structure."""
    global _smooth_path_enabled
    _smooth_path_enabled = bool(enabled)
    bilinear_warp_corners_nchw.clear_cache()
    bilinear_warp_corners.clear_cache()


def _unpack_pair(g: jnp.ndarray):
    """int32 (8,128) holding two packed bf16 -> two f32 (8,128) planes.

    bf16 -> f32 is a pure bit shift into the high half; pair slot 0 is the
    low 16 bits (little-endian packing by bitcast_convert_type).
    """
    lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(g & jnp.int32(-65536), jnp.float32)
    return lo, hi


def _warp_kernel(ix_ref, iy_ref, src_ref, out_ref, dfx_ref, dfy_ref, *,
                 h: int, w: int, c: int, bands: int):
    """Grid step = `bands` (SUB, w) output bands across all channels
    (multiple bands per program amortize grid-dispatch/pipeline overhead,
    which dominates once the candidate loops are short on smooth grids).

    src_ref: (1, C, h, w) int32 — sliding-pair packed bf16
             (lane x = (src[y, x], src[y, x+1])).
    out/dfx/dfy: (1, C, bands*SUB, w) f32.
    """
    n_lt = w // _LANE

    for bp in range(bands):
        for lt in range(n_lt):
            _warp_band_tile(ix_ref, iy_ref, src_ref, out_ref, dfx_ref, dfy_ref,
                            bp=bp, lt=lt, h=h, w=w, c=c)


def _warp_band_tile(ix_ref, iy_ref, src_ref, out_ref, dfx_ref, dfy_ref, *,
                    bp: int, lt: int, h: int, w: int, c: int):
    rows = slice(bp * _SUB, (bp + 1) * _SUB)
    ix = ix_ref[0, rows, lt * _LANE:(lt + 1) * _LANE].astype(jnp.float32)
    iy = iy_ref[0, rows, lt * _LANE:(lt + 1) * _LANE].astype(jnp.float32)

    # torch border semantics: weights from the unclamped fractional
    # coordinate, gather indices clamped to the edge
    ix = jnp.clip(ix, -1.0, float(w))
    iy = jnp.clip(iy, -1.0, float(h))
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    # left-edge clamp: torch uses src[0] for BOTH x-corners (x1c = clip
    # (x0+1) = 0) but lane 0's sliding pair is (src[0], src[1]) — fold
    # the clamp into the weight (fx=0 -> picks s0=src[0]) and zero the
    # dfx subgradient like the clamped-corner difference would be.
    # The right edge needs nothing: lane w-1 packs (src[w-1], src[w-1]).
    x_unclamped = (x0 >= 0.0).astype(jnp.float32)
    fx = fx * x_unclamped
    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

    # dynamic candidate bounds for this tile (exact; tight when local).
    # Mosaic only allows 8-aligned dynamic sublane starts, so the general
    # row loop walks aligned 8-row groups with a static inner unroll. Only
    # x0 drives the x-tile span: the sliding pair carries x0+1's value.
    y_min = jnp.min(y0c)
    y_max = jnp.max(y1c)
    g_lo = y_min // _SUB
    g_hi = y_max // _SUB
    t_lo = jnp.min(x0c) // _LANE
    t_hi = jnp.max(x0c) // _LANE

    zero = jnp.zeros((_SUB, _LANE), jnp.int32)

    def tile_keys(xt):
        xl0 = x0c - xt * _LANE
        # fold the in-tile test into the row key: out-of-tile lanes get
        # key -1 which never matches a row index
        in_tile = (xl0 >= 0) & (xl0 < _LANE)
        key0 = jnp.where(in_tile, y0c, -1)
        key0b = jnp.where(in_tile, y1c, -1)
        xl0c = jnp.clip(xl0, 0, _LANE - 1)
        return key0, key0b, xl0c

    # lane-tile loop OUTER so the per-tile x keys hoist out of the row
    # loop (carrying bool masks across rows does not legalize in
    # Mosaic's scf.for — explicit compares instead)
    def tile_body(xt, accs):
        xs = pl.multiple_of(xt * _LANE, _LANE)
        key0, key0b, xl0c = tile_keys(xt)

        def group_body(rg, accs):
            rs = pl.multiple_of(rg * _SUB, _SUB)
            blocks = [src_ref[0, ci, pl.ds(rs, _SUB), pl.ds(xs, _LANE)]
                      for ci in range(c)]
            accs = list(accs)
            for s in range(_SUB):
                r = rg * _SUB + s
                m_top = key0 == r
                m_bot = key0b == r
                for ci in range(c):
                    a_top, a_bot = accs[ci]
                    seg = jnp.broadcast_to(blocks[ci][s:s + 1, :],
                                           (_SUB, _LANE))
                    v = jnp.take_along_axis(seg, xl0c, axis=1)
                    accs[ci] = (jnp.where(m_top, v, a_top),
                                jnp.where(m_bot, v, a_bot))
            return tuple(accs)

        return jax.lax.fori_loop(g_lo, g_hi + 1, group_body, accs)

    # SMOOTH fast path: settled training grids have tiny per-tile y-span,
    # but the aligned group scan above always pays >= 8 (usually 16)
    # candidate rows. Here the row loop runs over the EXACT [y_min, y_max]
    # range; each row is pulled from its aligned 8-row group with a dynamic
    # sublane roll (pltpu.roll) — ~2x the per-row cost of the group scan,
    # so it wins only when the span is small (cond below).
    def tile_body_smooth(xt, accs):
        xs = pl.multiple_of(xt * _LANE, _LANE)
        key0, key0b, xl0c = tile_keys(xt)

        def row_body(r, accs):
            g = r // _SUB
            rs = pl.multiple_of(g * _SUB, _SUB)
            shift = (_SUB - (r - g * _SUB)) % _SUB
            m_top = key0 == r
            m_bot = key0b == r
            accs = list(accs)
            for ci in range(c):
                blk = src_ref[0, ci, pl.ds(rs, _SUB), pl.ds(xs, _LANE)]
                row = pltpu.roll(blk, shift, axis=0)[0:1, :]
                seg = jnp.broadcast_to(row, (_SUB, _LANE))
                v = jnp.take_along_axis(seg, xl0c, axis=1)
                a_top, a_bot = accs[ci]
                accs[ci] = (jnp.where(m_top, v, a_top),
                            jnp.where(m_bot, v, a_bot))
            return tuple(accs)

        return jax.lax.fori_loop(y_min, y_max + 1, row_body, accs)

    init = tuple((zero, zero) for _ in range(c))
    # break-even: smooth scans (span+1) rows at ~2x/row; group scan pays
    # 8*(g_span+1) rows. span < 6 keeps the smooth path strictly cheaper.
    if _smooth_path_enabled:
        accs = jax.lax.cond(
            y_max - y_min < 6,
            lambda a: jax.lax.fori_loop(t_lo, t_hi + 1, tile_body_smooth, a),
            lambda a: jax.lax.fori_loop(t_lo, t_hi + 1, tile_body, a),
            init)
    else:
        accs = jax.lax.fori_loop(t_lo, t_hi + 1, tile_body, init)

    sl = slice(lt * _LANE, (lt + 1) * _LANE)
    one_m_fx = 1.0 - fx
    one_m_fy = 1.0 - fy
    for ci in range(c):
        a_top, a_bot = accs[ci]
        s0t, s1t = _unpack_pair(a_top)   # (g00, g01)
        s0b, s1b = _unpack_pair(a_bot)   # (g10, g11)
        top = one_m_fx * s0t + fx * s1t
        bot = one_m_fx * s0b + fx * s1b
        out_ref[0, ci, rows, sl] = one_m_fy * top + fy * bot
        dfx_ref[0, ci, rows, sl] = (
            (s1t - s0t) * one_m_fy + (s1b - s0b) * fy) * x_unclamped
        dfy_ref[0, ci, rows, sl] = bot - top


@functools.partial(jax.jit, static_argnames=("reps", "interpret"))
def bilinear_warp_corners_nchw(img: jnp.ndarray, ix: jnp.ndarray,
                               iy: jnp.ndarray, reps: int = 1,
                               interpret: bool = False):
    """Warp `img` (N, H, W, C) at `reps` grids per image, NCHW outputs.

    ix/iy have shape (N*reps, H, W); grid g samples img[g // reps]. One
    pallas_call serves all grids of all images — the photometric loss warps
    each source frame at 4 scales, and merging those calls amortizes the
    sliding-pair packing prologue and the per-call dispatch overhead 4x.
    Grid-major flattening is (image, rep) so the source block index is
    constant across consecutive programs (Pallas skips the re-DMA).

    Returns (out, dfx, dfy), each (N*reps, C, H, W) float32 — NCHW, the
    kernel's native block layout; consumers that want NHWC transpose (the
    photometric loss consumes NCHW directly to avoid 3 full-res layout
    copies per warp). Pixel values round through bf16 (sliding-pair
    packing); indices and blending are f32. H % 8 == 0, W % 128 == 0.
    """
    n, h, w, c = img.shape
    m = ix.shape[0]
    assert m == n * reps, (img.shape, ix.shape, reps)
    assert h % _SUB == 0 and w % _LANE == 0, (h, w)
    n_bands = h // _SUB
    # bands per program: amortizes grid-dispatch/pipeline overhead, which
    # dominates once candidate loops are short (smooth grids)
    bands = 4 if n_bands % 4 == 0 else 1

    imgb = img.astype(jnp.bfloat16)
    # sliding pairs: lane x packs (src[x], src[x+1 clamped])
    nxt = jnp.concatenate([imgb[:, :, 1:], imgb[:, :, -1:]], axis=2)
    packed = jax.lax.bitcast_convert_type(
        jnp.stack([imgb, nxt], axis=-1), jnp.int32)        # (N, H, W, C)
    packed = packed.transpose(0, 3, 1, 2)                   # (N, C, H, W)

    shape = jax.ShapeDtypeStruct((m, c, h, w), jnp.float32)
    band = pl.BlockSpec((1, bands * _SUB, w), lambda ni, b: (ni, b, 0),
                        memory_space=pltpu.VMEM)
    band_out = pl.BlockSpec((1, c, bands * _SUB, w), lambda ni, b: (ni, 0, b, 0),
                            memory_space=pltpu.VMEM)
    out, dfx, dfy = pl.pallas_call(
        functools.partial(_warp_kernel, h=h, w=w, c=c, bands=bands),
        out_shape=(shape, shape, shape),
        grid=(m, n_bands // bands),
        in_specs=[
            band,
            band,
            pl.BlockSpec((1, c, h, w), lambda ni, b: (ni // reps, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(band_out, band_out, band_out),
        interpret=interpret,
    )(ix.astype(jnp.float32), iy.astype(jnp.float32), packed)
    return out, dfx, dfy


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_warp_corners(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                          interpret: bool = False):
    """Single-grid NHWC convenience wrapper over the NCHW kernel.

    Returns (out, dfx, dfy), each (N, H, W, C) float32 (transposed from the
    kernel's native NCHW — hot callers use the NCHW entry directly).
    """
    out, dfx, dfy = bilinear_warp_corners_nchw(img, ix, iy, reps=1,
                                               interpret=interpret)
    tr = lambda x: x.transpose(0, 2, 3, 1)
    return tr(out), tr(dfx), tr(dfy)


def unnormalize_grid(grid: jnp.ndarray, h: int, w: int):
    """[-1, 1] grid (N, H, W, 2) -> pixel coords (ix, iy), align_corners=True."""
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    return (gx + 1.0) * 0.5 * (w - 1), (gy + 1.0) * 0.5 * (h - 1)
