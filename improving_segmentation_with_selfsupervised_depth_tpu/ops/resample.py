"""Differentiable image warping: `grid_sample` with PyTorch semantics.

This is the numerically most sensitive op of the SDE pipeline (the photometric
loss warps source frames through predicted depth+pose, reference
loss/monodepth_loss.py:94-98 uses `F.grid_sample(padding_mode="border",
align_corners=True)`).

TPU-first design: one fused 4-corner gather per image expressed with
`take_along_axis` over a flattened spatial axis. XLA lowers this to a dynamic
gather that pipelines well from HBM; the bilinear weights stay fused with the
gather consumers. Gradients flow to the sampling grid through the corner
weights (same subgradient as torch) and to the image through scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _corners_and_weights(img, grid, align_corners):
    n, h, w, c = img.shape
    gn, gh, gw, two = grid.shape
    assert two == 2 and gn == n, (img.shape, grid.shape)

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5
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

    flat = img.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, gh * gw, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(n, gh, gw, c)

    g00 = gather(y0c, x0c)
    g01 = gather(y0c, x1c)
    g10 = gather(y1c, x0c)
    g11 = gather(y1c, x1c)
    return (g00, g01, g10, g11), (fx, fy), (w, h)


def _blend(corners, fx, fy, dtype):
    g00, g01, g10, g11 = corners
    w00 = ((1.0 - fx) * (1.0 - fy))[..., None]
    w01 = (fx * (1.0 - fy))[..., None]
    w10 = ((1.0 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return (w00 * g00 + w01 * g01 + w10 * g10 + w11 * g11).astype(dtype)


# Warp-implementation context, set once by the trainer/CLI (not per call):
#   mode  "auto"   Pallas kernel on TPU when shapes allow (default)
#         "xla"    force the full-f32 XLA gather path — the parity-debugging
#                  opt-out for the kernel's bf16 channel-pair rounding
#                  (config key training.warp_impl)
#         "pallas" require the kernel (assert shapes/backend)
#   mesh  the active data-parallel Mesh. pallas_call has no GSPMD
#         partitioning rule, so on a >1-device mesh the kernel call is
#         wrapped in shard_map over the batch axis — each device runs the
#         kernel on its local batch shard and XLA stitches the results;
#         without a registered mesh a multi-device jit would have to
#         replicate the warp per device (or fail to partition), so "auto"
#         falls back to the XLA path when sharding is impossible.
_WARP_CONFIG = {"mode": "auto", "mesh": None, "axis_name": "data",
                "interpret": False, "force_shard_map": False}


def configure_warp(mode: str = "auto", mesh=None, axis_name: str = "data",
                   interpret: bool = False,
                   force_shard_map: bool = False) -> None:
    """Select the grid_sample implementation (see _WARP_CONFIG above).

    `interpret=True` runs the Pallas kernel in interpreter mode so the
    shard_map composition is testable on a CPU mesh. `force_shard_map=True`
    wraps the kernel in shard_map even on a 1-device mesh — the multi-chip
    code path (shard_map -> Mosaic lowering) validated on single-chip
    hardware (tools/check_warp_shardmap_tpu.py)."""
    assert mode in ("auto", "xla", "pallas"), mode
    _WARP_CONFIG.update(mode=mode, mesh=mesh, axis_name=axis_name,
                        interpret=interpret, force_shard_map=force_shard_map)


def _pallas_dispatch(img, grid):
    """None (use XLA) | 'direct' | 'shard_map' for this call's shapes."""
    n, h, w, c = img.shape
    mode = _WARP_CONFIG["mode"]
    if mode == "xla":
        return None
    ok_backend = jax.default_backend() == "tpu" or _WARP_CONFIG["interpret"]
    ok_shape = grid.shape[1:3] == (h, w) and h % 8 == 0 and w % 128 == 0
    mesh = _WARP_CONFIG["mesh"]
    n_dev = mesh.devices.size if mesh is not None else 1
    ok_batch = n % n_dev == 0
    if mode == "pallas":
        assert ok_backend and ok_shape and ok_batch, (img.shape, grid.shape, n_dev)
    elif not (ok_backend and ok_shape and ok_batch):
        return None
    if n_dev > 1 or (mesh is not None and _WARP_CONFIG["force_shard_map"]):
        return "shard_map"
    return "direct"


def _pallas_warp3(img, grid):
    """(out, dfx, dfy) via the Pallas kernel, shard_mapped on a multi-device
    mesh so each device warps its batch shard with its own kernel launch."""
    from jax.sharding import PartitionSpec as P

    from .pallas.warp import bilinear_warp_corners, unnormalize_grid

    h, w = img.shape[1:3]
    interpret = _WARP_CONFIG["interpret"]

    def f(im, gr):
        ix, iy = unnormalize_grid(gr, h, w)
        return bilinear_warp_corners(im, ix, iy, interpret=interpret)

    if _pallas_dispatch(img, grid) == "shard_map":
        spec = P(_WARP_CONFIG["axis_name"])
        # check_vma=False: pallas_call's out_shapes carry no varying-mesh-axes
        # annotation, and the kernel is trivially per-shard (batch-parallel)
        f = jax.shard_map(f, mesh=_WARP_CONFIG["mesh"], in_specs=(spec, spec),
                          out_specs=(spec, spec, spec), check_vma=False)
    return f(img, grid)


def _warp_with_coeffs(img, grid):
    """Forward warp + the two grid-gradient coefficient planes.

    dfx = (g01-g00)(1-fy) + (g11-g10)fy,  dfy = (g10-g00)(1-fx) + (g11-g01)fx
    — exactly d(out)/d(ix), d(out)/d(iy), so the VJP below is elementwise.
    On TPU this runs the Pallas lane-shuffle kernel (ops/pallas/warp.py):
    XLA's generic gather costs ~60 ms per 512x512x8x3 warp (~7 ns/index,
    tools/bench_gather2.py) and dominated the train step; the kernel does the
    same fetch in ~10 ms with indices/blending exact and pixel values
    rounded through bf16 (see the kernel docstring; `configure_warp("xla")`
    forces this full-f32 path for parity debugging).
    """
    if _pallas_dispatch(img, grid) is not None:
        out, dfx, dfy = _pallas_warp3(img, grid)
        return out.astype(img.dtype), dfx, dfy
    corners, (fx, fy), _ = _corners_and_weights(img, grid, True)
    g00, g01, g10, g11 = (g.astype(jnp.float32) for g in corners)
    out = _blend(corners, fx, fy, img.dtype)
    dfx = (g01 - g00) * (1.0 - fy)[..., None] + (g11 - g10) * fy[..., None]
    dfy = (g10 - g00) * (1.0 - fx)[..., None] + (g11 - g01) * fx[..., None]
    return out, dfx, dfy


@jax.custom_vjp
def grid_sample_nograd_image(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """grid_sample (border, align_corners=True) that treats `img` as data.

    Photometric-loss fast path: the warped sources are input frames (never
    differentiated), so the backward pass needs gradients w.r.t. the *grid*
    only. The custom VJP saves the two gradient coefficient planes from the
    forward and makes the backward purely elementwise — no re-gather and no
    scatter-add on TPU. The img cotangent is zero by contract (enforced by
    the caller).
    """
    if _pallas_dispatch(img, grid) is not None:
        return _pallas_warp3(img, grid)[0].astype(img.dtype)
    corners, (fx, fy), _ = _corners_and_weights(img, grid, True)
    return _blend(corners, fx, fy, img.dtype)


def _gs_fwd(img, grid):
    out, dfx, dfy = _warp_with_coeffs(img, grid)
    n, h, w, c = img.shape
    dtype_token = jnp.zeros((0,), img.dtype)  # residuals must be JAX types
    return out, (dfx, dfy, w, h, img.shape, dtype_token)


def _gs_bwd(res, ct):
    dfx, dfy, w, h, img_shape, dtype_token = res
    img_dtype = dtype_token.dtype
    ct = ct.astype(jnp.float32)
    # Where corner indices were clamped (border), the coefficient planes are
    # zero, reproducing torch's border subgradient.
    dgx = jnp.sum(ct * dfx, axis=-1) * (0.5 * (w - 1))
    dgy = jnp.sum(ct * dfy, axis=-1) * (0.5 * (h - 1))
    dgrid = jnp.stack([dgx, dgy], axis=-1).astype(jnp.float32)
    # image is data by contract; the zero cotangent is DCE'd by XLA because
    # callers stop_gradient the image argument
    return jnp.zeros(img_shape, img_dtype), dgrid


grid_sample_nograd_image.defvjp(_gs_fwd, _gs_bwd)


# ---------------------------------------------------------------------------
# Packed multi-grid warp (NCHW outputs) — the photometric-loss hot path.
# ---------------------------------------------------------------------------


def _pack_fallback_coeffs(img, grids):
    """XLA f32 reference for the packed warp: per-grid 4-corner gather.

    Returns (out, dfx, dfy) each (N, S, C, H, W) float32.
    """
    n, s = grids.shape[:2]
    outs, dfxs, dfys = [], [], []
    for si in range(s):
        corners, (fx, fy), _ = _corners_and_weights(img, grids[:, si], True)
        g00, g01, g10, g11 = (g.astype(jnp.float32) for g in corners)
        out = _blend(corners, fx, fy, jnp.float32)
        dfx = (g01 - g00) * (1.0 - fy)[..., None] + (g11 - g10) * fy[..., None]
        dfy = (g10 - g00) * (1.0 - fx)[..., None] + (g11 - g01) * fx[..., None]
        tr = lambda x: x.transpose(0, 3, 1, 2)
        outs.append(tr(out))
        dfxs.append(tr(dfx))
        dfys.append(tr(dfy))
    st = lambda xs: jnp.stack(xs, axis=1)
    return st(outs), st(dfxs), st(dfys)


def _pack_warp_coeffs(img, grids):
    """(out, dfx, dfy) each (N, S, C, H, W) f32 for `grids` (N, S, H, W, 2),
    dispatching to the multi-grid Pallas kernel (one call for all S grids —
    shared packing prologue, no output layout transposes) or the XLA f32
    fallback, shard_mapped over the batch axis on a multi-device mesh."""
    n, s, h, w, _ = grids.shape
    if _pallas_dispatch(img, grids[:, 0]) is None:
        return _pack_fallback_coeffs(img, grids)

    from jax.sharding import PartitionSpec as P

    from .pallas.warp import bilinear_warp_corners_nchw, unnormalize_grid

    interpret = _WARP_CONFIG["interpret"]
    c = img.shape[-1]

    def f(im, gr):
        flat = gr.reshape(-1, h, w, 2)  # (n_local*S, H, W, 2), image-major
        ix, iy = unnormalize_grid(flat, h, w)
        out, dfx, dfy = bilinear_warp_corners_nchw(im, ix, iy, reps=s,
                                                   interpret=interpret)
        rs = lambda x: x.reshape(-1, s, c, h, w)
        return rs(out), rs(dfx), rs(dfy)

    if _pallas_dispatch(img, grids[:, 0]) == "shard_map":
        spec = P(_WARP_CONFIG["axis_name"])
        f = jax.shard_map(f, mesh=_WARP_CONFIG["mesh"], in_specs=(spec, spec),
                          out_specs=(spec, spec, spec), check_vma=False)
    return f(img, grids)


@jax.custom_vjp
def grid_sample_pack_nchw(img: jnp.ndarray, grids: jnp.ndarray) -> jnp.ndarray:
    """Warp `img` (N, H, W, C) at S grids at once -> (N, S, C, H, W).

    The packed, layout-native form of `grid_sample_nograd_image`: the
    photometric loss warps each source frame at every scale, so it batches
    the 4 scale grids (`grids` (N, S, H, W, 2), torch grid_sample
    convention, border/align_corners=True) into ONE kernel call per source
    frame and consumes the NCHW result directly — no per-call packing
    prologue and no full-res NCHW->NHWC copies. `img` is data (never
    differentiated); the custom VJP is elementwise in the grid gradient.
    """
    return _pack_warp_coeffs(img, grids)[0].astype(img.dtype)


def _gsp_fwd(img, grids):
    out, dfx, dfy = _pack_warp_coeffs(img, grids)
    h, w = img.shape[1:3]
    dtype_token = jnp.zeros((0,), img.dtype)
    return out.astype(img.dtype), (dfx, dfy, w, h, img.shape, dtype_token)


def _gsp_bwd(res, ct):
    dfx, dfy, w, h, img_shape, dtype_token = res
    ct = ct.astype(jnp.float32)
    dgx = jnp.sum(ct * dfx, axis=2) * (0.5 * (w - 1))   # (N, S, H, W)
    dgy = jnp.sum(ct * dfy, axis=2) * (0.5 * (h - 1))
    dgrids = jnp.stack([dgx, dgy], axis=-1)
    return jnp.zeros(img_shape, dtype_token.dtype), dgrids


grid_sample_pack_nchw.defvjp(_gsp_fwd, _gsp_bwd)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sampling of `img` (N, H, W, C) at `grid` (N, Hg, Wg, 2).

    grid[..., 0] is x in [-1, 1], grid[..., 1] is y in [-1, 1]
    (same convention as torch.nn.functional.grid_sample).
    Padding mode is 'border' (out-of-range samples clamp to the edge).
    """
    n, h, w, c = img.shape
    gn, gh, gw, two = grid.shape
    assert two == 2 and gn == n, (img.shape, grid.shape)

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    # Keep the *fractional* weights from the unclamped coordinate (torch
    # 'border' semantics), clamp only the gather indices. Guard against
    # inf/nan coordinates so floor() stays in int range.
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

    flat = img.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, gh * gw, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(n, gh, gw, c)

    w00 = ((1.0 - fx) * (1.0 - fy))[..., None]
    w01 = (fx * (1.0 - fy))[..., None]
    w10 = ((1.0 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]

    out = (
        w00 * gather(y0c, x0c)
        + w01 * gather(y0c, x1c)
        + w10 * gather(y1c, x0c)
        + w11 * gather(y1c, x1c)
    )
    return out.astype(img.dtype)
