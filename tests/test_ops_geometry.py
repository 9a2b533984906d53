"""Geometry ops: closed-form and torch-golden parity tests.

Golden reference reimplemented from /root/reference/models/monodepth_layers.py
semantics using torch CPU.
"""

import jax.numpy as jnp
import numpy as np
import torch

from improving_segmentation_with_selfsupervised_depth_tpu.ops import (
    backproject_depth,
    disp_to_depth,
    grid_sample,
    project_3d,
    rot_from_axisangle,
    transformation_from_parameters,
)


def test_disp_to_depth_endpoints():
    sd, d = disp_to_depth(jnp.asarray([0.0, 1.0]), 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(d), [100.0, 0.1], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sd), [0.01, 10.0], rtol=1e-6)


def test_rot_from_axisangle_vs_scipy_like():
    rng = np.random.default_rng(0)
    vec = rng.standard_normal((4, 3)).astype(np.float32) * 0.3
    R = np.asarray(rot_from_axisangle(jnp.asarray(vec)))
    # Rotation matrices: orthonormal, det 1, correct angle
    for i in range(4):
        r = R[i, :3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        angle = np.linalg.norm(vec[i])
        np.testing.assert_allclose((np.trace(r) - 1) / 2, np.cos(angle), atol=1e-5)
    # zero rotation -> identity
    R0 = np.asarray(rot_from_axisangle(jnp.zeros((1, 3))))
    np.testing.assert_allclose(R0[0], np.eye(4), atol=1e-6)


def test_transformation_invert_roundtrip():
    rng = np.random.default_rng(1)
    aa = rng.standard_normal((3, 1, 3)).astype(np.float32) * 0.2
    t = rng.standard_normal((3, 1, 3)).astype(np.float32) * 0.5
    T = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=False))
    Ti = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=True))
    for i in range(3):
        np.testing.assert_allclose(T[i] @ Ti[i], np.eye(4), atol=1e-5)


def _torch_backproject_project(depth, inv_K, K, T):
    """Golden: reference BackprojectDepth+Project3D semantics in torch."""
    b, h, w = depth.shape[0], depth.shape[2], depth.shape[3]
    mesh = np.meshgrid(range(w), range(h), indexing="xy")
    id_coords = np.stack(mesh, 0).astype(np.float32)
    ones = torch.ones(b, 1, h * w)
    pix = torch.from_numpy(
        np.stack([id_coords[0].reshape(-1), id_coords[1].reshape(-1)], 0)
    )[None].repeat(b, 1, 1)
    pix = torch.cat([pix, ones], 1)
    cam = torch.matmul(torch.from_numpy(inv_K)[:, :3, :3], pix)
    cam = torch.from_numpy(depth).view(b, 1, -1) * cam
    cam = torch.cat([cam, ones], 1)

    P = torch.matmul(torch.from_numpy(K), torch.from_numpy(T))[:, :3, :]
    cp = torch.matmul(P, cam)
    pc = cp[:, :2, :] / (cp[:, 2, :].unsqueeze(1) + 1e-7)
    pc = pc.view(b, 2, h, w).permute(0, 2, 3, 1)
    pc[..., 0] /= w - 1
    pc[..., 1] /= h - 1
    return (pc - 0.5) * 2


def test_backproject_project_vs_torch_golden():
    rng = np.random.default_rng(2)
    b, h, w = 2, 6, 8
    depth = (rng.uniform(1.0, 10.0, (b, 1, h, w))).astype(np.float32)
    K = np.zeros((b, 4, 4), dtype=np.float32)
    K[:, 0, 0] = 5.0 * w
    K[:, 1, 1] = 5.0 * h
    K[:, 0, 2] = w / 2
    K[:, 1, 2] = h / 2
    K[:, 2, 2] = 1
    K[:, 3, 3] = 1
    inv_K = np.linalg.inv(K).astype(np.float32)
    aa = (rng.standard_normal((b, 3)) * 0.05).astype(np.float32)
    tr = (rng.standard_normal((b, 3)) * 0.1).astype(np.float32)
    T = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(tr)))

    ref = _torch_backproject_project(depth, inv_K, K, T).numpy()

    pts = backproject_depth(jnp.asarray(depth.transpose(0, 2, 3, 1)), jnp.asarray(inv_K))
    grid = project_3d(pts, jnp.asarray(K), jnp.asarray(T), h, w)
    np.testing.assert_allclose(np.asarray(grid), ref, rtol=1e-4, atol=1e-5)


def test_identity_warp_roundtrip():
    """Backproject + project with identity pose must give the identity grid,
    so grid_sample reproduces the input image."""
    rng = np.random.default_rng(3)
    b, h, w = 1, 8, 10
    depth = rng.uniform(2.0, 5.0, (b, h, w, 1)).astype(np.float32)
    K = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    K[:, 0, 0], K[:, 1, 1] = 20.0, 20.0
    K[:, 0, 2], K[:, 1, 2] = w / 2, h / 2
    inv_K = np.linalg.inv(K)
    pts = backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K))
    grid = project_3d(pts, jnp.asarray(K), jnp.asarray(np.eye(4, dtype=np.float32)[None]), h, w)
    img = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    out = grid_sample(jnp.asarray(img), grid)
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-4, atol=1e-4)
