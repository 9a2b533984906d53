"""Model library tests: pyramid shapes, dilation, decoder contract, PAD split."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_segmentation_with_selfsupervised_depth_tpu.models import (
    DepthDecoder,
    JointSegDepthDecoder,
    PAD,
    PoseDecoder,
    ResNetEncoder,
    build_model,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models.resnet import num_ch_enc
from improving_segmentation_with_selfsupervised_depth_tpu.ops.photometric import key_of


def test_resnet18_pyramid_shapes():
    m = ResNetEncoder(depth=18)
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 32, 48, 64), (1, 16, 24, 64), (1, 8, 12, 128), (1, 4, 6, 256), (1, 2, 3, 512)]


def test_resnet50_dilated_shapes():
    m = ResNetEncoder(depth=50, replace_stride_with_dilation=(False, False, True))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    assert [f.shape[-1] for f in feats] == list(num_ch_enc(50))
    # layer3 and layer4 share stride 16 under dilation
    assert feats[3].shape[1:3] == feats[4].shape[1:3] == (4, 4)


def test_pose_encoder_multi_image():
    m = ResNetEncoder(depth=18, num_input_images=2)
    x = jnp.zeros((2, 32, 32, 6))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    assert feats[-1].shape == (2, 1, 1, 512)


@pytest.fixture(scope="module")
def enc18_feats():
    m = ResNetEncoder(depth=18)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    return m.apply(params, x)


def test_depth_decoder_scales_and_range(enc18_feats):
    dec = DepthDecoder(num_ch_enc=num_ch_enc(18), intermediate_aspp=True, aspp_rates=(1, 2))
    params = dec.init(jax.random.PRNGKey(0), enc18_feats)
    out = dec.apply(params, enc18_feats)
    for s in range(4):
        d = out[f"disp_{s}"]
        assert d.shape == (2, 64 // 2**s, 96 // 2**s, 1)
        assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0
    assert "upconv_0" in out and out["upconv_0"].shape == (2, 64, 96, 16)


def test_depth_decoder_exec_layer_split_matches_full(enc18_feats):
    """PAD's split execution must be numerically identical to a full pass."""
    dec = DepthDecoder(num_ch_enc=num_ch_enc(18))
    params = dec.init(jax.random.PRNGKey(0), enc18_feats)
    full = dec.apply(params, enc18_feats)
    first = dec.apply(params, enc18_feats, exec_layer=(4, 3, 2))
    second = dec.apply(params, enc18_feats, x=first["upconv_2"], exec_layer=(1, 0))
    np.testing.assert_allclose(
        np.asarray(second["disp_0"]), np.asarray(full["disp_0"]), rtol=1e-5, atol=1e-6
    )


def test_pose_decoder_scale(enc18_feats):
    dec = PoseDecoder()
    params = dec.init(jax.random.PRNGKey(0), [enc18_feats])
    aa, tr = dec.apply(params, [enc18_feats])
    assert aa.shape == (2, 2, 1, 3) and tr.shape == (2, 2, 1, 3)
    assert float(jnp.abs(aa).max()) < 1.0  # 0.01-scaled head


def test_joint_seg_depth_decoder_logits(enc18_feats):
    dec = JointSegDepthDecoder(num_ch_enc=num_ch_enc(18), num_classes=19, layers=(2, 9))
    params = dec.init(jax.random.PRNGKey(0), enc18_feats)
    logits = dec.apply(params, enc18_feats)
    assert logits.shape == (2, 64, 96, 19)
    assert logits.dtype == jnp.float32


def test_pad_outputs(enc18_feats):
    dec = PAD(num_ch_enc=num_ch_enc(18), num_classes=19)
    params = dec.init(jax.random.PRNGKey(0), enc18_feats)
    out = dec.apply(params, enc18_feats)
    # final head on upconv_0 (full res); intermediate head on upconv_2
    # (stride 4), no resize when output_stride == 1 (reference
    # joint_segmentation_depth_decoder.py:167-174)
    assert out["semantics"].shape == (2, 64, 96, 19)
    assert out["intermediate_semantics"].shape == (2, 16, 24, 19)
    for s in range(4):
        assert f"disp_{s}" in out


def test_pad_attention_zero_init_makes_split_equal_plain(enc18_feats):
    """At init the distillation gates are zero -> sigmoid=0.5 scales features;
    just assert forward determinism and finite outputs."""
    dec = PAD(num_ch_enc=num_ch_enc(18), num_classes=5)
    params = dec.init(jax.random.PRNGKey(0), enc18_feats)
    out1 = dec.apply(params, enc18_feats)
    out2 = dec.apply(params, enc18_feats)
    np.testing.assert_array_equal(np.asarray(out1["semantics"]), np.asarray(out2["semantics"]))
    assert np.isfinite(np.asarray(out1["semantics"])).all()


def _tiny_batch(n=2, h=64, w=96, frames=(0, -1, 1)):
    rng = np.random.default_rng(0)
    batch = {}
    for f in frames:
        batch[key_of("color_aug", f, 0)] = jnp.asarray(
            rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32))
        batch[key_of("color", f, 0)] = batch[key_of("color_aug", f, 0)]
    return batch


def test_joint_model_forward_keys():
    cfg = {
        "arch": "joint_segmentation_depth",
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9]},
        "depth_args": {},
        "frame_ids": [0, -1, 1],
    }
    model = build_model(cfg, n_classes=19)
    batch = _tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    for k in ["bottleneck", "semantics", "disp_0", "cam_T_cam_0_-1", "cam_T_cam_0_1"]:
        assert k in out, sorted(out.keys())
    assert out["semantics"].shape == (2, 64, 96, 19)
    assert out["cam_T_cam_0_1"].shape == (2, 4, 4)
    # param tree has reference-compatible submodule keys
    top = set(params["params"].keys())
    assert {"encoder", "depth", "segmentation", "pose_encoder", "pose"} <= top


def test_pose_pair_batching_parity():
    """Batched pose pairs == per-pair loop: float-noise-equal in eval mode
    (running BN stats; only XLA reassociation differs), close in train mode
    (joint vs per-pair BN batch statistics)."""
    base = {
        "arch": "joint_segmentation_depth",
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9]},
        "depth_args": {},
        "frame_ids": [0, -1, 1],
    }
    batched = build_model(dict(base, pose_pair_batching=True), n_classes=19)
    looped = build_model(dict(base, pose_pair_batching=False), n_classes=19)
    batch = _tiny_batch()
    params = batched.init(jax.random.PRNGKey(0), batch)

    out_b = batched.apply(params, batch, train=False)
    out_l = looped.apply(params, batch, train=False)
    for f in (-1, 1):
        np.testing.assert_allclose(
            np.asarray(out_b[f"cam_T_cam_0_{f}"]), np.asarray(out_l[f"cam_T_cam_0_{f}"]),
            atol=1e-6)

    rngs = {"dropout": jax.random.PRNGKey(1)}
    out_b, _ = batched.apply(params, batch, train=True, rngs=rngs,
                             mutable=["batch_stats"])
    out_l, _ = looped.apply(params, batch, train=True, rngs=rngs,
                            mutable=["batch_stats"])
    for f in (-1, 1):
        np.testing.assert_allclose(
            np.asarray(out_b[f"cam_T_cam_0_{f}"]), np.asarray(out_l[f"cam_T_cam_0_{f}"]),
            atol=5e-2)


def test_joint_model_mtl_pad_and_imnet():
    cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "mtl_pad",
        "segmentation_args": {},
        "depth_args": {},
        "frame_ids": [0, -1, 1],
        "enable_imnet_encoder": True,
    }
    model = build_model(cfg, n_classes=11)
    batch = _tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert "semantics" in out and "intermediate_semantics" in out
    assert "imnet_features" in out and "encoder_features" in out
    assert "mtl_decoder" in params["params"] and "imnet_encoder" in params["params"]


def test_fused_up2_conv_matches_materialized():
    """Conv3x3(up2_cat=True) == reflect-pad conv3x3 on the materialized
    nearest-x2 upsample + concat, including borders (edge-pad equivalence)."""
    from improving_segmentation_with_selfsupervised_depth_tpu.models.layers import Conv3x3
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.resize import (
        upsample2x_nearest,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 5)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((2, 12, 16, 3)).astype(np.float32))

    conv = Conv3x3(out_ch=7)
    cat = jnp.concatenate([upsample2x_nearest(x), skip], axis=-1)
    params = conv.init(jax.random.PRNGKey(0), cat)

    ref = conv.apply(params, cat)
    fused = conv.apply(params, x, skip=skip, up2_cat=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # no-skip variant (scale-0 stage)
    params1 = conv.init(jax.random.PRNGKey(1), upsample2x_nearest(x))
    ref1 = conv.apply(params1, upsample2x_nearest(x))
    fused1 = conv.apply(params1, x, up2_cat=True)
    np.testing.assert_allclose(np.asarray(fused1), np.asarray(ref1),
                               atol=1e-5, rtol=1e-5)



def test_packed_stage0_matches_unpacked(enc18_feats):
    """DepthDecoder(packed_stage0=True) == the plain full-res stage-0 path:
    identical params, every output key (incl. the packed dispconv_0 and the
    lazily-unpacked upconv_0) bitwise-close. Covers layers.py
    _phase_pack_kernel_3x3 / _phase_reflect_pad1 / phase_unpack."""
    dd_u = DepthDecoder(num_ch_enc=num_ch_enc(18), packed_stage0=False)
    dd_p = DepthDecoder(num_ch_enc=num_ch_enc(18), packed_stage0=True)
    params = dd_u.init(jax.random.PRNGKey(0), enc18_feats)
    out_u = dd_u.apply(params, enc18_feats)
    out_p = dd_p.apply(params, enc18_feats)
    out_p.pop("upconv_0_packed")  # internal packed view, extra by design
    assert set(out_u) == set(out_p)
    for k in out_u:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_u[k]),
                                   atol=2e-5, rtol=1e-5, err_msg=k)


def test_packed_stage0_grad_matches_unpacked(enc18_feats):
    """Gradients through the packed stage-0 path match the plain path
    (same params, scalar loss over disp_0 + upconv_0)."""
    dd_u = DepthDecoder(num_ch_enc=num_ch_enc(18), packed_stage0=False)
    dd_p = DepthDecoder(num_ch_enc=num_ch_enc(18), packed_stage0=True)
    params = dd_u.init(jax.random.PRNGKey(0), enc18_feats)

    def loss(p, mod):
        out = mod.apply(p, enc18_feats)
        return jnp.sum(out["disp_0"] ** 2) + jnp.sum(out["upconv_0"] ** 2)

    gu = jax.grad(lambda p: loss(p, dd_u))(params)
    gp = jax.grad(lambda p: loss(p, dd_p))(params)
    flat_u = jax.tree_util.tree_leaves_with_path(gu)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, g in flat_u:
        np.testing.assert_allclose(np.asarray(flat_p[path]), np.asarray(g),
                                   atol=5e-4, rtol=1e-3, err_msg=str(path))


def test_seg_decoder_fold_matches_unfused(enc18_feats):
    """JointSegDepthDecoder single-layer fold (project_seg + head_conv
    composed into one 3x3 conv) == the unfused two-conv path with the same
    params. The unfused branch is forced via an epsilon layer_dropout (inert
    in eval mode but disables the fold condition)."""
    seg_f = JointSegDepthDecoder(num_ch_enc=num_ch_enc(18), num_classes=19)
    seg_u = JointSegDepthDecoder(num_ch_enc=num_ch_enc(18), num_classes=19,
                                 layer_dropout=1e-12)
    params = seg_f.init({"params": jax.random.PRNGKey(2)}, enc18_feats, train=False)
    out_f = seg_f.apply(params, enc18_feats, train=False)
    out_u = seg_u.apply(params, enc18_feats, train=False)
    scale = float(np.abs(np.asarray(out_u)).max())
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=2e-4 * max(scale, 1.0), rtol=1e-4)

    # the packed fold path (stage 0 never interleaved, packed BN/classifier)
    # == the same fold on the unpacked stage 0
    seg_fp = JointSegDepthDecoder(num_ch_enc=num_ch_enc(18), num_classes=19,
                                  depth_args={"packed_stage0": False})
    out_fp = seg_fp.apply(params, enc18_feats, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_fp),
                               atol=2e-4 * max(scale, 1.0), rtol=1e-4)


def test_pad_packed_stage0_matches_unpacked(enc18_feats):
    """PAD with phase-packed stage 0 (packed final 1x1 head) == PAD on the
    plain full-res stage 0, same params, train-mode batch stats included."""
    pad_p = PAD(num_ch_enc=num_ch_enc(18), num_classes=19)
    pad_u = PAD(num_ch_enc=num_ch_enc(18), num_classes=19,
                depth_args={"packed_stage0": False})
    params = pad_u.init({"params": jax.random.PRNGKey(0)}, enc18_feats, train=False)
    out_u = pad_u.apply(params, enc18_feats, train=False)
    out_p = pad_p.apply(params, enc18_feats, train=False)
    assert set(out_u) == set(out_p)
    for k in out_u:
        a, b = np.asarray(out_u[k]), np.asarray(out_p[k])
        scale = max(float(np.abs(a).max()), 1.0)
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=1e-4,
                                   err_msg=k)


def test_packed_stage0_train_mode_dropout_and_bn_fallback(enc18_feats):
    """Train-mode behavior of the packed stage 0: (a) with dropout the packed
    2D-dropout reshape preserves full-res channel-wise semantics (each
    channel all-kept or all-dropped across every phase); (b) with batch_norm
    the decoder falls back to the unpacked path (packed requires bn-free)
    and still runs."""
    dd = DepthDecoder(num_ch_enc=num_ch_enc(18), dropout=0.5)
    params = dd.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, enc18_feats, train=True)
    out = dd.apply(params, enc18_feats, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    up0 = np.asarray(out["upconv_0"])  # (n, 2h, 2w, c) after lazy unpack
    # channel-wise dropout: each (sample, channel) plane is either all zero
    # or nowhere zero (ELU outputs are nonzero a.s.)
    zero_frac = (up0 == 0.0).mean(axis=(1, 2))
    assert np.all((zero_frac > 0.999) | (zero_frac < 0.001))
    assert 0.1 < (zero_frac > 0.5).mean() < 0.9  # some dropped, some kept

    dd_bn = DepthDecoder(num_ch_enc=num_ch_enc(18), batch_norm=True)
    pbn = dd_bn.init({"params": jax.random.PRNGKey(0)}, enc18_feats, train=False)
    out_bn, _ = dd_bn.apply(pbn, enc18_feats, train=True,
                            mutable=["batch_stats"])
    assert "upconv_0_packed" not in out_bn
    assert out_bn["upconv_0"].shape == out["upconv_0"].shape
