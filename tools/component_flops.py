"""Per-component train FLOPs (XLA cost analysis, CPU backend) at the bench
geometry, to join with the device-trace ms from tools/trace_attrib.py:
achieved TF/s per component = FLOPs / traced time -> distance to roofline.

Runs entirely on CPU (JAX_PLATFORMS=cpu): cost analysis is backend-agnostic
FLOP counting of the optimized HLO. Per-component "train" cost is the
component's forward + VJP at the flagship shapes (grad wrt params+inputs,
summed-output cotangent), which is what the step's backward executes.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/component_flops.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Force CPU: this tool only counts FLOPs of the optimized HLO, which is
# backend-agnostic — never let it grab the tunneled TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax
import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.models.resnet import ResNetEncoder
from improving_segmentation_with_selfsupervised_depth_tpu.models.depth_decoder import DepthDecoder
from improving_segmentation_with_selfsupervised_depth_tpu.models.seg_decoder import JointSegDepthDecoder
from improving_segmentation_with_selfsupervised_depth_tpu.models.pose_decoder import PoseDecoder

B, H, W = 1, 512, 512  # FLOPs scale linearly in batch; printed scaled to bs8
NUM_CH_DEC = (64, 128, 128, 256, 256)  # dec6 flagship
DTYPE = jnp.bfloat16


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    return (c or {}).get("flops", 0.0) / 1e12


def train_flops(apply_fn, variables, *inputs):
    """fwd + VJP-wrt-(params, inputs) TFLOPs of a module application."""

    def loss(params, *xs):
        out = apply_fn({**variables, "params": params}, *xs)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    return flops_of(jax.grad(loss, argnums=(0, 1)), variables["params"], *inputs)


def main():
    rng = jax.random.PRNGKey(0)
    rows = []

    # encoder: resnet101, dilated last stage (bench _model_cfg)
    enc = ResNetEncoder(depth=101, replace_stride_with_dilation=(False, False, True),
                        dtype=DTYPE)
    x = jnp.zeros((B, H, W, 3), jnp.float32)
    ev = enc.init(rng, x)
    feats = enc.apply(ev, x)
    rows.append(("encoder r101 dilated", train_flops(
        lambda v, x: enc.apply(v, x), ev, x)))
    num_ch_enc = tuple(f.shape[-1] for f in feats)

    # depth decoder (ASPP bottleneck, disp heads)
    dd = DepthDecoder(num_ch_enc=num_ch_enc, intermediate_aspp=True,
                      aspp_rates=(6, 12, 18), num_ch_dec=NUM_CH_DEC, dtype=DTYPE)
    dv = dd.init(rng, feats)
    rows.append(("depth decoder", train_flops(
        lambda v, f: dd.apply(v, f), dv, feats)))

    # per-stage depth-decoder FLOPs via exec_layer prefixes: the TFLOP delta
    # between running stages (4..i) and (4..i+1) is stage i's cost — join
    # with trace_attrib's per-stage ms for per-stage achieved TF/s
    prev = 0.0
    for lo in (4, 3, 2, 1, 0):
        layers = tuple(range(4, lo - 1, -1))
        tf = train_flops(
            lambda v, f, _l=layers: dd.apply(v, f, exec_layer=_l), dv, feats)
        rows.append((f"  depth dec stage {lo} (marginal)", tf - prev))
        prev = tf

    # seg transfer decoder (unet + folded head), layers=[9]
    sd = JointSegDepthDecoder(num_ch_enc=num_ch_enc, num_classes=19, layers=(9,),
                              depth_args={"intermediate_aspp": True,
                                          "aspp_rates": (6, 12, 18),
                                          "num_ch_dec": NUM_CH_DEC},
                              dtype=DTYPE)
    sv = sd.init(rng, feats)
    rows.append(("seg unet+head", train_flops(
        lambda v, f: sd.apply(v, f, train=False), sv, feats)))

    # pose: resnet18 encoder on stacked pairs (2 pairs batched: 2B) + decoder
    pe = ResNetEncoder(depth=18, num_input_images=2, dtype=DTYPE)
    xp = jnp.zeros((2 * B, H, W, 6), jnp.float32)
    pev = pe.init(rng, xp)
    pfeats = pe.apply(pev, xp)
    rows.append(("pose encoder (2 pairs)", train_flops(
        lambda v, x: pe.apply(v, x), pev, xp)))
    pd = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2,
                     dtype=DTYPE)
    pdv = pd.init(rng, [pfeats])
    rows.append(("pose decoder", train_flops(
        lambda v, f: pd.apply(v, [f]), pdv, pfeats)))

    total = 0.0
    print(f"{'component':28s} {'train TFLOP @bs8':>16s}")
    for name, tf in rows:
        tf *= 8  # measured at B=1; FLOPs are linear in batch
        total += tf
        print(f"{name:28s} {tf:16.3f}")
    print(f"{'TOTAL':28s} {total:16.3f}")


if __name__ == "__main__":
    main()
