"""Photometric loss fwd+bwd with batch as ARGUMENT (trustworthy protocol)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import make_synthetic_batch
from improving_segmentation_with_selfsupervised_depth_tpu.ops import photometric
from improving_segmentation_with_selfsupervised_depth_tpu.ops.geometry import transformation_from_parameters
from improving_segmentation_with_selfsupervised_depth_tpu.ops.photometric import key_of

H = W = 512; BATCH = 8; SCALES = (0,1,2,3); FRAMES = (0,-1,1)
batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(BATCH, H, W, frame_ids=FRAMES, num_scales=4).items()}
rng = np.random.default_rng(0)
params = {f"disp_{s}": jnp.asarray(rng.uniform(0.01,0.99,(BATCH,H//2**s,W//2**s,1)).astype(np.float32)) for s in SCALES}
for f in (-1,1):
    params[f"pose_{f}"] = (jnp.asarray(rng.standard_normal((BATCH,3)).astype(np.float32)*0.01),
                           jnp.asarray(rng.standard_normal((BATCH,3)).astype(np.float32)*0.01))

def loss(params, batch):
    outputs = {key_of("disp", s): params[f"disp_{s}"] for s in SCALES}
    for f in (-1,1):
        aa, tr = params[f"pose_{f}"]
        outputs[key_of("cam_T_cam",0,f)] = transformation_from_parameters(aa, tr, invert=f<0)
    outputs = photometric.generate_images_pred(batch, outputs, scales=SCALES, frame_ids=FRAMES, min_depth=0.1, max_depth=100.0)
    return photometric.compute_losses(jax.random.PRNGKey(0), batch, outputs, scales=SCALES, frame_ids=FRAMES, disparity_smoothness=1e-3)["loss"]

g = jax.jit(jax.value_and_grad(loss))
val, grads = g(params, batch); jax.block_until_ready(val)
N = 30
t0 = time.perf_counter()
p = params
for i in range(N):
    val, grads = g(p, batch)
    p = jax.tree_util.tree_map(lambda a,b: a + 1e-12*b, p, grads)
jax.block_until_ready(val)
print(f"photometric arg-batch: {(time.perf_counter()-t0)/N*1000:.1f} ms (fwd+bwd, bs{BATCH})", flush=True)
