"""TPU-native framework for semi-supervised semantic segmentation with
self-supervised depth estimation (SDE).

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
the reference PyTorch implementation of "Three Ways to Improve Semantic
Segmentation with Self-Supervised Depth Estimation" (CVPR'21):

- Self-supervised monocular depth pretraining (monodepth2-style photometric loss)
- Semi-supervised segmentation with a mean-teacher + DepthMix/ClassMix
- Transfer & multi-task learning from SDE features (JointSegDepthDecoder, PAD)
- Automatic label selection (entropy + depth-error scores, farthest-point diversity)

Design notes (TPU-first, not a port):
- NHWC layout everywhere (native TPU conv layout).
- Every training step is a single jitted, pjit-shardable pure function; the EMA
  teacher update, on-device augmentation (mix/jitter/blur), pseudo-labeling and
  the confusion-matrix metric all live inside the compiled step.
- Data parallelism via `jax.sharding.Mesh` + NamedSharding annotations; XLA
  inserts the gradient all-reduce over ICI.
- bfloat16 compute policy replaces torch.cuda.amp.
- Bilinear warping/resizing are expressed as dense matmul/gather formulations
  that tile onto the MXU, with Pallas kernels for the hottest resampling ops.
"""

__version__ = "0.1.0"
