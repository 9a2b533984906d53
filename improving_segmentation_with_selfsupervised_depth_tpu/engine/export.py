"""AOT export of the inference forward for serving (jax.export / StableHLO).

The reference deploys by shipping the Python training repo and a .pth file
(inference.py:19-49). The TPU-native serving story is ahead-of-time: trace
the pose-free forward once at a fixed geometry, bake the checkpoint weights
in as constants, and serialize the StableHLO module. The artifact is then
loaded (same JAX major version, matching platform) and called without any
model/config code — `load_exported(path)` returns a jitted callable
`img (N, H, W, 3) float32 -> {"semantics": logits, "disp_0": disparity}`.

Exposed as `python -m ..cli.export_cli --model <run-dir> --out model.hlo`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.photometric import key_of


def export_inference(model, variables, height: int, width: int,
                     batch_size: Optional[int] = 1,
                     platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the pose-free forward at a fixed input geometry.

    `variables` ({"params", "batch_stats"}) are closed over, so the weights
    are embedded in the artifact — one self-contained file per deployment.
    `platforms` defaults to the current backend (pass ("tpu",) to
    cross-export from a CPU host). `batch_size=None` exports a SYMBOLIC
    batch dimension — one artifact serves any batch size (H/W stay static:
    the decoder's upsample/resize logic is shape-specialized).
    """
    from jax import export as jexport

    def forward(img):
        out = model.apply(variables, {key_of("color_aug", 0, 0): img},
                          train=False, use_pose=False)
        return {k: v for k, v in out.items()
                if k in ("semantics", "disp_0") and v is not None}

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, height, width, 3), jnp.float32)
    exp = jexport.export(jax.jit(forward),
                         platforms=tuple(platforms) if platforms else None)(spec)
    return exp.serialize()


def load_exported(path_or_bytes):
    """Deserialize an `export_inference` artifact into a jitted callable."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exp = jexport.deserialize(bytearray(data))
    return jax.jit(exp.call)
