"""Persistent XLA compilation cache.

The flagship train step takes ~10 min to compile through the remote-TPU
tunnel; the cache serializes compiled executables to disk so repeated runs
(bench reruns, trainer restarts, the driver's bench invocation) skip
compilation entirely. Keyed by HLO + jax/libtpu version, so stale entries are
never reused. Disable with SDT_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    if os.environ.get("SDT_NO_COMPILE_CACHE"):
        return
    import jax

    if path is None:
        path = os.environ.get(
            "SDT_COMPILE_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # 2s: catches model-init and eval-step programs too (remote compiles
        # cost minutes; sub-2s ones are dominated by round-trip anyway)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs — compilation just stays uncached
