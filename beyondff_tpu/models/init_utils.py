"""Fast parameter construction without running the initializer programs.

``flax.Module.init`` traces AND executes the init computation; for ViT-H-scale
models on a slow host that costs minutes before the first real step. For
benchmarking and weight-conversion targets the values don't matter — only the
tree structure — so ``fast_init`` gets shapes via ``jax.eval_shape`` (trace
only, no compile/execute) and fills leaves with cheap numpy randoms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_init(module, *args, seed: int = 0, scale: float = 0.1, method=None,
              device_fill: bool = False, **kwargs):
    """Param tree with the same structure/shapes/dtypes as ``module.init``.

    ``device_fill=True`` materializes the leaves directly on the default
    device with deterministic cheap fills (no host RNG, no bulk host->device
    transfer) — the right mode for benchmarking multi-GB models over
    low-bandwidth device links. Values are structured (ones/zeros for norm
    stats, small constants elsewhere); compute cost is identical to real
    weights since params are runtime inputs to the compiled programs.
    """
    shapes = jax.eval_shape(
        lambda *a: module.init(jax.random.PRNGKey(0), *a, method=method, **kwargs), *args
    )
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        leafname = names[-1] if names else ""
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros(leaf.shape, leaf.dtype)
        # normalization statistics and scales must stay well-posed
        if leafname in ("var",) or leafname == "scale":
            return jnp.ones(leaf.shape, leaf.dtype)
        if leafname in ("mean", "bias"):
            return jnp.zeros(leaf.shape, leaf.dtype)
        if device_fill:
            return jnp.full(leaf.shape, 0.02, leaf.dtype)
        arr = rng.standard_normal(leaf.shape, dtype=np.float32) * scale
        return jnp.asarray(arr, leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
