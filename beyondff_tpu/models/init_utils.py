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


def fast_init(module, *args, seed: int = 0, scale: float = 0.1, method=None, **kwargs):
    """Param tree with the same structure/shapes/dtypes as ``module.init``."""
    shapes = jax.eval_shape(
        lambda *a: module.init(jax.random.PRNGKey(0), *a, method=method, **kwargs), *args
    )
    rng = np.random.default_rng(seed)

    def fill(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            arr = rng.standard_normal(leaf.shape, dtype=np.float32) * scale
            return jnp.asarray(arr, leaf.dtype)
        return jnp.zeros(leaf.shape, leaf.dtype)

    return jax.tree_util.tree_map(fill, shapes)
