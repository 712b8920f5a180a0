"""Fast parameter construction without running the initializer programs.

``flax.Module.init`` traces AND executes the init computation; for ViT-H-scale
models on a slow host that costs minutes before the first real step. For
benchmarking and weight-conversion targets the values don't matter — only the
tree structure — so ``fast_init`` gets shapes via ``jax.eval_shape`` (trace
only, no compile/execute) and fills leaves with cheap randoms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_kind(path):
    names = [str(getattr(p, "key", p)) for p in path]
    leafname = names[-1] if names else ""
    if leafname in ("var",) or leafname == "scale":
        return "ones"
    if leafname in ("mean", "bias"):
        return "zeros"
    return "random"


def fast_init(module, *args, seed: int = 0, scale: float = 0.1, method=None,
              device_fill: bool = False, **kwargs):
    """Param tree with the same structure/shapes/dtypes as ``module.init``.

    ``device_fill=True`` materializes the leaves directly on the default
    device (no bulk host->device transfer — the right mode for multi-GB
    models over low-bandwidth device links): one jitted program emits every
    leaf, filled with a cheap integer-hash uniform in [-scale, scale] so the
    resulting model is numerically well-behaved (constant fills produce
    degenerate/overflowing activations). Norm statistics get ones/zeros.
    Compute cost matches real weights since params are runtime inputs to the
    compiled programs.
    """
    shapes = jax.eval_shape(
        lambda *a: module.init(jax.random.PRNGKey(0), *a, method=method, **kwargs), *args
    )

    if device_fill:
        salt_box = [(seed * 2654435761 + 12345) % 2 ** 32]

        def spec(path, leaf):
            kind = _leaf_kind(path)
            if not jnp.issubdtype(leaf.dtype, jnp.floating):
                kind = "zeros"
            salt_box[0] = (salt_box[0] * 1664525 + 1013904223) % 2 ** 32
            return (tuple(leaf.shape), leaf.dtype, kind, salt_box[0])

        specs = jax.tree_util.tree_map_with_path(spec, shapes)

        def make(s):
            shape, dtype, kind, salt = s
            if kind == "ones":
                return jnp.ones(shape, dtype)
            if kind == "zeros":
                return jnp.zeros(shape, dtype)
            n = int(np.prod(shape)) if shape else 1
            idx = jax.lax.iota(jnp.uint32, max(n, 1))
            h = idx * jnp.uint32(2654435761) + jnp.uint32(salt)
            h = (h ^ (h >> 15)) * jnp.uint32(2246822519)
            u = h.astype(jnp.float32) * np.float32(1.0 / 2 ** 32)  # [0, 1)
            vals = (u * 2.0 - 1.0) * scale
            return vals[:n].reshape(shape).astype(dtype)

        is_spec = lambda x: isinstance(x, tuple) and len(x) == 4 and isinstance(x[0], tuple)
        build = jax.jit(lambda: jax.tree_util.tree_map(make, specs, is_leaf=is_spec))
        return build()

    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        kind = _leaf_kind(path)
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros(leaf.shape, leaf.dtype)
        if kind == "ones":
            return jnp.ones(leaf.shape, leaf.dtype)
        if kind == "zeros" or scale == 0:  # scale 0: structure-only trees
            return jnp.zeros(leaf.shape, leaf.dtype)
        arr = rng.standard_normal(leaf.shape, dtype=np.float32) * scale
        return jnp.asarray(arr, leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
