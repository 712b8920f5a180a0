"""Backend dispatch for Pallas kernels: on by default on TPU-class devices,
XLA fallback elsewhere. BFF_DISABLE_PALLAS=1 forces the XLA paths."""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    if os.environ.get("BFF_DISABLE_PALLAS"):
        return False
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return platform in ("tpu", "axon")
