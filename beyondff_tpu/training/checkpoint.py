"""Orbax checkpointing for training states and converted model params."""

from __future__ import annotations

import os
from typing import Any, Optional


def save_params(path: str, params: Any) -> None:
    """Save a param tree (or TrainState) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Restore a param tree; ``like`` provides the target structure/shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)
