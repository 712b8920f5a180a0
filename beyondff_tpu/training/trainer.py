"""Sharded training steps (dp over batch, tp over transformer weights).

The canonical task is CLIP-style contrastive tuning: batches of (box crop,
prompt) pairs from pipeline outputs align the image and text towers to the
deployment vocabulary. The train step is a single pjit program: params carry
NamedShardings from :func:`beyondff_tpu.parallel.mesh.shard_params`
(column/row-parallel transformer kernels over the ``model`` axis), batches
shard over ``data``, and XLA inserts the all-reduces.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beyondff_tpu.parallel import mesh as mesh_lib


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def clip_contrastive_loss(module, params, images, tokens):
    """Symmetric InfoNCE over the in-batch similarity matrix."""
    logits = module.apply(params, images, tokens)  # (B, B) scaled cosine sims
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (li + lt)


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_sharded_train_step(
    module,
    mesh: Mesh,
    loss_fn: Callable = clip_contrastive_loss,
    lr: float = 1e-5,
    data_axis: str = "data",
) -> Tuple[Callable, Callable]:
    """Returns (init_state, train_step), both jitted against ``mesh``.

    * params/opt_state: tensor-parallel NamedShardings (model axis)
    * images/tokens: batch-sharded over the data axis
    """
    tx = make_optimizer(lr)

    def init_state(params) -> TrainState:
        params = mesh_lib.shard_params(params, mesh)
        opt_state = tx.init(params)
        return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    data_in = NamedSharding(mesh, P(data_axis))

    @functools.partial(jax.jit, in_shardings=(None, data_in, data_in), donate_argnums=(0,))
    def train_step(state: TrainState, images, tokens):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(module, p, images, tokens))(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step
